"""Round-3b arms: exp2 softmax A/B + MFU at non-canonical model scale.

- base:   post-review-fix sanity re-run of the TCGA headline config
- exp2:   MCA_FLASH_EXP2=1 (base-2 softmax, log2e folded into q scale)
- dh128:  head_dim 128 at canonical dim 512 (full MXU contraction
          depth in the attention kernel; proj width h*dh doubles)
- large:  dim 1024 + head_dim 128 (production-scale MFU point)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "baselines", "sweep_r3b_results.jsonl")

run("base", {}, out=OUT)
run("exp2", {"MCA_FLASH_EXP2": 1}, out=OUT)
run("dh128", {"BENCH_DIM_HEAD": 128}, out=OUT)
run("large", {"BENCH_DIM": 1024, "BENCH_DIM_HEAD": 128}, out=OUT)
