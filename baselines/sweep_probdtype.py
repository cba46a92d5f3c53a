"""A/B: bf16 score/probability tiles (MCA_FLASH_PROB_DTYPE) vs fp32 default.

The kernel is measured VPU-bound on the softmax chain (PERF.md round 2);
bf16 [bq, bk] tiles halve the lane width of that chain.  This measures
the full production train step (bench.py, K=32) for TCGA / CMU / zorro /
EAO with prob_dtype fp32 (default) vs bf16, appending JSON lines to
baselines/sweep_probdtype_results.jsonl.

Usage: python baselines/sweep_probdtype.py [tcga|cmu|zorro|eao|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import run, REPO  # noqa: E402

OUT = os.path.join(REPO, "baselines", "sweep_probdtype_results.jsonl")


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    arms = []
    if part in ("tcga", "all"):
        arms += [("tcga/fp32", {}), ("tcga/bf16", {"MCA_FLASH_PROB_DTYPE": "bf16"})]
    if part in ("cmu", "all"):
        arms += [("cmu/fp32", {"BENCH_DATASET": "cmu"}),
                 ("cmu/bf16", {"BENCH_DATASET": "cmu", "MCA_FLASH_PROB_DTYPE": "bf16"})]
    if part in ("zorro", "all"):
        arms += [("zorro/fp32", {"BENCH_VARIANT": "zorro"}),
                 ("zorro/bf16", {"BENCH_VARIANT": "zorro", "MCA_FLASH_PROB_DTYPE": "bf16"})]
    if part in ("eao", "all"):
        arms += [("eao/fp32", {"BENCH_VARIANT": "eao"}),
                 ("eao/bf16", {"BENCH_VARIANT": "eao", "MCA_FLASH_PROB_DTYPE": "bf16"})]
    for tag, env in arms:
        run(tag, env, out=OUT)


if __name__ == "__main__":
    main()
