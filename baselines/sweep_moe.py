"""MoE extension A/B on the real chip (round 3, fifth session).

Measures the throughput cost of `moe_experts: E` (expert-choice MoE FF,
mca_tpu/models/moe.py) against the dense-FF baseline at the canonical
TCGA scale, for both dispatch/combine implementations:

- `onehot` (default): the one-hot einsum pair, O(cf*T^2*D) matmul
  FLOPs — pure MXU work;
- `gather`: take_along_axis dispatch + scatter-add combine, O(cf*T*D)
  data movement.

Measured (this file's jsonl): onehot WINS at the canonical T=2548 —
E=2 84.9 vs 93.8 ms, E=4 88.9 vs 96.9 ms.  TPU scatter-add is the
slow path; the extra matmul FLOPs are cheap on the MXU.  (The `moe/E2`
/`moe/E4` tags without an impl suffix ran the then-default onehot.)

With capacity_factor 2.0 the per-token FF FLOPs are ~2x the dense FF,
so some tok/s drop is inherent; this sweep separates that price from
the dispatch mechanism's.

Appends JSON lines to baselines/sweep_moe_results.jsonl.
Usage: python baselines/sweep_moe.py [dense|onehot|gather|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import REPO, run  # noqa: E402

OUT = os.path.join(REPO, "baselines", "sweep_moe_results.jsonl")


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("dense", "all"):
        run("moe/off", {}, out=OUT)  # dense-FF sanity point
    if part in ("onehot", "all"):
        for e in (2, 4):
            run(
                f"moe/E{e}-onehot",
                {"BENCH_MOE": e, "MCA_MOE_IMPL": "onehot"},
                out=OUT,
            )
    if part in ("gather", "all"):
        for e in (2, 4):
            run(
                f"moe/E{e}-gather",
                {"BENCH_MOE": e, "MCA_MOE_IMPL": "gather"},
                out=OUT,
            )


if __name__ == "__main__":
    main()
