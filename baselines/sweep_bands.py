"""Row-band decomposition A/B on the real chip (MCA_FLASH_BANDS).

Full train step at the canonical scales; anchor = the same-day
single-kernel run.  Banding cuts visited tile area TCGA 4.29M -> 2.65M
(-38%) and CMU 5.90M -> 3.15M (-47%) at the cost of 4 pallas launches
per attention call instead of 1 (see plan_bands, flash_attention.py).
EAO is unmasked (planner returns None) — no arm.

Appends JSON lines to baselines/sweep_bands_results.jsonl.
Usage: python baselines/sweep_bands.py [anchor|bands|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import REPO, run  # noqa: E402

OUT = os.path.join(REPO, "baselines", "sweep_bands_results.jsonl")


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("anchor", "all"):
        run("tcga/single", {}, out=OUT)
        run("cmu/single", {"BENCH_DATASET": "cmu"}, out=OUT)
        run("zorro/single", {"BENCH_VARIANT": "zorro"}, out=OUT)
    if part in ("bands", "all"):
        run("tcga/bands", {"MCA_FLASH_BANDS": 1}, out=OUT)
        run("cmu/bands", {"BENCH_DATASET": "cmu", "MCA_FLASH_BANDS": 1},
            out=OUT)
        run("zorro/bands", {"BENCH_VARIANT": "zorro", "MCA_FLASH_BANDS": 1},
            out=OUT)
    if part in ("alt",):
        # partition-validation: alternative row partitions vs the DP's
        # pick (TCGA DP edges: 998,1798,2460 / CMU: 1500,1950,2450);
        # MCA_FLASH_BANDS default is now 1
        for tag, edges in [
            ("tcga/alt-5bands", "800,998,1798,2460"),  # gene|protein split
            ("tcga/alt-3bands", "998,1798"),  # mirna+fusion merged
            ("tcga/alt-2bands", "2460"),  # all modalities merged
        ]:
            run(tag, {"MCA_FLASH_BAND_EDGES": edges}, out=OUT)
        for tag, edges in [
            ("cmu/alt-5bands", "1500,1950,2400,2450"),  # glove split out
            ("cmu/alt-3bands", "1500,2450"),
        ]:
            run(tag, {"BENCH_DATASET": "cmu",
                      "MCA_FLASH_BAND_EDGES": edges}, out=OUT)


if __name__ == "__main__":
    main()
