"""Round-3 follow-up TPU measurements (run serially, one process).

1. EAO A/B matrix (VERDICT r2 item 4): grouped vs sequential channel
   passes, each with and without rematerialisation — the round-2
   172.7 ms "remat" number was actually measured with remat silently
   off (ADVICE r2 bench.py:62), so the honest comparison needs all
   four cells.  grouped+remat already measured (220.31 ms,
   sweep_r3_results.jsonl).
2. zorro regression point at the round-3 kernel.
3. CMU streaming pipeline with fp16 staging (VERDICT r2 item 7):
   measure_r2 --part cmu_stream now has a stream_fp16 arm.

Appends bench rows to baselines/sweep_r3_results.jsonl; cmu_stream
prints its own JSON lines (tee'd by the caller).
Usage: python baselines/r3_followup.py [eao|zorro|cmu|all]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "baselines"))
from sweep_r3 import run  # noqa: E402


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("eao", "all"):
        run("eao/sequential", {"BENCH_VARIANT": "eao", "BENCH_EAO_GROUP": 0})
        run("eao/grouped_noremat", {"BENCH_VARIANT": "eao", "BENCH_REMAT": 0})
        run(
            "eao/sequential_noremat",
            {"BENCH_VARIANT": "eao", "BENCH_EAO_GROUP": 0, "BENCH_REMAT": 0},
        )
    if part in ("zorro", "all"):
        run("zorro/auto", {"BENCH_VARIANT": "zorro"})
    if part in ("cmu", "all"):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "baselines", "measure_r2.py"),
             "--part", "cmu_stream"],
            cwd=REPO, check=False,
        )


if __name__ == "__main__":
    main()
