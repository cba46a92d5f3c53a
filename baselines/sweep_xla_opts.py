"""XLA compiler-options A/B on the full train step (round 3).

Client-side XLA_FLAGS do NOT reach the remote compiler on this
deployment, but per-compile ``compiler_options`` ride the compile
request — bench.py's BENCH_XLA_OPTS knob threads them through
``jit(...).lower(...).compile(compiler_options=...)``.

Arms (one fresh compile each, ~8-11 min wall):
- baseline (no options) — run-noise anchor for the sweep
- latency-hiding scheduler off (it defaults ON for TPU): measures
  how much the scheduler is worth on this step
- scoped VMEM limit sweep: XLA fusions' scratch budget trades
  against Mosaic kernel VMEM; default is backend-chosen (~64-128M)

Appends JSON lines to baselines/sweep_xla_opts_results.jsonl.
Usage: python baselines/sweep_xla_opts.py [tcga|cmu|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import run  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "baselines", "sweep_xla_opts_results.jsonl")


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "tcga"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    arms = [
        ("base", ""),
        ("lhs_off", "xla_latency_hiding_scheduler_rerun=0;"
                    "xla_tpu_enable_latency_hiding_scheduler=false"),
        # scoped-VMEM curve: 32/64/96 MiB measured monotonically WORSE
        # (fusion scratch steals VMEM from the Mosaic kernel pipeline);
        # 8/16 MiB bracket the backend default from below
        ("vmem_8m", "xla_tpu_scoped_vmem_limit_kib=8192"),
        ("vmem_16m", "xla_tpu_scoped_vmem_limit_kib=16384"),
        ("vmem_32m", "xla_tpu_scoped_vmem_limit_kib=32768"),
        ("vmem_64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
        ("vmem_96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ]
    datasets = ["tcga", "cmu"] if part == "all" else [part]
    for ds in datasets:
        for tag, opts in arms:
            if only is not None and tag not in only:
                continue
            env = {"BENCH_DATASET": ds}
            if opts:
                env["BENCH_XLA_OPTS"] = opts
            run(f"{ds}/xla/{tag}", env, out=OUT)


if __name__ == "__main__":
    main()
