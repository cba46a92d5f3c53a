"""Multi-hour soak of the production training loop at canonical scale
(VERDICT r4 item 7): step-time drift, host RSS, and device-memory
stability, first-hour vs last-hour.

Runs ``mca_tpu.train.train`` IN PROCESS on synthetic clustered TCGA at
the canonical recipe (dim 512, 5 layers, batch 8, seq 2548) with every
production auxiliary armed: per-epoch eval, per-epoch checkpoints with
rotation (``checkpoint_keep``), mid-epoch root step checkpoints,
async saves, halt-on-NaN, and the SIGTERM preemption guard.  A sampler
thread records, every ``--sample-s`` seconds, host RSS (VmRSS from
/proc/self/status) and device memory (``device.memory_stats()`` where
the backend exposes it) to ``--out`` (one JSON line each).  After the
run, a summary line reports mean step time and RSS for the first and
last sampling windows — flat step time and bounded RSS is the pass
criterion; growth isolates a leak.

``--hours`` bounds the run: epochs are sized from a measured-throughput
estimate and the loop also hard-stops at the deadline via the
preemption guard's own SIGTERM path (the soak sends itself SIGTERM —
exercising preemption checkpoint + exit-75 semantics as a bonus).

Usage:
  python baselines/soak.py --hours 2.5 [--out baselines/soak_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _device_mem() -> dict:
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        return {
            k: int(v)
            for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    except Exception:
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--sample-s", type=float, default=60.0)
    ap.add_argument("--n-samples", type=int, default=2048)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "soak_r5.jsonl",
        ),
    )
    ap.add_argument(
        "--workdir", default="/tmp/mca_soak", help="dataset + output"
    )
    ap.add_argument(
        "--est-tok-s", type=float, default=450_000.0,
        help="throughput estimate for epoch sizing only",
    )
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import __graft_entry__ as ge
    from mca_tpu.config import training_config_from_dict
    from mca_tpu.data.synthetic import make_tcga_like, to_hf_dataset
    from mca_tpu.train import train

    os.makedirs(args.workdir, exist_ok=True)
    ds = os.path.join(args.workdir, "dataset")
    widths = {
        "gene": 800, "protein": 198, "methylation": 800, "mirna": 662,
    }
    if not (os.path.isdir(ds) and os.listdir(ds)):
        to_hf_dataset(
            make_tcga_like(
                args.n_samples, widths=widths, n_classes=5,
                p_missing=0.10, seed=7, clustered=True,
            )
        ).save_to_disk(ds)

    seq = sum(widths.values()) + 88
    steps_per_epoch = int(args.n_samples * 0.9) // 8
    est_step_s = 8 * seq / args.est_tok_s
    # leave ~12 min of the budget for compile + eval + ckpt overhead
    epochs = max(
        2,
        int((args.hours * 3600 - 720) / (est_step_s * steps_per_epoch)),
    )
    print(
        f"soak: {epochs} epochs x {steps_per_epoch} steps "
        f"(~{est_step_s * steps_per_epoch:.0f}s device each), "
        f"budget {args.hours:.1f}h",
        flush=True,
    )

    out_dir = os.path.join(
        args.workdir, time.strftime("run_%H%M_%d%m")
    )
    cfg = training_config_from_dict(
        ge._tcga_config(
            batch_size=8,
            epochs=epochs,
            dataset=ds,
            output_dir=out_dir,
            checkpoint_keep=2,       # rotation armed
            n_step_checkpoint=500,   # mid-epoch root checkpoints
            # (epoch saves are always asynchronous in train.py)
            halt_on_nan=True,
            preempt_save=True,       # SIGTERM guard armed
        )
    )

    stop = threading.Event()
    t0 = time.time()
    deadline = t0 + args.hours * 3600

    def sampler() -> None:
        with open(args.out, "a") as f:
            while not stop.wait(args.sample_s):
                rec = {
                    "t_s": round(time.time() - t0, 1),
                    "host_rss_mb": round(_rss_mb(), 1),
                    "device": _device_mem(),
                    "kind": "sample",
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                if time.time() > deadline:
                    # deadline: exercise the REAL preemption path
                    print(
                        "soak: deadline — sending SIGTERM to self",
                        flush=True,
                    )
                    os.kill(os.getpid(), signal.SIGTERM)
                    return

    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    rc = 0
    try:
        train(cfg)
    except SystemExit as e:  # preemption guard exits 75 (CLI path)
        rc = int(e.code or 0)
        print(f"soak: train exited {rc} (preemption path)", flush=True)
    except Exception as e:
        # train() raises PreemptedError from the API (the CLI main
        # converts it to exit 75) — the deadline SIGTERM lands here
        from mca_tpu.train import PreemptedError

        if not isinstance(e, PreemptedError):
            raise
        rc = 75
        print(f"soak: preempted cleanly ({e})", flush=True)
    finally:
        stop.set()

    # ---- summary: first vs last window of step times + RSS ----------
    import numpy as np

    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    ts, steps = [], []
    with open(metrics_path) as f:
        for line in f:
            row = json.loads(line)
            if "total_loss" in row and "time" in row:
                ts.append(float(row["time"]))
                steps.append(int(row["step"]))
    samples = []
    with open(args.out) as f:
        for line in f:
            row = json.loads(line)
            if row.get("kind") == "sample":
                samples.append(row)

    def window_rate(frac0, frac1):
        n = len(ts)
        lo, hi = int(n * frac0), max(int(n * frac1), int(n * frac0) + 2)
        span = ts[hi - 1] - ts[lo]
        return (steps[hi - 1] - steps[lo]) / span if span > 0 else None

    first_rate = window_rate(0.02, 0.25)  # skip compile
    last_rate = window_rate(0.75, 1.0)
    summary = {
        "kind": "summary",
        "wall_s": round(time.time() - t0, 1),
        "exit_code": rc,
        "epochs_configured": epochs,
        "steps_logged": steps[-1] if steps else 0,
        "steps_per_sec_first_quarter": (
            round(first_rate, 3) if first_rate else None
        ),
        "steps_per_sec_last_quarter": (
            round(last_rate, 3) if last_rate else None
        ),
        "drift_pct": (
            round(100 * (1 - last_rate / first_rate), 2)
            if first_rate and last_rate
            else None
        ),
        "rss_first_mb": samples[0]["host_rss_mb"] if samples else None,
        "rss_last_mb": samples[-1]["host_rss_mb"] if samples else None,
        "device_mem_first": samples[0]["device"] if samples else None,
        "device_mem_last": samples[-1]["device"] if samples else None,
        "output_dir": out_dir,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
