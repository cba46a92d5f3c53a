"""Serving latency/throughput harness for mca_tpu.serve.

Measures, on whatever backend jax provides (the real chip under the
driver environment; cpu in tests):

- single-row round-trip latency through the micro-batcher
  (p50/p90/p99) at concurrency 1;
- sustained rows/sec at increasing client concurrency (the
  micro-batcher should approach the batched-forward rate as
  concurrency reaches max_batch);
- the raw batched `embed()` rate (upper bound: one compiled call per
  max_batch rows, no queueing).

Usage (canonical TCGA scale, random weights — serving cost does not
depend on the weight values):

    python baselines/serve_bench.py [--max-batch 8] [--rows 256]
    python baselines/serve_bench.py --config cfg.yaml --restart out/3

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="train yaml (default: canonical synthetic TCGA)")
    p.add_argument("--restart", default=None)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--rows", type=int, default=256)
    p.add_argument("--concurrency", default="1,2,4,8")
    p.add_argument(
        "--tiny",
        action="store_true",
        help="tiny synthetic model (CPU smoke test)",
    )
    p.add_argument(
        "--quantize",
        choices=("none", "int8"),
        default="none",
        help="serve the int8-quantized projections (A/B arm)",
    )
    args = p.parse_args()

    import numpy as np

    from mca_tpu.data.synthetic import make_tcga_like
    from mca_tpu.serve import EmbeddingService

    if args.config:
        from mca_tpu.config import training_config

        config = training_config(args.config)
        widths = {
            m: c["pad_len"]
            for m, c in config.modality_config.to_plain().items()
        }
    elif args.tiny:
        from mca_tpu.config import training_config_from_dict
        from mca_tpu.data.synthetic import tiny_config

        cfg_d = tiny_config("tcga", batch_size=args.max_batch)
        config = training_config_from_dict(cfg_d)
        widths = {
            m: c["pad_len"] for m, c in cfg_d["modality_config"].items()
        }
    else:
        import __graft_entry__ as ge
        from mca_tpu.config import training_config_from_dict

        cfg_d = ge._tcga_config()
        config = training_config_from_dict(cfg_d)
        widths = {
            m: c["pad_len"] for m, c in cfg_d["modality_config"].items()
        }

    svc = EmbeddingService(
        config,
        restart=args.restart,
        max_batch=args.max_batch,
        max_wait_ms=2.0,
        quantize=args.quantize,
    )
    rows = make_tcga_like(
        args.rows, widths=widths, p_missing=0.25, seed=0
    )

    # --- per-launch dispatch floor ------------------------------------
    # The smallest possible end-to-end launch: a trivial jitted op,
    # argument-chained (no relay result caching) with a per-launch
    # device_get (the pipeline must drain, as a serving response
    # does).  If the serve loop's ms/batch converges to THIS number,
    # the deployment is dispatch-bound and no device-side gain (int8,
    # fused kernels) can show through it — the round-4 serve question,
    # pinned numerically (VERDICT r4 item 4).
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda x: x * 1.0000001 + 1e-7)
    xx = jnp.zeros((128,), jnp.float32)
    xx = trivial(xx)
    float(xx[0])  # compile + first-dispatch tax
    n_fl = 32
    t0 = time.monotonic()
    for _ in range(n_fl):
        xx = trivial(xx)
        float(xx[0])
    floor_ms = (time.monotonic() - t0) / n_fl * 1e3
    print(
        json.dumps(
            {
                "metric": "serve_dispatch_floor_ms",
                "value": round(floor_ms, 2),
                "unit": "ms/launch",
                "note": "trivial chained launch + per-launch get",
            }
        )
    )

    # --- raw batched rate (no queue) -----------------------------------
    t0 = time.monotonic()
    svc.embed(rows)
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "metric": "serve_batched_rows_per_s",
                "value": round(args.rows / dt, 1),
                "unit": "rows/s",
                "max_batch": args.max_batch,
                "quantize": args.quantize,
            }
        )
    )

    # --- single-row latency --------------------------------------------
    svc.start()
    lat = []
    for r in rows[: min(64, args.rows)]:
        t0 = time.monotonic()
        svc.submit(r).result(timeout=120)
        lat.append((time.monotonic() - t0) * 1e3)
    lat = np.sort(np.asarray(lat))
    print(
        json.dumps(
            {
                "metric": "serve_single_row_latency_ms",
                "p50": round(float(np.percentile(lat, 50)), 2),
                "p90": round(float(np.percentile(lat, 90)), 2),
                "p99": round(float(np.percentile(lat, 99)), 2),
                "unit": "ms",
            }
        )
    )

    # --- concurrent throughput ------------------------------------------
    for conc in [int(c) for c in args.concurrency.split(",")]:
        done = []
        per = args.rows // conc

        def client(cid):
            for i in range(per):
                svc.submit(rows[(cid * per + i) % len(rows)]).result(
                    timeout=120
                )
            done.append(cid)

        t0 = time.monotonic()
        threads = [
            threading.Thread(target=client, args=(c,))
            for c in range(conc)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.monotonic() - t0
        assert len(done) == conc
        print(
            json.dumps(
                {
                    "metric": "serve_concurrent_rows_per_s",
                    "concurrency": conc,
                    "value": round(conc * per / dt, 1),
                    "unit": "rows/s",
                }
            )
        )
    svc.stop()


if __name__ == "__main__":
    main()
