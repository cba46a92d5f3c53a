"""Sweep per-band block shapes for backward-pipeline headroom.

Roofline context (PERF.md round 3): the backward measures 1.71x its
max(MXU, VPU, HBM) bound and the MXU and VPU bounds SUM to the
measured time — the kernel's MXU and VPU work run serially.  The dq
accumulator placement measured neutral (ab_dq_mode.py), so the
remaining hypothesis is VMEM live-range pressure: the fused backward
keeps four [bq, bk] fp32 tiles live (s, p, dp, ds — 5.7 MB at the
400x896 DP pick) plus operand buffers, leaving Mosaic no room to
software-pipeline consecutive grid steps.  Smaller tiles shrink the
live set; the band DP's cost model (visited area + per-tile overhead)
knows nothing about this, so measurement decides.

Each variant rescales the DP's per-band blocks (bk and/or bq), builds
the banded kernel explicitly via make_banded_flash_attention, and
times one layer fwd / fwd+bwd with roofline.measure_attention.

Usage: python baselines/sweep_bwd_blocks.py [--dataset tcga] [--k 96]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _snap_bk(x):
    return max(256, (int(x) // 128) * 128)


def _snap_bq(x):
    return max(64, (int(x) // 8) * 8)


def variants(bands):
    """Named block rescalings of the DP's per-band picks."""
    out = {"dp_default": bands}

    def scale(name, fq, fk):
        out[name] = [
            (r0, r1, c0, c1, _snap_bq(bq * fq), _snap_bk(bk * fk))
            for (r0, r1, c0, c1, bq, bk) in bands
        ]

    scale("bk_half", 1.0, 0.5)
    scale("bq_half", 0.5, 1.0)
    scale("both_half", 0.5, 0.5)
    scale("bk_quarter", 1.0, 0.25)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="tcga")
    ap.add_argument("--k", type=int, default=96)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from mca_tpu.ops.flash_attention import make_banded_flash_attention
    from roofline import build_case, measure_attention

    case = build_case(args.dataset)
    cl = case["cfg_like"]
    mask = case["attn_mask"]
    scale = cl["dim_head"] ** -0.5
    print(f"device={jax.devices()[0]} dataset={args.dataset}", flush=True)
    rows = {}
    for name, bands in variants(case["bands"]).items():
        fn = make_banded_flash_attention(
            mask, scale=scale, bands=bands,
        )
        meas = measure_attention(
            mask, batch=cl["batch"], heads=cl["heads"],
            dim_head=cl["dim_head"], k=args.k, fn=fn,
        )
        rows[name] = {
            "blocks": [(b[4], b[5]) for b in bands],
            **{k2: round(v2, 3) for k2, v2 in meas.items()},
        }
        print(f"  {name}: {rows[name]}", flush=True)
    report = {"dataset": args.dataset, "rows": rows}
    print(json.dumps(report))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
