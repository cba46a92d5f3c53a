"""A/B the fused-bwd dq accumulator placement on the real TPU.

MCA_FLASH_DQ=output (round-3 default: RMW on the dq output block) vs
scratch (VMEM accumulator + one copy per batch-head).  Times the
production banded kernel per layer with roofline.measure_attention
(full-minus-half chained scans).  Roofline context: bwd measured 1.71x
its max(MXU, VPU, HBM) bound and MXU+VPU SUM to the measured time —
if the output RMW is what breaks Mosaic's software pipeline, scratch
mode should pull bwd toward the 8.1 ms/step bound.

Usage: python baselines/ab_dq_mode.py [--dataset tcga]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="tcga")
    ap.add_argument("--k", type=int, default=96)
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from roofline import build_case, measure_attention

    case = build_case(args.dataset)
    cl = case["cfg_like"]
    print(f"device={jax.devices()[0]} dataset={args.dataset}", flush=True)
    out = {}
    for mode in ("output", "scratch", "partial"):
        os.environ["MCA_FLASH_DQ"] = mode
        # per-mode kernel cache entries differ (dq_mode is in the key)
        meas = measure_attention(
            case["attn_mask"], batch=cl["batch"], heads=cl["heads"],
            dim_head=cl["dim_head"], k=args.k,
        )
        out[mode] = {k2: round(v2, 3) for k2, v2 in meas.items()}
        print(f"  {mode}: {out[mode]}", flush=True)
    print(json.dumps({"dataset": args.dataset, "per_layer_ms": out}))


if __name__ == "__main__":
    main()
