"""A/B the fused-bwd body statement order on the real TPU.

The three-way dq-accumulator A/B (output/scratch/partial, all
neutral — ab_dq_mode.py) falsified every buffer-hazard explanation
for the backward running at 1.71x its roofline bound: Mosaic does
not overlap compute across grid iterations in this kernel regardless
of output dataflow.  The one unfalsified lever is INTRA-body overlap:

- ``hoist``: the dp = do.v^T dot is data-independent of the s/p chain;
  issuing it before the exp sweep lets an in-order scheduler run the
  MXU dot under the VPU sweep.
- ``pair``: the kv tile as two independent half-width chains with
  their MXU and VPU ops interleaved — every VPU sweep has a
  data-independent dot adjacent to it.

Measures the production banded kernel per layer for all three orders
(roofline.measure_attention, full-minus-half chained scans).

Usage: python baselines/ab_bwd_order.py [--dataset tcga]
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
    for order in ("chain", "hoist", "pair"):
        os.environ["MCA_FLASH_BWD_ORDER"] = order
        meas = measure_attention(
            case["attn_mask"], batch=cl["batch"], heads=cl["heads"],
            dim_head=cl["dim_head"], k=args.k,
        )
        out[order] = {k2: round(v2, 3) for k2, v2 in meas.items()}
        print(f"  {order}: {out[order]}", flush=True)
    print(json.dumps({"dataset": args.dataset, "per_layer_ms": out}))


if __name__ == "__main__":
    main()
