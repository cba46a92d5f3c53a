"""Attribute the single-chip batch-scaling falloff (VERDICT r3 item 5).

Round 3 measured throughput FALLING with per-chip batch (397k tok/s at
batch 8 -> 347k at 64, pre-banding; MFU 0.239 -> 0.209), uniformly
across fwd/bwd, independent of mask/blocks/loss/optimizer — attributed
"bandwidth-side" without a component pin.  This harness produces the
pin: for batch 8 and 64 it measures

  1. the component deltas of the production step (profile_step.py
     subsets: full / fwd+loss / fwd / fwd+bwd / opt) — which component
     grows by MORE than the 8x work ratio;
  2. the banded attention kernel alone (roofline.measure_attention at
     both batch sizes) against its analytic bounds, which scale
     EXACTLY 8x in every term (per-batch-head tile traffic) — if the
     kernel grows >8x, the achievable RATE degrades with footprint;
  3. the raw HBM stream rate at small vs large footprints
     (roofline's chained-copy microkernel at ~8 MB vs ~512 MB working
     sets) — the direct test of "bandwidth-side".

Usage: python baselines/batch_scaling_attrib.py [--big 64] [--k 16]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def profile_components(batch: int, k: int) -> dict:
    """profile_step.py in a subprocess (fresh jax, no cross-run cache
    interference); parse its per-component ms/step lines."""
    out = subprocess.run(
        [
            sys.executable,
            "-u",
            os.path.join(HERE, "profile_step.py"),
            "--batch",
            str(batch),
            "--k",
            str(k),
        ],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    comps = {}
    for line in out.stdout.splitlines():
        m = re.match(r"\s*(\w+):\s+([\d.]+) ms/step", line)
        if m:
            comps[m.group(1)] = float(m.group(2))
    if not comps:
        raise RuntimeError(
            f"profile_step batch={batch} produced no components:\n"
            f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    return comps


def kernel_and_bounds(batch: int, k: int) -> dict:
    from roofline import attention_counts, build_case, measure_attention

    from mca_tpu.ops.flash_attention import plan_bands

    case = build_case("tcga")
    cl = case["cfg_like"]
    meas = measure_attention(
        case["attn_mask"],
        batch=batch,
        heads=cl["heads"],
        dim_head=cl["dim_head"],
        k=k,
    )
    bands = plan_bands(__import__("numpy").asarray(case["attn_mask"]))
    counts = attention_counts(
        case["attn_mask"],
        bands,
        batch=batch,
        heads=cl["heads"],
        dim_head=cl["dim_head"],
    )
    return {"measured": meas, "counts": counts}


def hbm_rate_at_footprint(mb: float) -> float:
    """Measured HBM stream rate (bytes/s, read+write) from a chained
    big-copy loop over a ``mb``-MB fp32 buffer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(mb * 1e6 / 4 / 1024) * 1024
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), jnp.float32
    )
    reps = max(1, int(512e6 / (n * 4)))  # ~512 MB traffic per launch

    @jax.jit
    def run(x, c):
        def body(carry, _):
            x, c = carry
            # a full read + full write per iteration; the +c
            # perturbation defeats relay result-caching
            return (x * jnp.float32(0.9999) + c, c), None

        (x, c), _ = jax.lax.scan(
            body, (x, c * jnp.float32(1e-9)), None, length=reps
        )
        return x, c

    c = jnp.zeros((), jnp.float32)
    x, c = run(x0, c)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n_calls = 4
    for _ in range(n_calls):
        x, c = run(x, c + 1)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n_calls
    return n * 4 * 2 * reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument(
        "--out",
        default=os.path.join(HERE, "batch_scaling_attrib.jsonl"),
    )
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    ratio = args.big / 8.0
    rec = {"small": 8, "big": args.big}

    print("== component profile (subprocess per batch) ==", flush=True)
    rec["components"] = {}
    c8 = profile_components(8, args.k)
    cb = profile_components(args.big, max(4, args.k // 4))
    for name in c8:
        if name in cb:
            rec["components"][name] = {
                "ms_8": c8[name],
                f"ms_{args.big}": cb[name],
                "x": round(cb[name] / max(c8[name], 1e-9), 2),
                "x_of_work": round(
                    cb[name] / max(c8[name], 1e-9) / ratio, 2
                ),
            }
    print(json.dumps(rec["components"], indent=1), flush=True)

    print("== banded kernel vs analytic bounds ==", flush=True)
    k8 = kernel_and_bounds(8, args.k)
    kb = kernel_and_bounds(args.big, max(4, args.k // 4))
    rec["kernel"] = {}
    for dirn in ("fwd", "bwd"):
        m8 = k8["measured"][f"{dirn}_ms"]
        mb_ = kb["measured"][f"{dirn}_ms"]
        # the analytic work terms must scale exactly linearly in batch
        # (per-batch-head tile traffic) — record the check so the
        # jsonl carries the bound side of the attribution, not just
        # the measured ratios
        bound_x = {
            term: round(
                kb["counts"][dirn][term]
                / max(k8["counts"][dirn][term], 1)
                / ratio,
                4,
            )
            for term in ("mxu_flops", "vpu_elems", "exp_elems",
                         "hbm_bytes")
            if term in k8["counts"][dirn]
        }
        rec["kernel"][dirn] = {
            "ms_8": round(m8, 3),
            f"ms_{args.big}": round(mb_, 3),
            "x_of_work": round(mb_ / m8 / ratio, 3),
            "bound_terms_x_of_work": bound_x,
        }
    print(json.dumps(rec["kernel"], indent=1), flush=True)

    print("== HBM stream rate vs footprint ==", flush=True)
    rec["hbm_rate_gbs"] = {
        "8MB": round(hbm_rate_at_footprint(8) / 1e9, 1),
        "64MB": round(hbm_rate_at_footprint(64) / 1e9, 1),
        "512MB": round(hbm_rate_at_footprint(512) / 1e9, 1),
    }
    print(json.dumps(rec["hbm_rate_gbs"]), flush=True)

    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({"done": True, "out": args.out}))


if __name__ == "__main__":
    main()
