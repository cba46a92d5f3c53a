"""Decisive probe: can Mosaic co-issue MXU and VPU work AT ALL?

Round-3/4 measurements falsified every *arrangement* lever for the
fused backward's 1.71x-of-roofline residual: dq dataflow (output /
scratch / partial — neutral), tile shape (all rescalings worse), and
intra-body statement order (chain / hoist / pair — neutral,
ab_bwd_order.py).  The remaining question is whether the platform can
overlap the two units inside one kernel at all: if two FULLY
INDEPENDENT dependency chains — one pure-MXU (chained [256,256] bf16
dots), one pure-VPU (chained exp sweeps over a [256,1024] fp32 tile),
touching disjoint refs, with no data flow between them — still take
the SUM of their standalone times when placed in the same kernel body,
then MXU/VPU overlap is not reachable from Pallas on this toolchain
and the backward's serial MXU+VPU execution is a platform property,
not a kernel defect.  If instead the combined body runs near
max(t_mxu, t_vpu), the overlap lever is real and the backward should
be restructured around truly independent per-iteration chains.

Methodology is _counter_kernel's (roofline.py): full-minus-half
iteration subtraction inside scan-chained launches cancels dispatch,
a launch counter perturbs inputs so the remote relay cannot
result-cache, and every chain output is consumed into the kernel
outputs (no dead code).

Usage: python baselines/probe_overlap.py [--iters 4096] [--outer 16]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--outer", type=int, default=16)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 256  # dot operand: [M, M] bf16; ~33.5 MFLOP/iter
    VR, VC = 256, 1024  # exp tile: fp32; ~262k transcendentals/iter

    rng = np.random.default_rng(0)
    a0 = jnp.asarray(
        rng.standard_normal((M, M)) * 0.06, jnp.bfloat16
    )
    # near-orthogonal-ish scaling keeps the chained dot bounded
    w0 = jnp.asarray(rng.standard_normal((M, M)) / np.sqrt(M), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((VR, VC)), jnp.float32)

    def make_run(mode, n_iters):
        def kern(c_ref, a_ref, w_ref, b_ref, oa_ref, ob_ref):
            # counter perturbation: no two launches see identical args
            c = c_ref[0].astype(jnp.float32) * 1e-6
            w = w_ref[:]

            def body(i, carry):
                a, b = carry
                if mode in ("mxu", "both"):
                    a = jax.lax.dot_general(
                        a, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    # rescale so the chain neither explodes nor dies
                    a = (a * jnp.float32(0.999)).astype(jnp.bfloat16)
                if mode in ("vpu", "both"):
                    b = jnp.exp(-jnp.abs(b)) + jnp.float32(1e-3)
                return (a, b)

            a, b = jax.lax.fori_loop(
                0,
                n_iters,
                body,
                (
                    a_ref[:] + c.astype(jnp.bfloat16),
                    b_ref[:] + c,
                ),
            )
            oa_ref[:] = a
            ob_ref[:] = b

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
                pl.BlockSpec((VR, VC), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
                pl.BlockSpec((VR, VC), lambda i, *_: (0, 0)),
            ],
        )
        call = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((M, M), jnp.bfloat16),
                jax.ShapeDtypeStruct((VR, VC), jnp.float32),
            ],
            grid_spec=grid_spec,
            interpret=args.interpret,
        )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run(a, b, c):
            def sbody(carry, _):
                aa, bb, cc = carry
                aa, bb = call(cc, aa, w0, bb)
                return (aa, bb, cc + 1), None

            (a, b, c), _ = jax.lax.scan(
                sbody, (a, b, c), None, length=args.outer
            )
            return a, b, c

        return run

    def timed(run, n_calls=2):
        a, b, c = run(
            a0.copy(), b0.copy(), jnp.zeros((1,), jnp.int32)
        )
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        for _ in range(n_calls):
            a, b, c = run(a, b, c)
        jax.block_until_ready((a, b))
        return (time.perf_counter() - t0) / n_calls

    def per_iter(mode):
        iters = args.iters
        for _ in range(4):
            t_full = timed(make_run(mode, iters))
            t_half = timed(make_run(mode, iters // 2))
            if (t_full > t_half * 1.2 and t_full > 0.05) or args.interpret:
                break
            iters *= 4
        return (t_full - t_half) / (args.outer * (iters - iters // 2))

    print(f"device={jax.devices()[0]}", flush=True)
    out = {}
    for mode in ("mxu", "vpu", "both"):
        out[mode] = per_iter(mode)
        print(f"  {mode}: {out[mode] * 1e6:.3f} us/iter", flush=True)
    serial = out["mxu"] + out["vpu"]
    overlap = max(out["mxu"], out["vpu"])
    rec = {
        "us_per_iter": {k: round(v * 1e6, 4) for k, v in out.items()},
        "serial_bound_us": round(serial * 1e6, 4),
        "overlap_bound_us": round(overlap * 1e6, 4),
        "overlap_fraction": round(
            (serial - out["both"]) / max(serial - overlap, 1e-12), 3
        ),
        "verdict": (
            "OVERLAPS" if out["both"] < 0.75 * serial else "SERIAL"
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
