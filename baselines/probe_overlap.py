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

POSITIVE CONTROL (VERDICT r4 item 5): a falsifier with no positive
control is half a falsifier — the SERIAL verdict on MXU/VPU is only
meaningful if the same methodology CAN detect overlap where it is
known to exist.  Mosaic's automatic grid pipelining double-buffers
HBM->VMEM block DMA against compute (the flash kernel's fwd exploits
exactly this), so the control arms measure, per grid step over a
multi-block input:
  ctl_dma  — stream a fresh [512,1024] fp32 block in and out (no
             compute): the HBM-bandwidth bound.
  ctl_mxu  — the same grid but every step maps to block 0 (Mosaic
             skips the re-fetch) + a chained-dot body: pure compute.
  ctl_both — fresh block per step + the same dot body: if pipelining
             works, t_both ≈ max(t_dma, t_mxu), NOT the sum.
A sub-additive ctl_both (control_verdict OVERLAPS) calibrates the
probe: the instrument detects overlap when the platform provides it,
so the MXU/VPU SERIAL verdict is a measurement, not an artifact.

Usage: python baselines/probe_overlap.py [--iters 4096] [--outer 16]
       [--ctl-blocks 64] [--ctl-dots 16]
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
    ap.add_argument(
        "--ctl-blocks", type=int, default=64,
        help="grid length (streamed [512,1024] fp32 blocks) for the "
        "positive-control arms",
    )
    ap.add_argument(
        "--ctl-dots", type=int, default=40,
        help="chained [256,256] dots per control grid step — sized "
        "so compute ~ DMA (measured: 16 dots = 5.0us vs 12.7us "
        "DMA/step; 40 dots balances them, giving the largest "
        "serial-vs-overlap separation)",
    )
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

    # ---------------- positive control: DMA-vs-MXU grid pipelining ----
    BR, BC = 512, 1024  # streamed fp32 block: 2 MB in + 2 MB out

    x_full = {}

    def make_ctl_run(mode, n_blocks):
        fresh = mode in ("ctl_dma", "ctl_both")
        dots = mode in ("ctl_mxu", "ctl_both")

        def kern(c_ref, x_ref, a_ref, w_ref, y_ref, oa_ref):
            i = pl.program_id(0)
            c = c_ref[0].astype(jnp.float32) * 1e-6
            # stream the block through (in-DMA + out-DMA per step when
            # the index map advances; a constant map makes Mosaic skip
            # the re-fetch and defer the writeback)
            y_ref[:] = x_ref[:] * (jnp.float32(1.0) + c)

            @pl.when(i == 0)
            def _init():
                oa_ref[:] = a_ref[:] + c.astype(jnp.bfloat16)

            if dots:
                w = w_ref[:]

                def body(_, a):
                    a = jax.lax.dot_general(
                        a, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return (a * jnp.float32(0.999)).astype(jnp.bfloat16)

                oa_ref[:] = jax.lax.fori_loop(
                    0, args.ctl_dots, body, oa_ref[:]
                )

        blk = (lambda i, *_: (i, 0)) if fresh else (lambda i, *_: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((BR, BC), blk),
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BR, BC), blk),
                pl.BlockSpec((M, M), lambda i, *_: (0, 0)),
            ],
        )
        rows = (n_blocks if fresh else 1) * BR
        call = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((rows, BC), jnp.float32),
                jax.ShapeDtypeStruct((M, M), jnp.bfloat16),
            ],
            grid_spec=grid_spec,
            interpret=args.interpret,
        )
        if rows not in x_full:
            x_full[rows] = jnp.asarray(
                rng.standard_normal((rows, BC)), jnp.float32
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run(x, a, c):
            def sbody(carry, _):
                xx, aa, cc = carry
                yy, aa = call(cc, xx, aa, w0)
                return (yy, aa, cc + 1), None

            (x, a, c), _ = jax.lax.scan(
                sbody, (x, a, c), None, length=args.outer
            )
            return x, a, c

        return run, rows

    def ctl_timed(run, rows, n_calls=2):
        x, a, c = run(
            x_full[rows].copy(), a0.copy(), jnp.zeros((1,), jnp.int32)
        )
        jax.block_until_ready((x, a))
        t0 = time.perf_counter()
        for _ in range(n_calls):
            x, a, c = run(x, a, c)
        jax.block_until_ready((x, a))
        return (time.perf_counter() - t0) / n_calls

    def ctl_per_step(mode):
        g = args.ctl_blocks
        for _ in range(4):
            run_f, rows_f = make_ctl_run(mode, g)
            run_h, rows_h = make_ctl_run(mode, g // 2)
            t_full = ctl_timed(run_f, rows_f)
            t_half = ctl_timed(run_h, rows_h)
            if (t_full > t_half * 1.2 and t_full > 0.05) or args.interpret:
                break
            g *= 4
        return (t_full - t_half) / (args.outer * (g - g // 2))

    print(f"device={jax.devices()[0]}", flush=True)
    out = {}
    for mode in ("mxu", "vpu", "both"):
        out[mode] = per_iter(mode)
        print(f"  {mode}: {out[mode] * 1e6:.3f} us/iter", flush=True)
    serial = out["mxu"] + out["vpu"]
    overlap = max(out["mxu"], out["vpu"])

    ctl = {}
    for mode in ("ctl_dma", "ctl_mxu", "ctl_both"):
        ctl[mode] = ctl_per_step(mode)
        print(f"  {mode}: {ctl[mode] * 1e6:.3f} us/step", flush=True)
    ctl_serial = ctl["ctl_dma"] + ctl["ctl_mxu"]
    ctl_overlap = max(ctl["ctl_dma"], ctl["ctl_mxu"])

    rec = {
        "us_per_iter": {k: round(v * 1e6, 4) for k, v in out.items()},
        "serial_bound_us": round(serial * 1e6, 4),
        "overlap_bound_us": round(overlap * 1e6, 4),
        "overlap_fraction": round(
            (serial - out["both"]) / max(serial - overlap, 1e-12), 3
        ),
        "verdict": (
            "OVERLAPS"
            if (serial - out["both"]) > 0.5 * (serial - overlap)
            else "SERIAL"
        ),
        "control_us_per_step": {
            k: round(v * 1e6, 4) for k, v in ctl.items()
        },
        "control_serial_bound_us": round(ctl_serial * 1e6, 4),
        "control_overlap_bound_us": round(ctl_overlap * 1e6, 4),
        "control_overlap_fraction": round(
            (ctl_serial - ctl["ctl_both"])
            / max(ctl_serial - ctl_overlap, 1e-12),
            3,
        ),
        # fraction-based: how much of the IDEAL overlap headroom
        # (serial - max) was realised.  A fixed 0.75x-of-serial cut
        # mislabels unbalanced arms — e.g. dma 12.7 / mxu 5.0 us:
        # even PERFECT overlap only reaches 0.72x serial
        "control_verdict": (
            "OVERLAPS"
            if (ctl_serial - ctl["ctl_both"])
            > 0.5 * (ctl_serial - ctl_overlap)
            else "SERIAL"
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
