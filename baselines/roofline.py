"""Speed-of-light (roofline) analysis of the production train step.

The task: decide whether the measured step time is a framework defect
or the model's shape.  For each hot component this tool

1. COUNTS the work analytically — MXU flops, VPU elementwise sweeps,
   and HBM bytes — from the REAL band/tile schedule the kernel runs
   (``plan_bands`` + ``_tile_schedule`` on the actual MCA/zorro mask),
   not from a dense O(T^2) model;
2. MEASURES the chip's achievable primitive rates at the kernel's own
   operand shapes (a [bq,64]x[64,bk] score dot cannot reach the
   big-GEMM rate: the contraction dim fills half the 128-deep MXU),
   with the same scan-chained methodology as profile_step.py (the
   remote relay caches identical-args launches and bills per-launch
   dispatch — every rate comes from a dependency-chained loop inside
   one executable);
3. REPORTS measured time vs TWO bounds per component: the ideal
   ``max(t_MXU, t_VPU, t_HBM)`` (``light_ms`` / ``x_of_light``) and
   the PLATFORM bound ``max(t_MXU + t_VPU, t_HBM)`` (``serial_ms`` /
   ``x_of_serial``) — probe_overlap.py measured (round 4) that Mosaic
   never co-issues MXU and VPU work, even for fully independent
   chains in one body, so compute-unit time adds while DMA still
   overlaps.  A kernel at ~1.0x of serial is at light speed on this
   toolchain.

Usage:
  python baselines/roofline.py [--dataset tcga|cmu] [--variant zorro]
                               [--k 16] [--out results.jsonl]

The counting functions are pure numpy (unit-tested in
tests/test_roofline.py); only main() touches the device.

Reference anchor: the O(T^2) einsum attention this kernel replaces is
ref model.py:88-99; the reference has no performance accounting at all
(SURVEY.md section 6).
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# v5e spec sheet numbers, used only as reference lines in the report
# (the bounds themselves use MEASURED rates)
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819.0


# ---------------------------------------------------------------------------
# Analytic op counting (pure numpy — no jax import needed)
# ---------------------------------------------------------------------------


def attention_counts(attn_mask, bands, *, batch, heads, dim_head,
                     io_bytes=2, mask_mode="select"):
    """Count the banded flash kernel's work for ONE layer.

    Returns {"fwd": {...}, "bwd": {...}} with per-direction
    ``mxu_flops`` (2*M*N*K convention), ``vpu_elems`` (regular
    [bq, bk]-sweep element-ops: compares/selects/adds/mults/reduces),
    ``exp_elems`` (transcendental sweeps, measured at their own rate),
    and ``hbm_bytes``.  Counts mirror _fwd_kernel/_fused_bwd_kernel:

    - fwd per visited tile: 2 MXU dots (QK^T, PV); ~7 regular VPU
      sweeps (mask cmp/or/select = 3, running max = 1, subtract = 1,
      probability sum = 1, p cast to bf16 = 1) + 1 exp sweep;
    - fused bwd per visited tile: 5 MXU dots; ~9 regular sweeps
      (mask 3, subtract 1, p cast 1, dp-delta 1, ds mult 1,
      ds casts 2) + 1 exp sweep;
    - HBM: k/v tiles per tile, q (+do/lse/delta in bwd) per tile in
      kv-major order / per q-run in q-major order, int8 mask tile per
      non-full tile, outputs per run — all multiplied by batch*heads
      (the grid re-streams the mask per batch-head; that is the
      measured mask-DMA bill from PERF.md round 2).
    """
    from mca_tpu.ops.flash_attention import _tile_schedule

    bh = batch * heads
    d = dim_head
    fwd = dict(mxu_flops=0.0, vpu_elems=0.0, exp_elems=0.0,
               hbm_bytes=0.0, mxu_by_shape={})
    bwd = dict(mxu_flops=0.0, vpu_elems=0.0, exp_elems=0.0,
               hbm_bytes=0.0, mxu_by_shape={})
    attn_mask = np.asarray(attn_mask, bool)
    if bands is None:
        t = attn_mask.shape[0]
        from mca_tpu.ops.flash_attention import _auto_blocks

        bq, bk = _auto_blocks(attn_mask)
        bands = [(0, t, 0, t, bq, bk)]

    def add_shape(dirn, cls, bq, bk, flops):
        key = f"{cls}:{bq}x{d}x{bk}"
        dirn["mxu_by_shape"][key] = (
            dirn["mxu_by_shape"].get(key, 0.0) + flops
        )
        dirn["mxu_flops"] += flops

    for r0, r1, c0, c1, bq, bk in bands:
        sub = attn_mask[r0:r1, c0:c1]
        q_of, kv_of, full, *_ = _tile_schedule(sub, bq, bk)
        n_tiles = len(q_of)
        n_masked_tiles = int((full == 0).sum())
        n_q_runs = int((np.diff(q_of) != 0).sum()) + 1
        kv_sorted = np.sort(kv_of)
        n_kv_runs = int((np.diff(kv_sorted) != 0).sum()) + 1
        entries = n_tiles * bq * bk
        tile_flops = bh * n_tiles * 2 * bq * bk * d  # one dot's worth

        # fwd: QK^T + PV, charged at the measured rate of exactly that
        # two-dot tile dataflow ("fwdpair" microbench)
        add_shape(fwd, "fwdpair", bq, bk, 2 * tile_flops)
        fwd["vpu_elems"] += bh * entries * 7
        fwd["exp_elems"] += bh * entries
        fwd["hbm_bytes"] += bh * (
            n_tiles * 2 * bk * d * io_bytes          # k, v tiles
            + n_q_runs * bq * d * io_bytes           # q per run
            + n_q_runs * bq * (d * io_bytes + 4)     # out + lse
            + n_masked_tiles * bq * bk               # int8 mask tile
            + n_tiles * bk                           # pad row (int8)
        )

        # bwd (fused): the 5-dot tile dataflow, charged at the measured
        # rate of the same dot chain ("bwd5" microbench)
        add_shape(bwd, "bwd5", bq, bk, 5 * tile_flops)
        bwd["vpu_elems"] += bh * entries * 9
        bwd["exp_elems"] += bh * entries
        bwd["hbm_bytes"] += bh * (
            n_tiles * 2 * bk * d * io_bytes          # k, v tiles
            + n_tiles * 2 * bq * d * io_bytes        # q, do per tile
            + n_tiles * bq * 8                       # lse, delta fp32
            + (r1 - r0) * d * 4                      # dq flush (fp32)
            + n_kv_runs * 2 * bk * d * io_bytes      # dk, dv flush
            + n_masked_tiles * bq * bk               # int8 mask tile
            + n_tiles * bk
        )
    return {"fwd": fwd, "bwd": bwd}


def gemm_flops(cfg_like, seq_len):
    """Non-attention MXU flops for one forward pass: QKV/out
    projections, GEGLU FF, value encoders — the same model bench.py's
    MFU uses, minus the attention term."""
    D = cfg_like["dim"]
    B = cfg_like["batch"]
    depth = cfg_like["depth"]
    H, dh = cfg_like["heads"], cfg_like["dim_head"]
    inner = int(D * cfg_like["ff_mult"] * 2 / 3)
    T = seq_len
    proj = 2 * B * T * D * (H * dh * 4)
    ff = 2 * B * T * (D * 2 * inner + inner * D)
    enc = 2 * B * cfg_like["enc_tokens"] * D * (D + 2)
    return depth * (proj + ff) + enc


def optimizer_bytes(n_params, moment_bytes=4):
    """Flat fused AdamW HBM traffic per step: read params+m+v+grads,
    write params+m+v (fp32 flat vector; bf16 moments halve m/v)."""
    return n_params * (4 * 2 + 4 + 2 * 2 * moment_bytes)


def light_ms(counts, rates):
    """Light-speed time (ms) for a counted component: the max over the
    three units, each at its measured achievable rate.  When the
    component carries per-shape MXU flops (attention tiles), each
    shape class is charged at ITS measured rate — a d=64-contraction
    score dot cannot reach the deep-contraction rate."""
    shape_rates = rates.get("mxu_shape_rates", {})
    by_shape = counts.get("mxu_by_shape") or {}
    if by_shape and all(k in shape_rates for k in by_shape):
        t_mxu = sum(f / shape_rates[k] for k, f in by_shape.items())
    else:
        t_mxu = counts["mxu_flops"] / rates["mxu_flops_s"]
    t_vpu = (
        counts["vpu_elems"] / rates["vpu_elems_s"]
        + counts["exp_elems"] / rates["exp_elems_s"]
    )
    t_hbm = counts["hbm_bytes"] / rates["hbm_bytes_s"]
    return {
        "mxu_ms": t_mxu * 1e3,
        "vpu_ms": t_vpu * 1e3,
        "hbm_ms": t_hbm * 1e3,
        "light_ms": max(t_mxu, t_vpu, t_hbm) * 1e3,
        # the PLATFORM bound: probe_overlap.py measured (round 4) that
        # Mosaic never co-issues MXU and VPU work — two fully
        # independent chains in one body take the serial SUM — so the
        # achievable floor for a compute kernel is t_mxu + t_vpu
        # (DMA still overlaps compute; hbm stays a max() term)
        "serial_ms": max(t_mxu + t_vpu, t_hbm) * 1e3,
        "bound": max(
            ("mxu", t_mxu), ("vpu", t_vpu), ("hbm", t_hbm),
            key=lambda kv: kv[1],
        )[0],
    }


# ---------------------------------------------------------------------------
# Device-rate microbenchmarks (scan-chained; see module docstring)
# ---------------------------------------------------------------------------


def _timed_chain(fn, x0, k, n_calls=2):
    import jax

    x = jax.block_until_ready(fn(x0.copy()))  # fn donates its arg
    t0 = time.perf_counter()
    for _ in range(n_calls):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / (n_calls * k)


def _counter_kernel(body_fn, x0, aux=None, iters=2048, outer=16,
                    interpret=False):
    """Timing harness for an in-VMEM Pallas microkernel.

    ``body_fn(c, aux_val) -> (x -> x')`` returns the per-iteration
    update; the kernel runs ``iters`` dependent iterations with the
    whole working set VMEM-resident (no HBM in the measured loop), and
    a ``lax.scan`` of length ``outer`` chains the kernel inside ONE
    executable.  Two defeated timing traps (PERF.md methodology):

    - per-launch dispatch through the remote relay is ~10-100 ms —
      far more than the kernel work — so the rate is taken from the
      DIFFERENCE between a full-``iters`` and a half-``iters``
      executable (identical launch/dispatch/scan structure, the
      subtraction cancels every fixed cost);
    - a launch-counter scalar perturbs the update and rides the
      donated carry, so no two launches see bit-identical arguments
      (the relay result-caches identical launches, and the chains
      would otherwise converge to fixed points).

    Returns seconds per kernel-internal iteration.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret:  # CPU logic smoke only — rates are meaningless there
        iters, outer = min(iters, 4), min(outer, 2)

    n_aux = 0 if aux is None else 1

    def make_run(n_iters):
        def kern(c_ref, *refs):
            if n_aux:
                x_ref, aux_ref, o_ref = refs
                aux_val = aux_ref[:]
            else:
                x_ref, o_ref = refs
                aux_val = None
            step = body_fn(c_ref[0], aux_val)
            o_ref[:] = jax.lax.fori_loop(
                0, n_iters, lambda i, x: step(x), x_ref[:]
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(x0.shape, lambda i, *_: (0,) * x0.ndim)
            ] + ([pl.BlockSpec(aux.shape, lambda i, *_: (0,) * aux.ndim)]
                 if n_aux else []),
            out_specs=pl.BlockSpec(x0.shape, lambda i, *_: (0,) * x0.ndim),
        )
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x0.shape, x0.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def run(x, c):
            def body(carry, _):
                xc, cc = carry
                args = (cc, xc) + ((aux,) if n_aux else ())
                return (call(*args), cc + 1), None

            (x, c), _ = jax.lax.scan(body, (x, c), None, length=outer)
            return x, c

        return run

    def timed(run, n_calls=2):
        import jax.numpy as jnp

        x, c = run(x0.copy(), jnp.zeros((1,), jnp.int32))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            x, c = run(x, c)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / n_calls

    # escalate the per-launch work until the full-length launch is
    # clearly separated from the half-length one — otherwise the
    # difference is per-launch dispatch jitter, not kernel time
    for _ in range(4):
        t_full = timed(make_run(iters))
        t_half = timed(make_run(iters // 2))
        if t_full > t_half * 1.2 and t_full > 0.05:
            break
        if interpret:
            break
        iters *= 4
    return (t_full - t_half) / (outer * (iters - iters // 2))


def measure_rates(shapes=((400, 896),), dim_head=64, k=16,
                  interpret=False):
    """Measured achievable rates on THIS device, from VMEM-resident
    Pallas microkernels (dependency-chained, launch-counter-perturbed
    — see _counter_kernel):

    - ``mxu_shape_rates["score:bqxdxbk"]``: bf16 [bq,d]x[bk,d]^T dot
      with fp32 accumulation at each band's exact block shape — the
      honest MXU ceiling for a d=64 contraction (half the 128-deep
      systolic array is idle);
    - ``mxu_shape_rates["av:bqxdxbk"]``: bf16 [bq,bk]x[bk,d] dot —
      deep contraction but d-wide output;
    - ``mxu_big_flops_s``: 1024^3 square bf16 dot (near-peak
      reference, still VMEM-resident);
    - ``vpu_elems_s``: fp32 elementwise op rate (x - c*x*x chain: two
      multiplies + a subtract per sweep, not algebraically foldable);
    - ``exp_elems_s``: fp32 exp sweep rate;
    - ``hbm_bytes_s``: read+write streaming bandwidth (XLA level — the
      one rate that must touch HBM).
    """
    import jax
    import jax.numpy as jnp

    rates = {}
    d = dim_head

    # --- MXU rates at the kernel's own tile dataflow ---------------------
    # Two dead-code-proof mimics per band block shape (every dot's full
    # output feeds the next dot or the carry, so Mosaic cannot trim
    # unused columns -- a naive `s[:, :64]` feedback measured ABOVE the
    # chip's bf16 peak before this was caught):
    #   fwdpair: s = QK^T; o = PV; carry += o    (the fwd tile's 2 dots)
    #   bwd5:    the fused backward tile's 5 dots
    # iters is sized so one LAUNCH carries ~5 TFLOP (~100 ms on the
    # MXU) — the full-minus-half subtraction must sit far above the
    # multi-ms per-launch dispatch jitter, and _counter_kernel
    # escalates further if the two launches are not clearly separated.
    shape_rates = {}
    target_flops = 5e12
    outer = 8
    for bq, bk in sorted(set(shapes)):
        q0 = jnp.full((bq, d), 0.01, jnp.bfloat16)
        kv = jnp.full((2 * bk, d), 0.01, jnp.bfloat16)  # k and v stacked

        def pair_body(c, kv_mat, _bk=bk):
            eps = (1.0 + c.astype(jnp.float32) * 1e-3) * 1e-4
            kmat, vmat = kv_mat[:_bk], kv_mat[_bk:]

            def step(q):
                s = jax.lax.dot_general(
                    q, kmat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, bk]
                o = jax.lax.dot_general(
                    s.astype(q.dtype), vmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, d] -- consumes every column of s
                return (q + o * eps).astype(q.dtype)

            return step

        it = max(64, int(target_flops / (outer * 4 * bq * d * bk)))
        dt = _counter_kernel(pair_body, q0, aux=kv, iters=it,
                             outer=outer, interpret=interpret)
        shape_rates[f"fwdpair:{bq}x{d}x{bk}"] = 4 * bq * d * bk / dt

        def bwd5_body(c, kv_mat, _bk=bk):
            eps = (1.0 + c.astype(jnp.float32) * 1e-3) * 1e-4
            kmat, vmat = kv_mat[:_bk], kv_mat[_bk:]

            def step(q):
                do = q  # same shape/role as the upstream gradient
                s = jax.lax.dot_general(          # score recompute
                    q, kmat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(         # dP = dO V^T
                    do, vmat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = (s + dp).astype(q.dtype)     # consumes both [bq, bk]
                dv = jax.lax.dot_general(         # dV = P^T dO
                    ds, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dk = jax.lax.dot_general(         # dK = dS^T Q
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dq = jax.lax.dot_general(         # dQ = dS K
                    ds, kmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                fold = jnp.sum(dv + dk, axis=0, keepdims=True)  # [1, d]
                return (q + (dq + fold) * eps).astype(q.dtype)

            return step

        it = max(64, int(target_flops / (outer * 10 * bq * d * bk)))
        dt = _counter_kernel(bwd5_body, q0, aux=kv, iters=it,
                             outer=outer, interpret=interpret)
        shape_rates[f"bwd5:{bq}x{d}x{bk}"] = 10 * bq * d * bk / dt
    rates["mxu_shape_rates"] = shape_rates
    rates["mxu_flops_s"] = min(shape_rates.values())

    # --- big square dot (near-peak reference) ---------------------------
    n = 1024
    a0 = jnp.full((n, n), 0.01, jnp.bfloat16)

    def big_body(c, bmat):
        eps = (1.0 + c.astype(jnp.float32) * 1e-3) * 1e-4

        def step(a):
            s = jax.lax.dot_general(
                a, bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (a + s * eps * (1.0 / n)).astype(a.dtype)

        return step

    dt = _counter_kernel(big_body, a0, aux=a0, iters=1024,
                         interpret=interpret)
    rates["mxu_big_flops_s"] = 2 * n**3 / dt

    # --- VPU fp32 elementwise rate --------------------------------------
    v0 = jnp.full((512, 1024), 0.5, jnp.float32)

    def vpu_body(c, _):
        coef = 0.5 + c.astype(jnp.float32) * 1e-7

        def step(x):
            return x - coef * x * x  # 3 elem-ops, non-foldable

        return step

    dt = _counter_kernel(vpu_body, v0, iters=4096, interpret=interpret)
    rates["vpu_elems_s"] = 3 * v0.size / dt

    # --- exp sweep rate ---------------------------------------------------
    def exp_body(c, _):
        eps = c.astype(jnp.float32) * 1e-7

        def step(x):
            return jnp.exp(-x - eps)  # stays in (0, 1]

        return step

    dt = _counter_kernel(exp_body, v0, iters=4096, interpret=interpret)
    rates["exp_elems_s"] = v0.size / dt  # exp sweeps only

    # --- HBM stream bandwidth (XLA; data-dependent increment so scan
    # iterations cannot be algebraically collapsed into one pass, and
    # the same full-minus-half subtraction cancels launch dispatch) -----
    h0 = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB

    def hbm_chain(length):
        @partial(jax.jit, donate_argnums=0)
        def run(x):
            def body(c, _):
                return c + (1.0 + c[0, 0, 0] * 1e-9), None

            return jax.lax.scan(body, x, None, length=length)[0]

        return run

    n_h = max(k, 256)
    t_full = _timed_chain(hbm_chain(n_h), h0, 1)
    t_half = _timed_chain(hbm_chain(n_h // 2), h0, 1)
    dt = (t_full - t_half) / (n_h - n_h // 2)
    rates["hbm_bytes_s"] = 2 * h0.nbytes / dt  # read + write
    return rates


# ---------------------------------------------------------------------------
# Measured attention-kernel arm
# ---------------------------------------------------------------------------


def measure_attention(attn_mask, *, batch, heads, dim_head, k=96,
                      fn=None):
    """Time the production banded kernel alone (fwd, fwd+bwd) for one
    layer: dependency-chained scans inside one executable, full-minus-
    half-length subtraction to cancel the relay's per-launch dispatch
    (same methodology as _counter_kernel).  ``fn(q, k, v, pad)``
    overrides the kernel under test (block/band sweeps build their
    own via make_banded_flash_attention)."""
    import jax
    import jax.numpy as jnp

    from mca_tpu.ops.flash_attention import flash_masked_attention

    t = attn_mask.shape[0]
    d = dim_head
    key = jax.random.key(0)
    q = jax.random.normal(key, (batch, heads, t, d), jnp.bfloat16) * 0.1
    pad = jnp.zeros((batch, t), bool)
    scale = d**-0.5

    interpret = jax.default_backend() != "tpu"  # CPU smoke only

    def attn(q):
        if fn is not None:
            return fn(q, q, q, pad)
        return flash_masked_attention(
            q, q, q, scale=scale, attn_mask=attn_mask,
            key_padding_mask=pad, interpret=interpret,
        )

    def loss(q):
        return attn(q).astype(jnp.float32).sum()

    def fwd_chain(length):
        @partial(jax.jit, donate_argnums=0)
        def run(q):
            def body(c, _):
                o = attn(c)
                return (c + o * 1e-6).astype(c.dtype), None

            return jax.lax.scan(body, q, None, length=length)[0]

        return run

    def bwd_chain(length):
        @partial(jax.jit, donate_argnums=0)
        def run(q):
            def body(c, _):
                _, g = jax.value_and_grad(loss)(c)
                return (c + g * 1e-6).astype(c.dtype), None

            return jax.lax.scan(body, q, None, length=length)[0]

        return run

    def per_iter_ms(chain):
        t_full = _timed_chain(chain(k), q, 1)
        t_half = _timed_chain(chain(k // 2), q, 1)
        return (t_full - t_half) / (k - k // 2) * 1e3

    fwd_ms = per_iter_ms(fwd_chain)
    fb_ms = per_iter_ms(bwd_chain)
    return {"fwd_ms": fwd_ms, "fwd_bwd_ms": fb_ms,
            "bwd_ms": fb_ms - fwd_ms}


# ---------------------------------------------------------------------------


def build_case(dataset="tcga", variant=""):
    """Real mask + bands + model shape for a canonical config."""
    import __graft_entry__ as ge
    from mca_tpu import masks as masks_lib
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.ops.flash_attention import plan_bands

    overrides = {}
    if variant == "zorro":
        overrides["zorro"] = True
    if dataset == "cmu":
        shapes = {
            "COVAREP": (74, 1500),
            "FACET": (35, 450),
            "OpenFace": (713, 450),
            "glove_vectors": (300, 50),
        }
        overrides["encoder_configs"] = {
            m: {"type": "EmbeddedSequenceEncoder", "input_size": di,
                "max_tokens": ti}
            for m, (di, ti) in shapes.items()
        }
        overrides["modality_config"] = {
            m: {"type": "embedded_sequence", "pad_len": ti,
                "data_col_name": "data", "pad_token": -10000,
                "embedding_size": di}
            for m, (di, ti) in shapes.items()
        }
        overrides["bimodal_contrastive"] = False
        overrides["non_fusion_fcl"] = False
    cfg = training_config_from_dict(ge._tcga_config(**overrides))
    mc = get_model_config(cfg)
    token_dims = [
        int(e["max_tokens"]) for e in cfg.encoder_configs.values()
    ]
    ms = masks_lib.build_masks(
        token_dims, int(cfg.num_fusion_tokens), list(cfg.fusion_combos),
        zorro=bool(cfg.zorro), fcl=bool(cfg.get("fcl", False)),
        no_fusion=bool(cfg.get("no_fusion", False)),
    )
    attn_mask = np.asarray(ms.attn_mask, bool)
    return {
        "attn_mask": attn_mask,
        "bands": plan_bands(attn_mask),
        "cfg_like": {
            "dim": mc["dim"], "depth": mc["depth"], "heads": mc["heads"],
            "dim_head": mc["dim_head"], "ff_mult": mc["ff_mult"],
            "batch": cfg.batch_size, "enc_tokens": sum(token_dims),
        },
        "seq_len": ms.seq_len,
        "n_params": 16_600_000,  # canonical; only feeds optimizer bytes
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="tcga")
    ap.add_argument("--variant", default="")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    case = build_case(args.dataset, args.variant)
    cl = case["cfg_like"]
    bands = case["bands"]
    shapes = sorted(
        {(bq, bk) for (_, _, _, _, bq, bk) in (bands or [])}
    ) or [(384, 896)]

    print(f"device={jax.devices()[0]}", flush=True)
    rates = measure_rates(shapes=shapes, dim_head=cl["dim_head"],
                          k=args.k)
    for name, v in rates.items():
        if isinstance(v, dict):
            for s, r in v.items():
                print(f"  rate {name}[{s}] = {r / 1e12:.2f} T/s",
                      flush=True)
        else:
            print(f"  rate {name} = {v / 1e12:.3f} T/s", flush=True)

    counts = attention_counts(
        case["attn_mask"], bands, batch=cl["batch"], heads=cl["heads"],
        dim_head=cl["dim_head"],
    )
    depth = cl["depth"]
    rows = []
    meas = measure_attention(
        case["attn_mask"], batch=cl["batch"], heads=cl["heads"],
        dim_head=cl["dim_head"], k=max(16, 3 * args.k),
    )
    for dirn, measured in (("fwd", meas["fwd_ms"]),
                           ("bwd", meas["bwd_ms"])):
        ls = light_ms(counts[dirn], rates)
        rows.append({
            "component": f"attention_{dirn}_per_layer",
            "measured_ms": round(measured, 3),
            **{k2: round(v2, 3) if isinstance(v2, float) else v2
               for k2, v2 in ls.items()},
            "x_of_light": round(measured / ls["light_ms"], 2),
            "x_of_serial": round(measured / ls["serial_ms"], 2),
        })
        step = {
            k2: (
                {kk: vv * depth for kk, vv in v2.items()}
                if isinstance(v2, dict)
                else v2 * depth
            )
            for k2, v2 in counts[dirn].items()
        }
        ls_step = light_ms(step, rates)
        rows.append({
            "component": f"attention_{dirn}_per_step",
            "measured_ms": round(measured * depth, 3),
            **{k2: round(v2, 3) if isinstance(v2, float) else v2
               for k2, v2 in ls_step.items()},
            "x_of_light": round(measured * depth / ls_step["light_ms"], 2),
            "x_of_serial": round(
                measured * depth / ls_step["serial_ms"], 2
            ),
        })

    gf = gemm_flops(cl, case["seq_len"])
    t_gemm = gf / rates["mxu_big_flops_s"] * 1e3
    rows.append({
        "component": "proj+ff+enc GEMMs fwd per step",
        "light_ms": round(t_gemm, 3), "bound": "mxu",
        "note": "bwd = 2x; full-depth contractions run near big-GEMM "
                "rate",
    })
    ob = optimizer_bytes(case["n_params"])
    rows.append({
        "component": "optimizer (flat AdamW) per step",
        "light_ms": round(ob / rates["hbm_bytes_s"] * 1e3, 3),
        "bound": "hbm",
    })

    report = {
        "dataset": args.dataset, "variant": args.variant,
        "device": str(jax.devices()[0]),
        "rates": {
            k2: (v2 if not isinstance(v2, dict) else v2)
            for k2, v2 in rates.items()
        },
        "spec": {"bf16_peak_flops_s": V5E_BF16_PEAK,
                 "hbm_spec_gbs": V5E_HBM_GBS},
        "bands": [list(b) for b in (bands or [])],
        "rows": rows,
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
