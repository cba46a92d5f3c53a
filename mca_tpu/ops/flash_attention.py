"""Block-sparse flash attention for the MCA/Zorro masks (Pallas, TPU).

The reference materialises dense [B, H, T, T] score tensors
(ref model.py:88-99) — at the canonical packed length T≈2548 that is
~1.7 GB of fp32 traffic per layer per direction, and the attention is
HBM-bound.  This kernel computes the same masked softmax-attention in
O(T) memory with an online softmax, AND skips work using the static
block structure of the zorro/MCA masks (modality-diagonal blocks plus
fusion-channel rows): only tiles with at least one unmasked entry are
visited, enumerated in CSR order at trace time from the numpy mask
(``mca_tpu.masks.block_mask_info`` computes the same tile map).

Semantics (matching ``mca_tpu.ops.attention.dense_masked_attention``):

- ``attn_mask`` [T, T] bool, True = blocked, STATIC (numpy, shared
  across batch & heads) — baked into the tile schedule;
- ``key_padding_mask`` [B, T] bool, True = padded, dynamic;
- fully-masked query rows return **zeros** (the dense path yields a
  uniform average over all keys there because masked scores are set to
  the finite fp32 min; such rows only exist at padded positions whose
  outputs are never consumed — see tests/test_flash_attention.py).

Forward and backward are Pallas kernels (custom_vjp): dq uses the same
q-major tile order as the forward; dk/dv a kv-major reordering of the
same tile set, so the backward is block-sparse too.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# base-2 softmax (MCA_FLASH_EXP2=1): fold log2(e) into the q scale so
# every [bq, bk] exponential becomes a raw exp2 — the VPU computes
# exp(x) as exp2(x * log2e), so pre-folding the constant into the
# existing [bq, d] scale multiply deletes one [bq, bk] multiply per
# exp sweep per tile.  lse is then stored in base-2 units (fwd and bwd
# agree; it never leaves the custom_vjp), and dk, which absorbs the q
# pre-scale, is corrected by 1/log2e once per kv-block flush.
LOG2E = 1.4426950408889634
INV_LOG2E = 1.0 / LOG2E
# row-statistic floor: a fully-masked row's max/lse is NEG_INF; flooring
# at DEAD_CLAMP makes exp(NEG_INF - DEAD_CLAMP) == 0 so dead rows yield
# p == 0 without spending a [bq, bk] where on every tile (real scores
# are nowhere near this magnitude)
DEAD_CLAMP = -1e29

# the fused backward keeps dq as a full-length [tq, d] fp32 block
# VMEM-resident for the whole inner grid (~640KB at canonical scale);
# beyond this budget (longer packs / fatter heads) fall back to the
# split backward, which tiles dq like every other operand
_FUSED_DQ_VMEM_BUDGET = int(4 * 1024 * 1024)
# dq_mode=partial writes one fp32 dq tile per visited grid iteration
# to HBM (bh, n_tiles, block_q, d); cap that buffer and fall back to
# the split backward past it (ADVICE r3 — unguarded it can reach
# multiple GB on large dense-ish masks)
_PARTIAL_DQ_HBM_BUDGET = int(
    float(os.environ.get("MCA_FLASH_PARTIAL_DQ_HBM_GB", "1.0")) * 2**30
)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_schedule(
    mask: np.ndarray, block_q: int, block_k: int
) -> Tuple[np.ndarray, ...]:
    """CSR tile enumeration of the static mask (rectangular OK).

    Returns (q_of_tile, kv_of_tile, full_of_tile) in q-major order and
    the same triple in kv-major order, plus padded block counts
    (nq, nk).  ``full_of_tile`` is 1 where the tile has NO blocked
    entries at all — the kernels skip the mask load + where there
    (most interior modality-diagonal tiles at fine block sizes).
    Padded region is fully blocked.

    Every q block and every kv block is guaranteed at least one tile:
    the fwd/dq kernels write outputs per visited q block and the
    dkv/fused-bwd kernels per visited kv block, so an unvisited block
    would leave uninitialised garbage in its output slot.  Square
    MCA/zorro masks always cover everything (each token attends its
    own modality; fusion rows attend everywhere), but rectangular
    band slices (:func:`make_banded_flash_attention`) and arbitrary
    corpus masks may not — uncovered blocks get one synthetic
    fully-masked tile (p == 0 inside the kernel: outputs flush zeros).
    """
    t, s = mask.shape
    tq, tk = _pad_to(t, block_q), _pad_to(s, block_k)
    padded = np.ones((tq, tk), dtype=bool)
    padded[:t, :s] = mask
    nq, nk = tq // block_q, tk // block_k
    tiles = padded.reshape(nq, block_q, nk, block_k)
    active = ~tiles.all(axis=(1, 3))  # [nq, nk] tile has any unmasked
    full = ~tiles.any(axis=(1, 3))  # [nq, nk] tile has NO blocked
    for i in np.nonzero(~active.any(axis=1))[0]:
        active[i, 0] = True  # synthetic fully-masked tile (full stays 0)
    for j in np.nonzero(~active.any(axis=0))[0]:
        active[0, j] = True
    qs, ks = np.nonzero(active)  # row-major == q-major order
    fl = full[qs, ks]
    order2 = np.lexsort((qs, ks))  # kv-major order
    return (
        qs.astype(np.int32),
        ks.astype(np.int32),
        fl.astype(np.int32),
        qs[order2].astype(np.int32),
        ks[order2].astype(np.int32),
        fl[order2].astype(np.int32),
        nq,
        nk,
    )


def _apply_masks(s, t, full_of, mask_ref, pad_ref, has_mask,
                 mask_mode="select"):
    """Suppress blocked/padded score entries (drive them to ~NEG_INF).

    Three measured variants (PERF.md round 3 bisect, full-step TCGA
    tok/s at auto blocks):

    - ``select`` (default, 392.5k): boolean int8 mask operand,
      compare/or/select.
    - ``add`` (318k): additive bf16 mask (0 / NEG_INF), one add per
      operand.  Fewer VPU sweeps on paper, but the bf16 tile doubles
      the per-tile mask DMA bytes and the upcast eats the saving —
      measured 19% slower end-to-end.
    - ``skip`` (318.6k): ``select`` plus a per-tile ``lax.cond`` that
      skips the mask on fully-unmasked tiles.  Mosaic's per-tile
      branch breaks the software pipeline, and at the tuned coarse
      blocks there are few-to-zero full tiles to win back the loss.

    The losing variants stay behind MCA_FLASH_MASK_MODE as A/B knobs
    and regression oracles.
    """
    if mask_mode == "add":
        if has_mask:
            s = s + mask_ref[:]
        return s + pad_ref[0][:1, :]
    pad_row = pad_ref[0][:1, :] != 0  # [1, bk], broadcasts
    if not has_mask:
        return jnp.where(pad_row, NEG_INF, s)
    if mask_mode == "select":
        return jnp.where((mask_ref[:] != 0) | pad_row, NEG_INF, s)
    return jax.lax.cond(
        full_of[t] != 0,
        lambda s: jnp.where(pad_row, NEG_INF, s),
        lambda s: jnp.where(
            (mask_ref[:] != 0) | pad_row, NEG_INF, s
        ),
        s,
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _prob_dt(prob_dtype: str):
    """Score/probability tile dtype (`MCA_FLASH_PROB_DTYPE`): bf16
    shares fp32's exponent range, so NEG_INF/DEAD_CLAMP survive; the
    [bq, bk] softmax chain runs on half-width lanes and the p·v
    operand needs no cast.  Row statistics (max/lse/l) stay fp32 in
    scratch either way.  Measured a ~3% LOSS at canonical scale
    (PERF.md round 3: the transcendental chain is not lane-width-bound
    and the casts cost real VPU time) — kept as an A/B knob, default
    f32; numerics vs the dense oracle are looser (8-bit score
    mantissa), pinned in tests/test_flash_attention.py and on-chip in
    baselines/tpu_kernel_parity.py."""
    return jnp.bfloat16 if prob_dtype == "bf16" else jnp.float32


def _score_dot(q, k, sdt):
    """QK^T tile scores.  Mosaic requires 32-bit matmul accumulators on
    hardware ("Expected matmul acc to be 32-bit"), so the dot always
    accumulates fp32; in prob_dtype=bf16 mode the [bq, bk] tile is cast
    down AFTER the dot — the VPU softmax chain still runs on half-width
    lanes, and fp32 accumulation is strictly better numerically than a
    bf16 accumulator would have been."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s if sdt == jnp.float32 else s.astype(sdt)


def _fwd_kernel(
    # scalar prefetch
    q_of, kv_of, full_of,
    # inputs: q, k, v, [mask,] pad — then outputs and scratch
    q_ref, k_ref, v_ref, *rest,
    scale: float, has_mask: bool = True, mask_mode: str = "select",
    use_exp2: bool = False, prob_dtype: str = "f32",
):
    if has_mask:
        mask_ref, pad_ref, out_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        mask_ref = None
        pad_ref, out_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    prev_q = q_of[jnp.maximum(t - 1, 0)]
    next_q = q_of[jnp.minimum(t + 1, nt - 1)]
    is_first = jnp.logical_or(t == 0, q_of[t] != prev_q)
    is_last = jnp.logical_or(t == nt - 1, q_of[t] != next_q)

    @pl.when(is_first)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # native-dtype operands (bf16 hits the MXU at full rate), fp32
    # accumulation via preferred_element_type; scale folded into the q
    # tile ([bq, d] multiplies instead of [bq, bk]); exp2 mode folds
    # log2e in too and works in the base-2 domain throughout
    exp = jnp.exp2 if use_exp2 else jnp.exp
    sdt = _prob_dt(prob_dtype)
    qscale = scale * LOG2E if use_exp2 else scale
    q = q_ref[0] * jnp.asarray(qscale, q_ref.dtype)  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]
    s = _score_dot(q, k, sdt)  # [bq, bk] fp32 (bf16 in prob_dtype=bf16 mode)
    s = _apply_masks(s, t, full_of, mask_ref, pad_ref, has_mask, mask_mode)

    m_prev = m_scr[:][:, :1]  # [bq, 1]
    l_prev = l_scr[:][:, :1]
    # the DEAD_CLAMP floor keeps fully-masked rows at p == 0 without a
    # second [bq, bk] where: dead rows have max == NEG_INF, so
    # exp(NEG_INF - DEAD_CLAMP) == 0; blocked entries in live rows are
    # exp(NEG_INF - finite) == 0 already
    m_new = jnp.maximum(
        jnp.maximum(
            m_prev,
            jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32),
        ),
        DEAD_CLAMP,
    )
    p = exp(s - m_new.astype(sdt))
    correction = exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(
        p, axis=-1, keepdims=True, dtype=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(is_last)
    def _():
        l = l_scr[:][:, :1]
        out = jnp.where(l > 0, acc_scr[:] / jnp.where(l > 0, l, 1.0), 0.0)
        out_ref[0] = out.astype(out_ref.dtype)
        m = m_scr[:][:, :1]
        # exp2 mode: lse in base-2 units (log2(l) == ln(l) * log2e —
        # stick to jnp.log, guaranteed to lower, [bq, 1] once per row
        # block either way)
        logl = jnp.log(jnp.where(l > 0, l, 1.0))
        if use_exp2:
            logl = logl * LOG2E
        lse = jnp.where(l > 0, m + logl, NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_of, kv_of, full_of,
    q_ref, k_ref, v_ref, *rest,
    scale: float, has_mask: bool = True, mask_mode: str = "select",
    use_exp2: bool = False, prob_dtype: str = "f32",
):
    if has_mask:
        (mask_ref, pad_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scr) = rest
    else:
        mask_ref = None
        pad_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr = rest
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    is_first = jnp.logical_or(
        t == 0, q_of[t] != q_of[jnp.maximum(t - 1, 0)]
    )
    is_last = jnp.logical_or(
        t == nt - 1, q_of[t] != q_of[jnp.minimum(t + 1, nt - 1)]
    )

    @pl.when(is_first)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    # scale folded into the q tile: s matches the forward exactly and
    # the [bq, bk] multiply disappears (exp2 mode folds log2e in too;
    # lse arrives in matching base-2 units)
    qscale = scale * LOG2E if use_exp2 else scale
    sdt = _prob_dt(prob_dtype)
    q = q_ref[0] * jnp.asarray(qscale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # lse floor: dead rows store lse == NEG_INF; flooring makes
    # exp(NEG_INF - DEAD_CLAMP) == 0 without a second [bq, bk] where
    lse = jnp.maximum(lse_ref[0][:, :1], DEAD_CLAMP)  # [bq, 1]
    delta = delta_ref[0][:, :1]
    s = _score_dot(q, k, sdt)
    s = _apply_masks(s, t, full_of, mask_ref, pad_ref, has_mask, mask_mode)
    p = (jnp.exp2 if use_exp2 else jnp.exp)(s - lse.astype(sdt))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + scale * jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(is_last)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _fused_bwd_kernel(
    q_of, kv_of, full_of,
    q_ref, k_ref, v_ref, *rest,
    scale: float, block_q: int, has_mask: bool = True,
    mask_mode: str = "select", use_exp2: bool = False,
    prob_dtype: str = "f32", dq_mode: str = "output",
    body_order: str = "chain",
):
    """Single kv-major pass computing dq, dk and dv together.

    The split backward (``_dq_kernel`` + ``_dkv_kernel``) recomputes
    the tile scores and probabilities twice (7 MXU dots per tile and
    two exp sweeps); this kernel computes them once (5 dots, one exp).
    dk/dv accumulate in per-kv-block scratch exactly like
    ``_dkv_kernel``; dq accumulates into a full-length fp32 block
    whose index depends only on the batch-head, so it stays
    VMEM-resident across the whole inner grid (read-modify-write with
    a dynamic row slice at ``q_of[t] * block_q``) and is flushed to
    HBM once per batch-head.  ``dq_mode`` picks where that block
    lives: ``output`` accumulates directly in the output ref;
    ``scratch`` accumulates in VMEM scratch and copies to the output
    once per batch-head — an A/B arm for the roofline finding that
    the backward serializes MXU against VPU (PERF.md round 3: the
    read-modify-write on an *output* block is the prime suspect for
    the broken software pipeline).  ``partial`` removes the hazard
    entirely: every grid iteration writes its dq tile to its OWN
    output slot (static index map ``t``, no read-modify-write, no
    dynamic slice anywhere in the kernel), and the host-side wrapper
    segment-sums the partials over the q-tile ids with a one-hot
    einsum (gather/scatter measured slower than one-hot dots on TPU —
    PERF.md MoE dispatch).

    ``body_order`` probes *intra-body* MXU/VPU overlap — the one lever
    the three-way dq A/B (all neutral) left unfalsified (PERF.md
    round 3, ninth session): ``chain`` is the dependence-ordered
    default; ``hoist`` issues the (independent) dp dot before the exp
    sweep so an in-order scheduler can run them concurrently;
    ``pair`` splits the kv tile into two half-width chains with their
    MXU and VPU ops interleaved, so every VPU sweep has a
    data-independent dot adjacent to it.  All three compute identical
    math (``pair`` reorders only the dq contraction's accumulation).
    """
    if dq_mode == "scratch":
        *rest, dq_scr = rest
    else:
        dq_scr = None
    if has_mask:
        (mask_ref, pad_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = rest
    else:
        mask_ref = None
        (pad_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref, dk_scr, dv_scr) = rest
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    kv_first = jnp.logical_or(
        t == 0, kv_of[t] != kv_of[jnp.maximum(t - 1, 0)]
    )
    kv_last = jnp.logical_or(
        t == nt - 1, kv_of[t] != kv_of[jnp.minimum(t + 1, nt - 1)]
    )

    if dq_mode != "partial":

        @pl.when(t == 0)
        def _():
            if dq_scr is None:
                dq_ref[0] = jnp.zeros_like(dq_ref[0])
            else:
                dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(kv_first)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # scale folded into the q tile: s matches the forward, the
    # [bq, bk] multiply disappears, and dk's scale factor is absorbed
    # (dot(ds^T, scale*q) == scale * dot(ds^T, q)).  exp2 mode folds
    # log2e in too (lse arrives base-2); the extra log2e absorbed into
    # dk is divided back out once per kv-block flush.
    qscale = scale * LOG2E if use_exp2 else scale
    sdt = _prob_dt(prob_dtype)
    expf = jnp.exp2 if use_exp2 else jnp.exp
    q = q_ref[0] * jnp.asarray(qscale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # lse floor: dead rows yield p == 0 without a [bq, bk] where
    lse = jnp.maximum(lse_ref[0][:, :1], DEAD_CLAMP)
    delta = delta_ref[0][:, :1]

    def _dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    if body_order == "pair" and mask_mode == "select":
        # two independent half-width chains, MXU/VPU interleaved
        h2 = k.shape[0] // 2
        k_a, k_b = k[:h2], k[h2:]
        v_a, v_b = v[:h2], v[h2:]
        s_a = _score_dot(q, k_a, sdt)
        dp_a = _dot(do, v_a, ((1,), (1,)))
        s_b = _score_dot(q, k_b, sdt)
        dp_b = _dot(do, v_b, ((1,), (1,)))
        pad_row = pad_ref[0][:1, :] != 0
        if has_mask:
            blocked = (mask_ref[:] != 0) | pad_row
        else:
            blocked = jnp.broadcast_to(pad_row, (1, k.shape[0]))
        lse_s = lse.astype(sdt)
        p_a = expf(jnp.where(blocked[:, :h2], NEG_INF, s_a) - lse_s)
        ds_a = p_a * (dp_a - delta)
        p_b = expf(jnp.where(blocked[:, h2:], NEG_INF, s_b) - lse_s)
        dv_scr[:h2] = dv_scr[:h2] + _dot(
            p_a.astype(do.dtype), do, ((0,), (0,))
        )
        ds_b = p_b * (dp_b - delta)
        dv_scr[h2:] = dv_scr[h2:] + _dot(
            p_b.astype(do.dtype), do, ((0,), (0,))
        )
        dk_scr[:h2] = dk_scr[:h2] + _dot(
            ds_a.astype(q.dtype), q, ((0,), (0,))
        )
        dq_tile = _dot(ds_a.astype(k.dtype), k_a, ((1,), (0,)))
        dk_scr[h2:] = dk_scr[h2:] + _dot(
            ds_b.astype(q.dtype), q, ((0,), (0,))
        )
        dq_tile = scale * (
            dq_tile + _dot(ds_b.astype(k.dtype), k_b, ((1,), (0,)))
        )
    elif body_order == "hoist":
        # dp is independent of s/p: issue it before the exp sweep
        s = _score_dot(q, k, sdt)
        dp = _dot(do, v, ((1,), (1,)))
        s = _apply_masks(
            s, t, full_of, mask_ref, pad_ref, has_mask, mask_mode
        )
        p = expf(s - lse.astype(sdt))
        ds = p * (dp - delta)
        dv_scr[:] = dv_scr[:] + _dot(
            p.astype(do.dtype), do, ((0,), (0,))
        )
        dk_scr[:] = dk_scr[:] + _dot(
            ds.astype(q.dtype), q, ((0,), (0,))
        )
        dq_tile = scale * _dot(ds.astype(k.dtype), k, ((1,), (0,)))
    else:
        s = _score_dot(q, k, sdt)
        s = _apply_masks(
            s, t, full_of, mask_ref, pad_ref, has_mask, mask_mode
        )
        p = expf(s - lse.astype(sdt))
        dv_scr[:] = dv_scr[:] + _dot(
            p.astype(do.dtype), do, ((0,), (0,))
        )
        dp = _dot(do, v, ((1,), (1,)))
        ds = p * (dp - delta)
        dk_scr[:] = dk_scr[:] + _dot(
            ds.astype(q.dtype), q, ((0,), (0,))
        )
        dq_tile = scale * _dot(ds.astype(k.dtype), k, ((1,), (0,)))
    if dq_mode == "partial":
        dq_ref[0, 0] = dq_tile
    else:
        rows = pl.dslice(q_of[t] * block_q, block_q)
        if dq_scr is None:
            dq_ref[0, rows, :] = dq_ref[0, rows, :] + dq_tile
        else:
            dq_scr[rows, :] = dq_scr[rows, :] + dq_tile

    @pl.when(kv_last)
    def _():
        dk = dk_scr[:] * INV_LOG2E if use_exp2 else dk_scr[:]
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)

    if dq_scr is not None:

        @pl.when(t == nt - 1)
        def _():
            dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_of, kv_of, full_of,
    q_ref, k_ref, v_ref, *rest,
    scale: float, has_mask: bool = True, mask_mode: str = "select",
    use_exp2: bool = False, prob_dtype: str = "f32",
):
    if has_mask:
        (mask_ref, pad_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = rest
    else:
        mask_ref = None
        (pad_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = rest
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    is_first = jnp.logical_or(
        t == 0, kv_of[t] != kv_of[jnp.maximum(t - 1, 0)]
    )
    is_last = jnp.logical_or(
        t == nt - 1, kv_of[t] != kv_of[jnp.minimum(t + 1, nt - 1)]
    )

    @pl.when(is_first)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # scale folded into the q tile: s matches the forward, the
    # [bq, bk] multiply disappears, and dk's scale factor is absorbed
    # (dot(ds^T, scale*q) == scale * dot(ds^T, q)).  exp2 mode folds
    # log2e in too (lse arrives base-2); the extra log2e absorbed into
    # dk is divided back out once per kv-block flush.
    qscale = scale * LOG2E if use_exp2 else scale
    sdt = _prob_dt(prob_dtype)
    q = q_ref[0] * jnp.asarray(qscale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # lse floor: dead rows yield p == 0 without a [bq, bk] where
    lse = jnp.maximum(lse_ref[0][:, :1], DEAD_CLAMP)
    delta = delta_ref[0][:, :1]
    s = _score_dot(q, k, sdt)
    s = _apply_masks(s, t, full_of, mask_ref, pad_ref, has_mask, mask_mode)
    p = (jnp.exp2 if use_exp2 else jnp.exp)(s - lse.astype(sdt))
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(is_last)
    def _():
        dk = dk_scr[:] * INV_LOG2E if use_exp2 else dk_scr[:]
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _partition_enabled() -> bool:
    import os

    return os.environ.get("MCA_FLASH_NO_PARTITION", "0") != "1"


def _shard_batch_heads(fn, rule: str, n_repl: int = 0):
    """Batch/head partitioning rule for a Pallas-calling local fn.

    ``pallas_call`` is opaque to the XLA partitioner: under jit over a
    sharded batch it would be REPLICATED (inputs all-gathered onto
    every device), destroying data-parallel scaling of the production
    train step.  The kernels are embarrassingly parallel over the
    batch and head dims, so ``custom_partitioning`` declares exactly
    that: arguments keep whatever (batch, head) sharding they arrive
    with — e.g. batch on ``data``, heads on ``model`` under megatron
    tensor parallelism (``mca_tpu.parallel.sharding``) — while the
    sequence/feature dims are forced replicated (the tile schedule is
    derived from the full static mask), and the per-shard lowering is
    just ``fn`` on local shapes.  The equivalent collective layout the
    reference reaches via DDP+NCCL (ref train_accel_gpu.py:93-95) falls
    out with zero communication inside attention.

    ``rule`` is the Shardy factor rule, e.g.
    ``"b h t d, b h s d, b h s d, b s, n, n -> b h t d, b h t"``;
    the trailing ``n_repl`` operands (tile schedules, int8 mask) are
    forced fully replicated.
    """
    from jax.experimental.custom_partitioning import (
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec

    op = custom_partitioning(fn)

    def _spec_for(rank, bspec, hspec):
        if rank == 2:
            return PartitionSpec(bspec, None)
        if rank == 3:
            return PartitionSpec(bspec, hspec, None)
        return PartitionSpec(bspec, hspec, None, None)

    def _spec_of(sharding, ndim, mesh):
        """PartitionSpec of a sharding the partitioner hands us.

        Normally a NamedSharding; inside a ``shard_map`` manual region
        (e.g. the pipeline-parallel layer stack) the callback receives
        a GSPMDSharding without ``.spec`` — recover it by parsing the
        HLO sharding against the mesh, and fall back to replicated
        (correct, just no batch/head partitioning inside that region)
        if the parse fails."""
        spec = getattr(sharding, "spec", None)
        if spec is not None:
            return spec
        try:
            from jax._src.pxla import parse_flatten_op_sharding

            return parse_flatten_op_sharding(
                sharding._to_xla_hlo_sharding(ndim), mesh
            )[0].get_partition_spec()
        except Exception:
            return PartitionSpec()

    def _bh(arg_shapes, mesh):
        spec = _spec_of(
            arg_shapes[0].sharding, len(arg_shapes[0].shape), mesh
        )
        b = spec[0] if len(spec) > 0 else None
        h = spec[1] if len(spec) > 1 else None
        return b, h

    def _out_shardings(mesh, arg_shapes, result_shape):
        b, h = _bh(arg_shapes, mesh)
        seq = isinstance(result_shape, (tuple, list))
        results = result_shape if seq else (result_shape,)
        outs = tuple(
            NamedSharding(mesh, _spec_for(len(r.shape), b, h))
            for r in results
        )
        return outs if seq else outs[0]

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh(arg_shapes, mesh)
        n_bh = len(arg_shapes) - n_repl
        arg_shardings = tuple(
            NamedSharding(
                mesh,
                _spec_for(len(a.shape), b, h)
                if i < n_bh
                else PartitionSpec(),
            )
            for i, a in enumerate(arg_shapes)
        )
        return (
            mesh,
            fn,
            _out_shardings(mesh, arg_shapes, result_shape),
            arg_shardings,
        )

    def infer(mesh, arg_shapes, result_shape):
        return _out_shardings(mesh, arg_shapes, result_shape)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return op


def _prep_mask(
    attn_mask: np.ndarray, block_q: int, block_k: int,
    mask_mode: str = "select",
) -> np.ndarray:
    t, s = attn_mask.shape
    tq, tk = _pad_to(t, block_q), _pad_to(s, block_k)
    padded = np.ones((tq, tk), dtype=bool)
    padded[:t, :s] = attn_mask
    if mask_mode == "add":
        # additive bf16 mask (0 / NEG_INF): one add in the kernel
        # instead of compare+or+select
        return np.where(padded, NEG_INF, 0.0).astype(jnp.bfloat16)
    return padded.astype(np.int8)


def _dimsem_params(dimsem: bool):
    """Mosaic grid-dimension semantics A/B knob (``MCA_FLASH_DIMSEM``).

    The grid is ``(batch_head, tile)``: batch-heads are embarrassingly
    parallel; the tile dim must stay "arbitrary" (the online-softmax
    accumulators and the fused backward's dq block carry state across
    kv-tile revisits).  Declaring the first dim "parallel" lets Mosaic
    reorder/pipeline across batch-heads."""
    if not dimsem:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    }


def make_flash_attention(
    attn_mask: np.ndarray,
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 512,
    bwd_impl: str = "fused",
    interpret: bool = False,
    mask_mode: str = "select",
    use_exp2: bool = False,
    prob_dtype: str = "f32",
    dimsem: bool = False,
    dq_mode: str = "output",
    body_order: str = "chain",
):
    """Build a flash-attention fn for one static mask.

    Returns ``fn(q, k, v, key_padding_mask) -> out`` with
    q ``[B, H, Tq, D]``, k/v ``[B, H, Tk, D]`` and key_padding_mask
    ``[B, Tk]`` bool or None, where ``attn_mask`` is ``[Tq, Tk]`` —
    square for self-attention, rectangular for the row-band
    decomposition (:func:`make_banded_flash_attention`).
    Differentiable via custom_vjp (block-sparse backward).
    """
    assert attn_mask.ndim == 2
    tq_real, tk_real = attn_mask.shape
    mask8 = _prep_mask(
        np.asarray(attn_mask, bool), block_q, block_k, mask_mode
    )
    (q_of, kv_of, full_of, q_of2, kv_of2, full_of2, nq, nk) = (
        _tile_schedule(np.asarray(attn_mask, bool), block_q, block_k)
    )
    n_tiles = len(q_of)
    tq, tk = nq * block_q, nk * block_k

    def _pad_q(x):
        return jnp.pad(x, ((0, 0), (0, tq - tq_real), (0, 0)))

    def _pad_kv(x):
        # kv blocks index into a tk-length array; tq and tk differ
        # whenever block_q != block_k and T doesn't pad to the same
        # multiple of both
        return jnp.pad(x, ((0, 0), (0, tk - tk_real), (0, 0)))

    def _pad_keymask(pad, b):
        # the tk-tk_real alignment tail is always marked padded: with
        # an all-zero static mask (per-segment unmasked attention)
        # nothing else blocks those keys
        if pad is None:
            pad = jnp.zeros((b, tk_real), jnp.int8)
        pad2 = jnp.pad(
            pad.astype(jnp.int8),
            ((0, 0), (0, tk - tk_real)),
            constant_values=1,
        )
        if mask_mode == "add":
            # additive bf16 row (0 / NEG_INF), added in the kernel
            pad2 = jnp.where(
                pad2 != 0, jnp.bfloat16(NEG_INF), jnp.bfloat16(0)
            )
        # [B, 8, tk]: TPU blocks need the second-to-last dim >= 8; the
        # 8 rows are identical broadcast copies
        return jnp.broadcast_to(pad2[:, None, :], (b, 8, tk))

    # all-zero masks (per-segment unmasked attention) skip the mask
    # operand entirely — no [block_q, block_k] int8 tile DMA per step
    has_mask = bool(np.asarray(attn_mask, bool).any())
    # the mask BlockSpec routes full tiles to (0, 0) only in skip
    # mode (their values are then never read); other modes read the
    # true tile
    route_full = mask_mode == "skip" and has_mask

    def _mask_specs():
        if not has_mask:
            return []
        if not route_full:
            return [
                pl.BlockSpec(
                    (block_q, block_k),
                    lambda b, t, qo, ko, fo: (qo[t], ko[t]),
                )
            ]
        # fully-unmasked tiles route to block (0, 0): their mask
        # values are never read (the kernel's lax.cond skips the
        # apply), and consecutive full tiles then issue no mask DMA
        return [
            pl.BlockSpec(
                (block_q, block_k),
                lambda b, t, qo, ko, fo: (
                    qo[t] * (1 - fo[t]),
                    ko[t] * (1 - fo[t]),
                ),
            )
        ]

    def _mask_ops():
        return [jnp.asarray(mask8)] if has_mask else []

    def _fwd_call(q, k, v, pad8, h, sched, mask_op):
        bh = q.shape[0]
        grid = (bh, n_tiles)
        out, lse = pl.pallas_call(
            functools.partial(
                _fwd_kernel, scale=scale, has_mask=has_mask,
                mask_mode=mask_mode, use_exp2=use_exp2,
                prob_dtype=prob_dtype,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (1, block_q, q.shape[-1]),
                        lambda b, t, qo, ko, fo: (b, qo[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, block_k, k.shape[-1]),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, block_k, v.shape[-1]),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                    *_mask_specs(),
                    pl.BlockSpec(
                        (1, 8, block_k),
                        lambda b, t, qo, ko, fo: (b // h, 0, ko[t]),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, block_q, q.shape[-1]),
                        lambda b, t, qo, ko, fo: (b, qo[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, block_q, 8),
                        lambda b, t, qo, ko, fo: (b, qo[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, q.shape[-1]), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, tq, q.shape[-1]), q.dtype),
                jax.ShapeDtypeStruct((bh, tq, 8), jnp.float32),
            ],
            interpret=interpret,
            **_dimsem_params(dimsem),
        )(sched[0], sched[1], sched[2], q, k, v, *mask_op, pad8)
        return out, lse[:, :, 0]

    def _bwd_call(
        q, k, v, pad8, do, lse, delta, h, sched_q, sched_kv, mask_op
    ):
        bh = q.shape[0]
        d = q.shape[-1]
        lse = jnp.broadcast_to(lse[:, :, None], (bh, tq, 8))
        delta = jnp.broadcast_to(delta[:, :, None], (bh, tq, 8))

        common_in_specs = [
            pl.BlockSpec(
                (1, block_q, d), lambda b, t, qo, ko, fo: (b, qo[t], 0)
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, t, qo, ko, fo: (b, ko[t], 0)
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, t, qo, ko, fo: (b, ko[t], 0)
            ),
            *_mask_specs(),
            pl.BlockSpec(
                (1, 8, block_k),
                lambda b, t, qo, ko, fo: (b // h, 0, ko[t]),
            ),
            pl.BlockSpec(
                (1, block_q, d), lambda b, t, qo, ko, fo: (b, qo[t], 0)
            ),
            pl.BlockSpec(
                (1, block_q, 8),
                lambda b, t, qo, ko, fo: (b, qo[t], 0),
            ),
            pl.BlockSpec(
                (1, block_q, 8),
                lambda b, t, qo, ko, fo: (b, qo[t], 0),
            ),
        ]
        dq = pl.pallas_call(
            functools.partial(
                _dq_kernel, scale=scale, has_mask=has_mask,
                mask_mode=mask_mode, use_exp2=use_exp2,
                prob_dtype=prob_dtype,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bh, n_tiles),
                in_specs=common_in_specs,
                out_specs=[
                    pl.BlockSpec(
                        (1, block_q, d),
                        lambda b, t, qo, ko, fo: (b, qo[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype)
            ],
            interpret=interpret,
            **_dimsem_params(dimsem),
        )(sched_q[0], sched_q[1], sched_q[2], q, k, v,
          *mask_op, pad8, do, lse, delta)[0]

        dk, dv = pl.pallas_call(
            functools.partial(
                _dkv_kernel, scale=scale, has_mask=has_mask,
                mask_mode=mask_mode, use_exp2=use_exp2,
                prob_dtype=prob_dtype,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bh, n_tiles),
                in_specs=common_in_specs,
                out_specs=[
                    pl.BlockSpec(
                        (1, block_k, d),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, block_k, d),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
            ],
            interpret=interpret,
            **_dimsem_params(dimsem),
        )(sched_kv[0], sched_kv[1], sched_kv[2], q, k, v,
          *mask_op, pad8, do, lse, delta)
        return dq, dk, dv

    def _bwd_call_fused(
        q, k, v, pad8, do, lse, delta, h, sched_q, sched_kv, mask_op
    ):
        bh = q.shape[0]
        d = q.shape[-1]
        lse = jnp.broadcast_to(lse[:, :, None], (bh, tq, 8))
        delta = jnp.broadcast_to(delta[:, :, None], (bh, tq, 8))
        in_specs = [
            pl.BlockSpec(
                (1, block_q, d), lambda b, t, qo, ko, fo: (b, qo[t], 0)
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, t, qo, ko, fo: (b, ko[t], 0)
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, t, qo, ko, fo: (b, ko[t], 0)
            ),
            *_mask_specs(),
            pl.BlockSpec(
                (1, 8, block_k),
                lambda b, t, qo, ko, fo: (b // h, 0, ko[t]),
            ),
            pl.BlockSpec(
                (1, block_q, d), lambda b, t, qo, ko, fo: (b, qo[t], 0)
            ),
            pl.BlockSpec(
                (1, block_q, 8),
                lambda b, t, qo, ko, fo: (b, qo[t], 0),
            ),
            pl.BlockSpec(
                (1, block_q, 8),
                lambda b, t, qo, ko, fo: (b, qo[t], 0),
            ),
        ]
        if dq_mode == "partial":
            # one OWN output slot per grid iteration: static index
            # map, no RMW, no dynamic slice — nothing orders grid
            # iterations against each other on the dq buffer
            dq_spec = pl.BlockSpec(
                (1, 1, block_q, d), lambda b, t, qo, ko, fo: (b, t, 0, 0)
            )
            dq_shape = jax.ShapeDtypeStruct(
                (bh, n_tiles, block_q, d), jnp.float32
            )
        else:
            # dq: full-length fp32 block, resident for the whole
            # inner grid (index depends on b only)
            dq_spec = pl.BlockSpec(
                (1, tq, d), lambda b, t, qo, ko, fo: (b, 0, 0)
            )
            dq_shape = jax.ShapeDtypeStruct((bh, tq, d), jnp.float32)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _fused_bwd_kernel,
                scale=scale,
                block_q=block_q,
                has_mask=has_mask,
                mask_mode=mask_mode,
                use_exp2=use_exp2,
                prob_dtype=prob_dtype,
                dq_mode=dq_mode,
                body_order=body_order,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(bh, n_tiles),
                in_specs=in_specs,
                out_specs=[
                    dq_spec,
                    pl.BlockSpec(
                        (1, block_k, d),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                    pl.BlockSpec(
                        (1, block_k, d),
                        lambda b, t, qo, ko, fo: (b, ko[t], 0),
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                ] + (
                    [pltpu.VMEM((tq, d), jnp.float32)]
                    if dq_mode == "scratch"
                    else []
                ),
            ),
            out_shape=[
                dq_shape,
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
            ],
            interpret=interpret,
            **_dimsem_params(dimsem),
        )(sched_kv[0], sched_kv[1], sched_kv[2], q, k, v,
          *mask_op, pad8, do, lse, delta)
        if dq_mode == "partial":
            # segment-sum the per-tile partials over q-tile ids with a
            # one-hot dot (MXU; scatter-add serialises on TPU).  nq is
            # static: tq is padded to a block_q multiple.
            nq = tq // block_q
            onehot = (
                sched_kv[0][:, None] == jnp.arange(nq)[None, :]
            ).astype(jnp.float32)  # [n_tiles, nq]
            # HIGHEST precision: the onehot operand is exact 0/1, but
            # default TPU matmul precision would multiply the f32
            # partials in bf16, truncating each tile before the
            # cross-tile sum (ADVICE r3) — partial mode must accumulate
            # pure f32 like the output/scratch arms
            dq = jax.lax.dot_general(
                onehot,
                dq.reshape(bh, n_tiles, block_q * d),
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [nq, bh, block_q * d]
            dq = dq.transpose(1, 0, 2).reshape(bh, tq, d)
        return dq.astype(q.dtype), dk, dv

    # Local (per-shard) implementations at the [B, H, T, D] level.
    # These are the units custom_partitioning wraps: pure array fns of
    # batch/head-parallel operands with static T (the mask's length,
    # replicated under any sharding).  The tile-schedule arrays and the
    # int8 mask ride as explicit REPLICATED operands — custom
    # partitioning forbids closed-over array constants.

    def _fwd_local(q, k, v, pad, qo, ko, fo, *mask_op):
        b, h, t, d = q.shape
        s = k.shape[2]
        qf = _pad_q(q.reshape(b * h, t, d))
        kf = _pad_kv(k.reshape(b * h, s, d))
        vf = _pad_kv(v.reshape(b * h, s, d))
        pad8 = _pad_keymask(pad, b)
        out, lse = _fwd_call(qf, kf, vf, pad8, h, (qo, ko, fo), mask_op)
        return (
            out[:, :t].reshape(b, h, t, d),
            lse[:, :t].reshape(b, h, t),
        )

    def _bwd_local(
        q, k, v, pad, do, lse, delta,
        qo, ko, fo, qo2, ko2, fo2, *mask_op,
    ):
        b, h, t, d = q.shape
        s = k.shape[2]
        qf = _pad_q(q.reshape(b * h, t, d))
        kf = _pad_kv(k.reshape(b * h, s, d))
        vf = _pad_kv(v.reshape(b * h, s, d))
        pad8 = _pad_keymask(pad, b)
        dof = _pad_q(do.reshape(b * h, t, d))
        # padded-q rows re-enter with lse/delta == 0, so p == 1 there —
        # harmless: every gradient term multiplies do or delta, both
        # zero on padded rows
        lsef = jnp.pad(lse.reshape(b * h, t), ((0, 0), (0, tq - t)))
        deltaf = jnp.pad(
            delta.reshape(b * h, t), ((0, 0), (0, tq - t))
        )
        # scratch mode keeps the dq accumulator AND the output block
        # VMEM-resident — double the budget charge; partial mode keeps
        # only one (block_q, d) slot resident, so the full-length VMEM
        # budget gate does not apply — but its per-tile fp32 HBM
        # output grows with the visited tile count (bh x n_tiles x
        # block_q x d) and can reach GBs on large dense-ish masks
        # (ADVICE r3): bound it and fall back to the split backward
        dq_copies = 2 if dq_mode == "scratch" else 1
        partial_ok = (
            dq_mode == "partial"
            and b * h * n_tiles * block_q * d * 4
            <= _PARTIAL_DQ_HBM_BUDGET
        )
        use_fused = bwd_impl == "fused" and (
            partial_ok
            or (
                dq_mode != "partial"
                and dq_copies * tq * d * 4 <= _FUSED_DQ_VMEM_BUDGET
            )
        )
        bwd = _bwd_call_fused if use_fused else _bwd_call
        dq, dk, dv = bwd(
            qf, kf, vf, pad8, dof, lsef, deltaf, h,
            (qo, ko, fo), (qo2, ko2, fo2), mask_op,
        )
        return (
            dq[:, :t].reshape(b, h, t, d),
            dk[:, :s].reshape(b, h, s, d),
            dv[:, :s].reshape(b, h, s, d),
        )

    fwd_op, bwd_op = _fwd_local, _bwd_local
    if _partition_enabled():
        mask_rule = ", e f" if has_mask else ""
        fwd_op = _shard_batch_heads(
            _fwd_local,
            "b h t d, b h s d, b h s d, b s, n, n, n" + mask_rule
            + " -> b h t d, b h t",
            n_repl=3 + int(has_mask),
        )
        bwd_op = _shard_batch_heads(
            _bwd_local,
            "b h t d, b h s d, b h s d, b s, b h t d, b h t, b h t,"
            " n, n, n, n, n, n" + mask_rule
            + " -> b h t d, b h s d, b h s d",
            n_repl=6 + int(has_mask),
        )

    def _consts():
        return (
            tuple(
                jnp.asarray(a)
                for a in (q_of, kv_of, full_of, q_of2, kv_of2, full_of2)
            ),
            tuple(_mask_ops()),
        )

    @jax.custom_vjp
    def flash(q, k, v, key_padding_mask):
        out, _ = _flash_fwd(q, k, v, key_padding_mask)
        return out

    def _flash_fwd(q, k, v, key_padding_mask):
        pad = (
            jnp.zeros((q.shape[0], tk_real), jnp.int8)
            if key_padding_mask is None
            else key_padding_mask.astype(jnp.int8)
        )
        (qo, ko, fo, _, _, _), mask_op = _consts()
        out, lse = fwd_op(q, k, v, pad, qo, ko, fo, *mask_op)
        return out, (q, k, v, pad, out, lse)

    def _flash_bwd(res, g):
        q, k, v, pad, out, lse = res
        delta = jnp.sum(
            g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        )  # [B, H, T]
        (qo, ko, fo, qo2, ko2, fo2), mask_op = _consts()
        dq, dk, dv = bwd_op(
            q, k, v, pad, g, lse, delta,
            qo, ko, fo, qo2, ko2, fo2, *mask_op,
        )
        return dq, dk, dv, None

    flash.defvjp(_flash_fwd, _flash_bwd)
    return flash


# Per-mask cache: tracing rebuilds are cheap but kernel construction is
# deterministic per (mask bytes, scale, blocks); avoid re-deriving the
# tile schedule on every jit trace.
_CACHE = {}

#: candidate block shapes for the per-mask auto-tuner — UNPRUNED grid
#: (all lane-legal: bk multiple of 128, bq of 8; tile areas bounded by
#: the VMEM budget the 512x1024 shape was validated at).  No shape is
#: hand-excluded: the model ranks everything, and the ranking is
#: validated against full-step measurements for the canonical mask
#: families (PERF.md round-3 sweep tables).
_BLOCK_CANDIDATES = [
    (bq, bk)
    for bq in (256, 320, 384, 448, 512, 640)
    for bk in (512, 768, 896, 1024, 1280)
    if bq * bk <= 640 * 1024
]

#: fixed per-tile cost in score-entry equivalents, fitted to the v5e
#: full-step sweeps (PERF.md): fewer/fatter tiles win until the padded
#: area they drag in outweighs the per-tile overhead
_TILE_OVERHEAD_ENTRIES = 150_000

#: measured-optimal blocks for canonical mask families, keyed by
#: (mask shape, crc32(mask bytes)) — full-train-step measurements on
#: v5e (PERF.md round-3 validation sweep).  Measurement outranks the
#: cost model wherever an entry exists: for the CMU mask the model's
#: top pick (640x768) measured 3.2% below 512x1280 (367.0k vs 379.4k
#: tok/s), so trusting the model alone would regress the family.
#: TCGA/zorro entries agree with the model's pick; they are recorded
#: anyway so the canonical families never depend on the fitted
#: constant.  Novel masks fall through to the model ranking (or to
#: MCA_FLASH_TUNE=measure, which measures-at-first-use and
#: disk-caches).
_MEASURED_BLOCKS = {
    # round-3 re-sweep with fitted candidates: the length-fitted
    # 368x896 (model rank 1) measured 397.0k tok/s vs 393.0k at the
    # round-2 optimum 384x896
    ((2548, 2548), 0x780E75F6): (368, 896),  # TCGA_config1 MCA
    ((2548, 2548), 0x8D7D1974): (368, 896),  # TCGA_config1 zorro
    ((2538, 2538), 0x4E75D927): (512, 1280),  # CMU_config1
}

_AUTO_CACHE = {}


def _fitted_candidates(t: int, s: Optional[int] = None):
    """Shape-fitted candidate blocks for a ``[t, s]`` mask (square when
    ``s`` is omitted).

    The fixed grid pads badly at lengths it wasn't chosen for — e.g.
    an unmasked EAO pass at T=1600 visits 2048x2560 padded entries with
    the generic 512x1280 pick, while the fitted (320, 1664) covers
    1600x1664 (4% waste, one kv tile).  For each feasible tile count
    per axis, emit the smallest lane-legal block that still covers the
    axis (bq multiple of 8, bk of 128, area within the validated VMEM
    budget); the cost model ranks them against the generic grid, so a
    fitted shape only wins when it actually reduces
    visited-area + tile-count cost.  The bq floor drops to 8 for
    short row bands (e.g. the 88 fusion rows get bq=88).
    """
    import math

    s = t if s is None else s
    cands = set()
    bqs = {8 * math.ceil(t / (8 * n)) for n in range(1, t // 224 + 2)}
    bqs.add(8 * math.ceil(t / 8))  # whole axis in one block
    bks = {128 * math.ceil(s / (128 * n)) for n in range(1, s // 448 + 2)}
    bks.add(128 * math.ceil(s / 128))
    for bq in bqs:
        if not 8 <= bq <= 768:
            continue
        for bk in bks:
            if 128 <= bk and bq * bk <= 640 * 1024:
                cands.add((bq, bk))
    return cands


def _model_ranked(attn_mask: np.ndarray):
    """Candidate shapes ranked by ``visited_entries + C * n_tiles``
    over the generic grid plus the length-fitted shapes
    (``MCA_FLASH_FITTED=0`` disables the fitted shapes — A/B knob for
    the sweeps; canonical families resolve through the measured table
    first either way)."""
    import os

    cands = set(_BLOCK_CANDIDATES)
    if os.environ.get("MCA_FLASH_FITTED", "1") == "1":
        cands |= _fitted_candidates(*attn_mask.shape)
    rows = []
    for bq, bk in sorted(cands):
        q_of, *_ = _tile_schedule(attn_mask, bq, bk)
        n = len(q_of)
        rows.append((n * bq * bk + _TILE_OVERHEAD_ENTRIES * n, bq, bk))
    rows.sort()
    return [(bq, bk) for _, bq, bk in rows]


def _tune_cache_path() -> str:
    import os

    return os.environ.get(
        "MCA_FLASH_TUNE_CACHE",
        os.path.expanduser("~/.cache/mca_tpu/blocktune.json"),
    )


def _measure_blocks(
    attn_mask: np.ndarray,
    scale: float,
    qshape,
    dtype,
    bwd_impl: str,
    mask_mode: str = "select",
    use_exp2: bool = False,
    prob_dtype: str = "f32",
    dimsem: bool = False,
    dq_mode: str = "output",
    body_order: str = "chain",
) -> Tuple[int, int]:
    """Measure-at-first-use tuner (``MCA_FLASH_TUNE=measure``).

    Times fwd+bwd of the kernel itself for the cost model's top
    candidates on synthetic tensors of the call's real shape, and
    caches the winner on disk keyed by (mask crc, shape, batch-heads,
    head dim, dtype, mask mode, device kind) — the masks are static and
    few, so the sweep (a few compiles) runs once per novel mask per
    machine.  The swept kernels are built with the SAME ``mask_mode``
    that will run (the modes differ in mask DMA bytes, so their optima
    can differ).  Timing uses input-perturbed chained launches
    (identical-argument launches can return cached results on
    remote-attached TPUs, PERF.md).
    """
    import json
    import os
    import time
    import zlib

    b, h, t, d = qshape
    key = (
        f"{attn_mask.shape[0]}x{attn_mask.shape[1]}:"
        f"{zlib.crc32(attn_mask.tobytes()):08x}:bh{b * h}:d{d}:"
        f"{np.dtype(dtype).name}:{bwd_impl}:{mask_mode}:"
        f"exp2{int(use_exp2)}:p{prob_dtype}:ds{int(dimsem)}:"
        f"dq{dq_mode}:bo{body_order}:{jax.devices()[0].device_kind}"
    )
    path = _tune_cache_path()
    cache = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if key in cache:
        return tuple(cache[key][:2])

    rng = np.random.default_rng(0)
    # rectangular masks (band sub-rectangles): q rows from qshape,
    # kv length from the mask's column count
    tk = attn_mask.shape[1]
    mk = lambda n: jnp.asarray(
        rng.normal(size=(b, h, n, d)).astype(np.float32), dtype
    )
    q0, k0, v0 = mk(t), mk(tk), mk(tk)
    best = None
    # top-8 of the model ranking, plus the measured-table entry for
    # this mask if one exists (so the sweep can never rank below a
    # known full-step optimum — CMU's true best was the pre-fitted
    # model's rank 4, PERF.md)
    sweep = _model_ranked(attn_mask)[:8]
    table = _MEASURED_BLOCKS.get(
        (attn_mask.shape, zlib.crc32(attn_mask.tobytes()))
    )
    if table and table not in sweep:
        sweep.append(table)
    for bq, bk in sweep:
        fn = make_flash_attention(
            attn_mask,
            scale=scale,
            block_q=bq,
            block_k=bk,
            bwd_impl=bwd_impl,
            mask_mode=mask_mode,
            use_exp2=use_exp2,
            prob_dtype=prob_dtype,
            dimsem=dimsem,
            dq_mode=dq_mode,
            body_order=body_order,
        )

        def obj(q, k, v):
            return (fn(q, k, v, None).astype(jnp.float32) ** 2).sum()

        g = jax.jit(jax.grad(obj, argnums=(0, 1, 2)))
        dq, dk, dv = g(q0, k0, v0)  # compile + warm
        jax.block_until_ready(dq)
        t0 = time.perf_counter()
        for _ in range(4):  # chain through the inputs: no result reuse
            dq, dk, dv = g(
                q0 + dq.astype(dtype) * jnp.asarray(1e-6, dtype),
                k0,
                v0,
            )
        jax.block_until_ready(dq)
        ms = (time.perf_counter() - t0) / 4 * 1000
        if best is None or ms < best[2]:
            best = (bq, bk, ms)
    cache[key] = list(best)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass  # unwritable cache dir: re-measure next process
    return best[0], best[1]


def _auto_blocks(attn_mask: np.ndarray) -> Tuple[int, int]:
    """Pick (block_q, block_k) for a mask: measured-optimal table for
    the canonical families (:data:`_MEASURED_BLOCKS`), else minimise
    ``visited_entries + _TILE_OVERHEAD_ENTRIES * n_tiles`` over the
    unpruned candidate grid.  Env/explicit overrides and the
    measure-at-first-use mode (:func:`_measure_blocks`) always win.
    """
    import zlib

    key = (attn_mask.tobytes(), attn_mask.shape)
    if key not in _AUTO_CACHE:
        measured = _MEASURED_BLOCKS.get(
            (attn_mask.shape, zlib.crc32(attn_mask.tobytes()))
        )
        _AUTO_CACHE[key] = measured or _model_ranked(attn_mask)[0]
    return _AUTO_CACHE[key]


# ---------------------------------------------------------------------------
# Row-band decomposition (MCA_FLASH_BANDS)
# ---------------------------------------------------------------------------
#
# The MCA/zorro masks are unions of row bands with very different
# column supports (each modality's rows attend only their own ~200-800
# column band; the 88 fusion rows attend everywhere).  A single global
# (block_q, block_k) forces every q tile that straddles a band boundary
# to visit the UNION of both bands' columns: at the measured-optimal
# 368x896 blocks the TCGA schedule visits 4.29M padded entries for
# 1.90M useful ones (2.26x).  Attention rows are independent, so the
# exact same computation can run as one kernel launch per row band,
# each over just its band's column range with band-fitted blocks —
# TCGA drops to 2.65M visited entries (4 launches), CMU 5.90M -> 3.15M.
# Each band is an ordinary rectangular make_flash_attention instance
# (own custom_vjp + batch/head custom_partitioning); slicing q rows and
# kv columns composes with autodiff, and the overlapping dk/dv
# contributions (the fusion band spans every column) sum through the
# slice transposes XLA inserts.

_BAND_CACHE = {}

#: entries-equivalent charge per extra pallas launch in the band DP —
#: discourages splitting off slivers whose area saving can't pay for a
#: separate kernel launch + pipeline warmup.  Calibrated against the
#: partition-validation sweep (sweep_bands --part alt, PERF.md): the
#: TCGA gene|protein split (model Δ115k entries) measured +1.0%
#: full-step, the CMU glove split (model Δ-75k) measured -1.0% —
#: i.e. the measured per-launch cost is near zero in model units and
#: the block-padding term already rejects sliver bands; 100k keeps a
#: conservative floor (canonical picks are stable over 20k-110k).
_BAND_LAUNCH_OVERHEAD = 100_000


def _row_runs(mask: np.ndarray):
    """Maximal runs of identical mask rows, as [(r0, r1), ...)."""
    t = mask.shape[0]
    if t == 0:
        return []
    diff = np.any(mask[1:] != mask[:-1], axis=1)
    starts = np.concatenate(([0], np.nonzero(diff)[0] + 1))
    ends = np.concatenate((starts[1:], [t]))
    return list(zip(starts.tolist(), ends.tolist()))


def _band_rect(mask: np.ndarray, r0: int, r1: int):
    """Column support range of rows [r0, r1), c0 aligned down to the
    128-lane boundary so the kv slice starts lane-aligned."""
    sub = mask[r0:r1]
    cols = np.nonzero(~sub.all(axis=0))[0]
    if len(cols) == 0:  # fully-masked rows: minimal dummy range
        return 0, min(128, mask.shape[1])
    c0 = (int(cols[0]) // 128) * 128
    return c0, int(cols[-1]) + 1


def _best_blocks_cost(mask: np.ndarray):
    """(cost, bq, bk) minimising visited-area + per-tile overhead over
    the generic grid plus shape-fitted candidates (always included —
    band rectangles need them)."""
    cands = set(_BLOCK_CANDIDATES) | _fitted_candidates(*mask.shape)
    best = None
    for bq, bk in sorted(cands):
        q_of, *_ = _tile_schedule(mask, bq, bk)
        n = len(q_of)
        c = n * bq * bk + _TILE_OVERHEAD_ENTRIES * n
        if best is None or c < best[0]:
            best = (c, bq, bk)
    return best


def _bands_from_edges(attn_mask: np.ndarray, edges):
    """Bands from an explicit row partition (block choice still via
    the cost model).  ``edges`` are interior boundaries; 0 and T are
    implicit."""
    t = attn_mask.shape[0]
    cuts = [0] + sorted(int(e) for e in edges if 0 < int(e) < t) + [t]
    bands = []
    for r0, r1 in zip(cuts[:-1], cuts[1:]):
        c0, c1 = _band_rect(attn_mask, r0, r1)
        _, bq, bk = _best_blocks_cost(attn_mask[r0:r1, c0:c1])
        bands.append((r0, r1, c0, c1, bq, bk))
    return bands if len(bands) > 1 else None


def plan_bands(attn_mask: np.ndarray):
    """Optimal row-band partition of a static mask, or None.

    Dynamic program over maximal identical-row runs: cost of a band =
    the block cost model of its [rows, column-support] rectangle plus
    a per-launch charge.  Returns [(r0, r1, c0, c1, bq, bk), ...] with
    contiguous rows covering [0, T), or None when one band (the plain
    kernel) is optimal or banding does not apply.

    ``MCA_FLASH_BAND_EDGES="r1,r2,..."`` overrides the DP with an
    explicit row partition (the measurement sweeps A/B alternative
    partitions against the planner's; ``MCA_FLASH_BAND_EDGES=""`` is
    a no-op).
    """
    import os

    attn_mask = np.asarray(attn_mask, bool)
    edges_env = os.environ.get("MCA_FLASH_BAND_EDGES", "")
    if edges_env:
        return _bands_from_edges(
            attn_mask, (e for e in edges_env.split(",") if e.strip())
        )
    key = (attn_mask.tobytes(), attn_mask.shape)
    if key in _BAND_CACHE:
        return _BAND_CACHE[key]
    runs = _row_runs(attn_mask)
    n = len(runs)
    result = None
    # n > 64 means near-arbitrary row striping (no band structure to
    # exploit) — the O(n^2) DP would also get expensive
    if 2 <= n <= 64 and attn_mask.any():
        cost_memo = {}

        def icost(i, j):
            if (i, j) not in cost_memo:
                r0, r1 = runs[i][0], runs[j][1]
                c0, c1 = _band_rect(attn_mask, r0, r1)
                c, bq, bk = _best_blocks_cost(attn_mask[r0:r1, c0:c1])
                cost_memo[(i, j)] = (
                    c + _BAND_LAUNCH_OVERHEAD,
                    (r0, r1, c0, c1, bq, bk),
                )
            return cost_memo[(i, j)]

        best = [None] * (n + 1)
        best[0] = (0.0, [])
        for j in range(1, n + 1):
            for i in range(j):
                c, band = icost(i, j - 1)
                tot = best[i][0] + c
                if best[j] is None or tot < best[j][0]:
                    best[j] = (tot, best[i][1] + [band])
        bands = best[n][1]
        if len(bands) > 1:
            result = bands
    _BAND_CACHE[key] = result
    return result


def make_banded_flash_attention(
    attn_mask: np.ndarray, *, scale: float, bands, **kw
):
    """Row-band composition of rectangular flash kernels.

    ``bands`` comes from :func:`plan_bands`.  Returns the same
    ``fn(q, k, v, key_padding_mask) -> out`` contract as
    :func:`make_flash_attention`; gradients compose through each
    band's custom_vjp and the q/kv slices.
    """
    attn_mask = np.asarray(attn_mask, bool)
    fns = [
        (
            r0, r1, c0, c1,
            make_flash_attention(
                attn_mask[r0:r1, c0:c1],
                scale=scale, block_q=bq, block_k=bk, **kw,
            ),
        )
        for (r0, r1, c0, c1, bq, bk) in bands
    ]

    def banded(q, k, v, key_padding_mask):
        outs = []
        for r0, r1, c0, c1, fn in fns:
            pad_b = (
                None
                if key_padding_mask is None
                else key_padding_mask[:, c0:c1]
            )
            outs.append(
                fn(q[:, :, r0:r1], k[:, :, c0:c1], v[:, :, c0:c1], pad_b)
            )
        return jnp.concatenate(outs, axis=2)

    return banded


def flash_masked_attention(
    q,
    k,
    v,
    *,
    scale: float,
    attn_mask: Optional[np.ndarray] = None,
    key_padding_mask=None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    bwd_impl: Optional[str] = None,
    interpret: bool = False,
):
    """Drop-in for dense_masked_attention with a STATIC numpy mask.

    Block shape defaults to the per-mask auto-tuner (``_auto_blocks``,
    a tile-count/padded-area cost model fitted to the v5e full-step
    sweeps — the optimum is mask-dependent: 384x896 for the TCGA mask,
    fatter tiles for CMU); override per-run with ``MCA_FLASH_BLOCK_Q``
    / ``MCA_FLASH_BLOCK_K`` (used by the tuning sweeps).  The backward
    defaults to the single-pass fused kernel; ``MCA_FLASH_BWD=split``
    selects the two-pass variant (kept as a comparison oracle).
    """
    import os

    if attn_mask is None:
        attn_mask = np.zeros((q.shape[2], q.shape[2]), bool)
    attn_mask = np.asarray(attn_mask, bool)
    if block_q is None and "MCA_FLASH_BLOCK_Q" in os.environ:
        block_q = int(os.environ["MCA_FLASH_BLOCK_Q"])
    if block_k is None and "MCA_FLASH_BLOCK_K" in os.environ:
        block_k = int(os.environ["MCA_FLASH_BLOCK_K"])
    if bwd_impl is None:
        bwd_impl = os.environ.get("MCA_FLASH_BWD", "fused")
    # select (default) | add | skip — see _apply_masks for the
    # measured tradeoffs
    mask_mode = os.environ.get("MCA_FLASH_MASK_MODE", "select")
    # base-2 softmax A/B knob (see LOG2E above)
    use_exp2 = os.environ.get("MCA_FLASH_EXP2", "0") == "1"
    # bf16 score/probability tiles A/B knob (see _prob_dt)
    prob_dtype = os.environ.get("MCA_FLASH_PROB_DTYPE", "f32")
    # Mosaic grid-dimension-semantics A/B knob (see _dimsem_params)
    dimsem = os.environ.get("MCA_FLASH_DIMSEM", "0") == "1"
    # fused-bwd dq accumulator placement (see _fused_bwd_kernel):
    # output (RMW on the output block) | scratch (VMEM accumulator,
    # one copy to the output per batch-head) | partial (own output
    # slot per iteration + host-side one-hot segment-sum)
    dq_mode = os.environ.get("MCA_FLASH_DQ", "output")
    # fused-bwd body statement order (see _fused_bwd_kernel):
    # chain | hoist | pair — intra-body MXU/VPU overlap A/B.
    # pair is implemented for the default mask_mode=select only; an
    # A/B combining it with add/skip would silently measure chain and
    # misattribute the result (ADVICE r3) — warn loudly.
    body_order = os.environ.get("MCA_FLASH_BWD_ORDER", "chain")
    if body_order == "pair" and mask_mode != "select":
        import warnings

        warnings.warn(
            "MCA_FLASH_BWD_ORDER=pair is only implemented for "
            f"MCA_FLASH_MASK_MODE=select (got {mask_mode!r}); the "
            "kernel will run the 'chain' body instead",
            stacklevel=2,
        )
    # row-band decomposition (see plan_bands): one launch per row band
    # with band-fitted blocks.  Default ON — measured TCGA 397.3k ->
    # 461.5k tok/s, CMU 379.4k -> 450.9k, zorro 399.4k -> 463.4k on the
    # full train step (PERF.md round 3; the planner declines masks
    # where one kernel is modelled cheaper, so small/unmasked cases
    # fall through unchanged).  Explicit block overrides force the
    # single-kernel path (the sweeps A/B one global shape).
    if (
        os.environ.get("MCA_FLASH_BANDS", "1") == "1"
        and block_q is None
        and block_k is None
    ):
        bands = plan_bands(attn_mask)
        if bands is not None:
            if (
                os.environ.get("MCA_FLASH_TUNE") == "measure"
                and not interpret
                and jax.default_backend() == "tpu"
            ):
                # measure-at-first-use composes with banding: each
                # band rectangle's blocks are measured on-device
                # (disk-cached per band mask) instead of model-picked;
                # the partition itself stays the DP's (measurement-
                # validated, PERF.md round 3 partition sweep)
                bands = [
                    (r0, r1, c0, c1) + _measure_blocks(
                        attn_mask[r0:r1, c0:c1], scale,
                        (q.shape[0], q.shape[1], r1 - r0, q.shape[3]),
                        q.dtype, bwd_impl, mask_mode, use_exp2,
                        prob_dtype, dimsem, dq_mode, body_order,
                    )
                    for (r0, r1, c0, c1, _bq, _bk) in bands
                ]
            bkey = (
                "bands", attn_mask.tobytes(), attn_mask.shape,
                float(scale), tuple(bands), bwd_impl, interpret,
                mask_mode, use_exp2, prob_dtype, dimsem, dq_mode,
                body_order,
            )
            if bkey not in _CACHE:
                _CACHE[bkey] = make_banded_flash_attention(
                    attn_mask, scale=scale, bands=bands,
                    bwd_impl=bwd_impl, interpret=interpret,
                    mask_mode=mask_mode, use_exp2=use_exp2,
                    prob_dtype=prob_dtype, dimsem=dimsem,
                    dq_mode=dq_mode, body_order=body_order,
                )
            return _CACHE[bkey](q, k, v, key_padding_mask)
    if block_q is None or block_k is None:
        if (
            os.environ.get("MCA_FLASH_TUNE") == "measure"
            and not interpret
            and jax.default_backend() == "tpu"
        ):
            # measure-at-first-use: on-device micro-sweep of the cost
            # model's top candidates, disk-cached per mask/shape
            auto_q, auto_k = _measure_blocks(
                attn_mask, scale, q.shape, q.dtype, bwd_impl,
                mask_mode, use_exp2, prob_dtype, dimsem, dq_mode,
                body_order,
            )
        else:
            auto_q, auto_k = _auto_blocks(attn_mask)
        block_q = auto_q if block_q is None else block_q
        block_k = auto_k if block_k is None else block_k
    key = (
        attn_mask.tobytes(),
        attn_mask.shape,
        float(scale),
        block_q,
        block_k,
        bwd_impl,
        interpret,
        mask_mode,
        use_exp2,
        prob_dtype,
        dimsem,
        dq_mode,
        body_order,
    )
    if key not in _CACHE:
        _CACHE[key] = make_flash_attention(
            attn_mask,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            bwd_impl=bwd_impl,
            interpret=interpret,
            mask_mode=mask_mode,
            use_exp2=use_exp2,
            prob_dtype=prob_dtype,
            dimsem=dimsem,
            dq_mode=dq_mode,
            body_order=body_order,
        )
    return _CACHE[key](q, k, v, key_padding_mask)
