"""On-device eval-epoch metrics (single host sync per epoch).

The reference's eval loop accumulates embeddings on the host and
computes Wang & Isola uniformity/alignment at epoch end
(ref train_accel_gpu.py:137-184 via torchmetrics concat-accumulators).
Round 1 mirrored that: per-chunk ``device_get`` host syncs, ~ms each on
remote-attached chips (PERF.md).  Here the whole epoch's embeddings
stay on device; ONE jit call reduces them to the metric scalars and a
single ``device_get`` fetches scalars + per-step losses.

Numerics match :mod:`mca_tpu.metrics` (pinned by test): uniformity is
``log(mean(exp(-t * ||xi-xj||^2)))`` over distinct pairs of the masked
rows, alignment is ``mean(||x-y||^alpha)`` over masked rows, each in a
raw and an L2-normalised variant.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x):
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def masked_uniformity(x, mask, t: float = 2.0, norm: bool = False):
    """log mean_{i<j, both masked} exp(-t ||xi - xj||^2).

    Pairwise over the full [N, D] with pair weights; the squared
    distances come from the Gram identity
    ``||xi - xj||^2 = ||xi||^2 + ||xj||^2 - 2 <xi, xj>`` — one [N, D]
    x [D, N] matmul on the MXU instead of an elementwise [N, N, D]
    broadcast on the VPU.
    """
    x = _l2norm(x) if norm else x
    m = mask.astype(x.dtype)
    sqn = jnp.sum(jnp.square(x), axis=-1)
    gram = jnp.einsum(
        "id,jd->ij", x, x, preferred_element_type=jnp.float32
    )
    sq = jnp.maximum(sqn[:, None] + sqn[None, :] - 2.0 * gram, 0.0)
    w = m[:, None] * m[None, :]
    w = w * (1.0 - jnp.eye(x.shape[0], dtype=x.dtype))
    # symmetric: mean over i!=j equals mean over i<j
    denom = jnp.maximum(w.sum(), 1.0)
    return jnp.log(jnp.maximum((w * jnp.exp(-t * sq)).sum() / denom, 1e-38))


def masked_alignment(x, y, mask, alpha: float = 2.0, norm: bool = False):
    """mean_{masked} ||xi - yi||^alpha."""
    x = _l2norm(x) if norm else x
    y = _l2norm(y) if norm else y
    m = mask.astype(x.dtype)
    d = jnp.power(
        jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x - y), -1), 1e-24)),
        alpha,
    )
    return (d * m).sum() / jnp.maximum(m.sum(), 1.0)


def _normalize_chunk(e, m, lo, lv):
    """Accept single-step ([E,B,D], [M,B], [], [L]) or scanned
    ([K,E,B,D], [K,M,B], [K], [K,L]) chunks."""
    if e.ndim == 3:
        e, m, lo, lv = e[None], m[None], lo[None], lv[None]
    return e, m, lo, lv


@partial(
    jax.jit,
    static_argnames=("emb_names", "mask_names", "fusion", "t", "alpha"),
)
def epoch_metrics(
    emb_chunks: Tuple,
    msk_chunks: Tuple,
    loss_chunks: Tuple,
    lv_chunks: Tuple,
    *,
    emb_names: Tuple[str, ...],
    mask_names: Tuple[str, ...],
    fusion: bool,
    t: float = 2.0,
    alpha: float = 2.0,
):
    """Reduce a whole eval epoch's packed outputs to metric scalars.

    Returns (losses [T], pair_losses [T, L], unif {key: {norm: scalar}},
    align {key: {norm: scalar}}, counts {key: n_present}).
    """
    chunks = [
        _normalize_chunk(e, m, lo, lv)
        for e, m, lo, lv in zip(
            emb_chunks, msk_chunks, loss_chunks, lv_chunks
        )
    ]
    emb = jnp.concatenate([c[0] for c in chunks], axis=0)  # [T,E,B,D]
    msk = jnp.concatenate([c[1] for c in chunks], axis=0)  # [T,M,B]
    losses = jnp.concatenate([c[2] for c in chunks], axis=0)  # [T]
    lvs = jnp.concatenate([c[3] for c in chunks], axis=0)  # [T,L]

    T, E, B, D = emb.shape
    flat = jnp.transpose(emb, (1, 0, 2, 3)).reshape(E, T * B, D)
    flat = flat.astype(jnp.float32)
    mflat = jnp.transpose(msk, (1, 0, 2)).reshape(len(mask_names), T * B)
    by_emb = dict(zip(emb_names, flat))
    by_msk = dict(zip(mask_names, mflat.astype(bool)))

    unif, align, counts = {}, {}, {}
    ones = jnp.ones((T * B,), bool)
    unif_keys = list(mask_names) + (["fusion"] if fusion else [])
    for k in unif_keys:
        m = ones if k == "fusion" else by_msk[k]
        counts[k] = m.sum()
        unif[k] = {
            "raw": masked_uniformity(by_emb[k], m, t, norm=False),
            "norm": masked_uniformity(by_emb[k], m, t, norm=True),
        }
    if fusion:
        for k in mask_names:
            m = by_msk[k]
            align[k] = {
                "raw": masked_alignment(
                    by_emb[k], by_emb["fusion"], m, alpha, norm=False
                ),
                "norm": masked_alignment(
                    by_emb[k], by_emb["fusion"], m, alpha, norm=True
                ),
            }
    return losses, lvs, unif, align, counts
