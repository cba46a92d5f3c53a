"""Segment-decomposed attention for the zorro/MCA mask family.

In the reference's masks (ref model.py:392-430) modality-token rows
attend ONLY their own modality's segment — pure within-segment
self-attention — and only the fusion-token rows cross segments.
Softmax is per-row, so partitioning the query rows is EXACT:

- each self-attention segment runs the flash kernel with NO static
  mask at all (every tile live, no [block_q, block_k] int8 mask DMA,
  zero wasted score area beyond 128-lane alignment);
- the cross rows (88 fusion tokens at canonical scale) run one small
  dense masked attention over the full key range.

Visited score area at TCGA scale drops from ~7.9M entries (512x1024
tile quantisation of the monolithic kernel) to ~2.2M (the unmasked
area itself) — the attention flops the analytic MFU model counts as
"useful" become the flops actually executed.

The decomposition is derived from the mask alone (``analyze_mask``),
so it applies to every config family: zorro and MCA fusion-channel
masks decompose; EAO / unmasked attention degenerates to one segment;
masks with no self-attention structure fall back entirely to the
cross path (== dense semantics).

Semantics match ``flash_masked_attention``: fully-masked (padded)
rows inside segments return zeros; cross rows keep dense semantics.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mca_tpu.ops.attention import dense_masked_attention
from mca_tpu.ops.flash_attention import flash_masked_attention


def analyze_mask(
    attn_mask: np.ndarray,
) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]:
    """Partition query rows of a static [T, T] bool mask.

    Returns ``(segments, cross)`` — both lists of ``(start, length)``
    row ranges.  A *segment* is a maximal run of identical rows whose
    unmasked key set is exactly the run itself (within-segment
    self-attention); every other run is *cross* (handled with the full
    key range and its sub-mask).
    """
    mask = np.asarray(attn_mask, bool)
    t = mask.shape[0]
    segments: List[Tuple[int, int]] = []
    cross: List[Tuple[int, int]] = []
    i = 0
    while i < t:
        j = i + 1
        while j < t and np.array_equal(mask[j], mask[i]):
            j += 1
        cols = np.flatnonzero(~mask[i])
        if (
            len(cols) == j - i
            and len(cols) > 0
            and cols[0] == i
            and cols[-1] == j - 1
        ):
            segments.append((i, j - i))
        else:
            cross.append((i, j - i))
        i = j
    return segments, cross


def _segment_blocks(length: int) -> Tuple[int, int]:
    """Block shape for an unmasked self-attention segment: minimise
    padded score area (query rows pad to 8, keys to 128 lanes) while
    keeping kv tiles <= 1024."""
    bq = min(512, -(-length // 8) * 8)
    n_kv = max(1, -(-length // 1024))
    bk = -(-length // n_kv)
    bk = -(-bk // 128) * 128
    return bq, bk


def segmented_masked_attention(
    q,
    k,
    v,
    *,
    scale: float,
    attn_mask: Optional[np.ndarray] = None,
    key_padding_mask=None,
    interpret: bool = False,
):
    """Drop-in for ``flash_masked_attention`` with a STATIC numpy mask,
    decomposed by query-row structure (see module docstring)."""
    t = q.shape[2]
    if attn_mask is None:
        attn_mask = np.zeros((t, t), bool)
    attn_mask = np.asarray(attn_mask, bool)
    segments, cross = analyze_mask(attn_mask)

    pieces = []
    for start, length in segments:
        qs = q[:, :, start : start + length]
        ks = k[:, :, start : start + length]
        vs = v[:, :, start : start + length]
        pad_s = (
            None
            if key_padding_mask is None
            else key_padding_mask[:, start : start + length]
        )
        bq, bk = _segment_blocks(length)
        out = flash_masked_attention(
            qs,
            ks,
            vs,
            scale=scale,
            attn_mask=np.zeros((length, length), bool),
            key_padding_mask=pad_s,
            block_q=bq,
            block_k=bk,
            interpret=interpret,
        )
        pieces.append((start, out))

    for start, length in cross:
        qs = q[:, :, start : start + length]
        sub = jnp.asarray(attn_mask[start : start + length])
        out = dense_masked_attention(
            qs,
            k,
            v,
            scale=scale,
            attn_mask=sub,
            key_padding_mask=key_padding_mask,
        )
        pieces.append((start, out))

    pieces.sort(key=lambda p: p[0])
    assert pieces and pieces[0][0] == 0
    return jnp.concatenate([p[1] for p in pieces], axis=2)
