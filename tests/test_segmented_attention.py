"""Segment-decomposed attention vs the dense oracle.

analyze_mask must split zorro/MCA masks into modality self-attention
segments + fusion cross rows; the composed op must match dense values
and gradients under padding and missing modalities (flash sub-calls
run in interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu import masks as M
from mca_tpu.ops.attention import dense_masked_attention
from mca_tpu.ops.segmented_attention import (
    analyze_mask,
    segmented_masked_attention,
)

SCALE = 0.125


def test_analyze_mask_mca():
    ms = M.build_masks([96, 64, 96], 70, [3, 2, 1])
    segments, cross = analyze_mask(ms.attn_mask)
    assert segments == [(0, 96), (96, 64), (160, 96)]
    # fusion channels: distinct per-channel rows, all cross, covering
    # exactly the fusion range
    assert sum(l for _, l in cross) == 70
    assert min(s for s, _ in cross) == 256
    assert len(cross) > 1  # per-channel row groups


def test_analyze_mask_zorro():
    ms = M.build_masks([96, 64], 30, [2, 1], zorro=True)
    segments, cross = analyze_mask(ms.attn_mask)
    assert segments == [(0, 96), (96, 64)]
    assert cross == [(160, 30)]  # one fusion stream


def test_analyze_mask_unmasked():
    segments, cross = analyze_mask(np.zeros((64, 64), bool))
    assert segments == [(0, 64)] and cross == []


def _compare(mask, pad, t, rng, atol=2e-5):
    q = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    pad_j = None if pad is None else jnp.asarray(pad)
    dense = dense_masked_attention(
        q, k, v, scale=SCALE,
        attn_mask=None if mask is None else jnp.asarray(mask),
        key_padding_mask=pad_j,
    )
    seg = segmented_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask,
        key_padding_mask=pad_j, interpret=True,
    )
    blocked = np.zeros((2, t, t), bool)
    if mask is not None:
        blocked |= np.asarray(mask)[None]
    if pad is not None:
        blocked |= np.asarray(pad)[:, None, :]
    live = ~blocked.all(axis=2)
    d_np, s_np = np.asarray(dense), np.asarray(seg)
    for b in range(2):
        np.testing.assert_allclose(
            s_np[b, :, live[b]], d_np[b, :, live[b]], atol=atol
        )
    return q, k, v, pad_j


def test_segmented_matches_dense_mca(rng):
    ms = M.build_masks([96, 64, 96], 70, [3, 2, 1])
    pad = np.zeros((2, ms.seq_len), bool)
    pad[0, :96] = True  # modality 0 missing in sample 0
    pad[1, 96 + 20 : 96 + 64] = True
    _compare(ms.attn_mask, pad, ms.seq_len, rng)


def test_segmented_matches_dense_zorro(rng):
    ms = M.build_masks([96, 64], 30, [2, 1], zorro=True)
    _compare(ms.attn_mask, None, ms.seq_len, rng)


def test_segmented_gradients_match_dense(rng):
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))
    pad = np.zeros((2, t), bool)
    pad[0, 96:120] = True
    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w).sum()

    def obj_seg(q, k, v):
        o = segmented_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, interpret=True,
        )
        return (o * w).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(obj_seg, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gs):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_segment_blocks_heuristic():
    from mca_tpu.ops.segmented_attention import _segment_blocks

    assert _segment_blocks(200) == (200, 256)
    assert _segment_blocks(800) == (512, 896)
    bq, bk = _segment_blocks(1500)
    assert bq == 512 and bk % 128 == 0 and bk <= 1024
    assert 2 * bk >= 1500  # two kv tiles cover the segment
