"""Flash-attention kernel vs the dense oracle (interpret mode on CPU).

Covers: block-sparse MCA masks, dynamic key padding, fully-masked rows
(flash returns zeros there — the documented deviation; those rows are
compared only where the dense path's value is consumed), non-multiple
sequence lengths, bf16 inputs, and gradients through custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu import masks as M
from mca_tpu.ops.attention import dense_masked_attention
from mca_tpu.ops.flash_attention import flash_masked_attention

SCALE = 0.125


def _rand_qkv(rng, b, h, t, d, dtype=np.float32):
    q = rng.normal(size=(b, h, t, d)).astype(dtype)
    k = rng.normal(size=(b, h, t, d)).astype(dtype)
    v = rng.normal(size=(b, h, t, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _compare(q, k, v, mask, pad, atol=2e-5, block=64):
    dense = dense_masked_attention(
        q, k, v, scale=SCALE,
        attn_mask=jnp.asarray(mask) if mask is not None else None,
        key_padding_mask=jnp.asarray(pad) if pad is not None else None,
    )
    flash = flash_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask,
        key_padding_mask=jnp.asarray(pad) if pad is not None else None,
        block_q=block, block_k=block, interpret=True,
    )
    # rows that are fully masked differ by design (dense: uniform
    # average over everything; flash: zeros) -> compare only live rows
    t = q.shape[2]
    if mask is not None or pad is not None:
        blocked = np.zeros((q.shape[0], t, t), bool)
        if mask is not None:
            blocked |= np.asarray(mask)[None]
        if pad is not None:
            blocked |= np.asarray(pad)[:, None, :]
        live = ~blocked.all(axis=2)  # [B, T]
    else:
        live = np.ones((q.shape[0], t), bool)
    d_np, f_np = np.asarray(dense), np.asarray(flash)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            f_np[b, :, live[b]], d_np[b, :, live[b]], atol=atol
        )
        dead = ~live[b]
        if dead.any():
            assert (f_np[b, :, dead] == 0).all()
    return dense, flash


def test_no_mask_matches_dense(rng):
    q, k, v = _rand_qkv(rng, 2, 2, 128, 64)
    _compare(q, k, v, None, None)


def test_nonmultiple_seq_len(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 100, 64)  # 100 % 64 != 0
    _compare(q, k, v, None, None)


def test_mca_mask_block_sparse(rng):
    ms = M.build_masks([96, 64, 96], 70, [3, 2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    _compare(q, k, v, ms.attn_mask, None)


def test_padding_and_missing_modality(rng):
    ms = M.build_masks([96, 64, 96], 70, [3, 2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, :96] = True  # modality 0 fully missing in sample 0
    pad[1, 96 + 30 : 96 + 64] = True  # partial padding in sample 1
    _compare(q, k, v, ms.attn_mask, pad)


def test_bf16(rng):
    ms = M.build_masks([64, 64], 33, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 1, 2, t, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    _compare(q, k, v, ms.attn_mask, None, atol=3e-2)


@pytest.mark.parametrize("bwd_impl", ["split", "fused"])
def test_gradients_match_dense(rng, bwd_impl):
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:130] = True
    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)

    # scalar objective that only consumes LIVE rows (padded-row outputs
    # are implementation-defined and never consumed by the model)
    blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))  # [B, T]
    w = jnp.asarray(
        rng.normal(size=(2, 2, t, 64)).astype(np.float32)
    )

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, block_q=64, block_k=64,
            bwd_impl=bwd_impl, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("bwd_impl", ["split", "fused"])
def test_prob_dtype_bf16_matches_dense(rng, bwd_impl, monkeypatch):
    """MCA_FLASH_PROB_DTYPE=bf16 (score/probability tiles in bf16, row
    statistics fp32) reproduces dense values and gradients to 8-bit
    score-mantissa fidelity — an A/B perf knob, so the tolerance is
    deliberately looser than the fp32-chain pins."""
    monkeypatch.setenv("MCA_FLASH_PROB_DTYPE", "bf16")
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:130] = True
    _compare(q, k, v, ms.attn_mask, pad, atol=5e-2)

    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)
    blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, block_q=64, block_k=64,
            bwd_impl=bwd_impl, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 scores round the probabilities at ~0.4%: compare with a
        # scale-relative bound, not the fp32 pins
        bound = 5e-2 * max(np.abs(a).max(), 1e-3)
        assert np.abs(b - a).max() <= bound, (
            f"d{name} mismatch (prob bf16): "
            f"{np.abs(b - a).max()} > {bound}"
        )


@pytest.mark.parametrize("bwd_impl", ["split", "fused"])
def test_exp2_mode_matches_dense(rng, bwd_impl, monkeypatch):
    """MCA_FLASH_EXP2=1 (base-2 softmax, log2e folded into the q
    scale, lse stored base-2, dk's absorbed log2e divided out at
    flush) must reproduce dense values AND gradients — the two
    domains are algebraically identical up to rounding."""
    monkeypatch.setenv("MCA_FLASH_EXP2", "1")
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:130] = True
    _compare(q, k, v, ms.attn_mask, pad)

    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)
    blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, block_q=64, block_k=64,
            bwd_impl=bwd_impl, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch (exp2 mode)",
        )


def test_fused_bwd_matches_split_asymmetric(rng):
    """Fused single-pass backward == split two-pass backward, under a
    block-sparse mask, padding, bf16 inputs, and block_q != block_k
    (exercises the dynamic-row-slice dq accumulation)."""
    ms = M.build_masks([96, 64, 96], 70, [3, 2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:140] = True
    pad_j = jnp.asarray(pad)
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj(impl):
        def f(q, k, v):
            o = flash_masked_attention(
                q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
                key_padding_mask=pad_j, block_q=64, block_k=128,
                bwd_impl=impl, interpret=True,
            )
            return (o * w).sum()
        return f

    gs = jax.grad(obj("split"), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj("fused"), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gs, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5,
            err_msg=f"d{name} fused/split mismatch",
        )


def test_tile_schedule_skips_blocked_tiles():
    from mca_tpu.ops.flash_attention import _tile_schedule

    ms = M.build_masks([64, 64, 64], 32, [3, 1])
    q_of, kv_of, full, q2, kv2, full2, nq, nk = _tile_schedule(
        ms.attn_mask, 64, 64
    )
    assert len(q_of) < nq * nk  # sparsity actually exploited
    # q-major sorted; kv-major variant hits the same tile set
    assert sorted(zip(q_of.tolist(), kv_of.tolist())) == sorted(
        zip(q2.tolist(), kv2.tolist())
    )
    # full flags match a direct per-tile check of the mask
    mask = np.asarray(ms.attn_mask, bool)
    for (qi, ki, fl) in zip(q_of, kv_of, full):
        tile = mask[qi * 64 : (qi + 1) * 64, ki * 64 : (ki + 1) * 64]
        assert bool(fl) == (not tile.any())
    assert full.sum() == full2.sum() > 0


def test_asymmetric_blocks_tq_ne_tk(rng):
    """block_q != block_k pads queries and keys to DIFFERENT lengths;
    regression for the kv-padded-to-tq out-of-bounds bug."""
    for t in (12, 100, 130):
        q = jnp.asarray(
            rng.normal(size=(1, 2, t, 64)).astype(np.float32)
        )
        k = jnp.asarray(
            rng.normal(size=(1, 2, t, 64)).astype(np.float32)
        )
        v = jnp.asarray(
            rng.normal(size=(1, 2, t, 64)).astype(np.float32)
        )
        pad = np.zeros((1, t), bool)
        pad[0, :3] = True
        f = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=None,
            key_padding_mask=jnp.asarray(pad),
            block_q=64, block_k=256, interpret=True,
        )
        d = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=None,
            key_padding_mask=jnp.asarray(pad),
        )
        assert not np.isnan(np.asarray(f)).any()
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(d), atol=2e-5
        )


@pytest.mark.parametrize("mode", ["add", "select", "skip"])
def test_mask_modes_match_dense(rng, mode, monkeypatch):
    """All three mask-application variants (additive bf16 / boolean
    select / per-tile cond skip) produce the same attention as the
    dense oracle."""
    monkeypatch.setenv("MCA_FLASH_MASK_MODE", mode)
    ms = M.build_masks([64, 64, 64], 32, [3, 1])
    mask = np.asarray(ms.attn_mask, bool)
    t = mask.shape[0]
    q = jnp.asarray(rng.normal(size=(2, 2, t, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, t, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, t, 32)).astype(np.float32))
    pad = np.zeros((2, t), bool)
    pad[0, 50:64] = True
    out = flash_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask,
        key_padding_mask=jnp.asarray(pad),
        block_q=64, block_k=64, interpret=True,
    )
    ref = dense_masked_attention(
        q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
        key_padding_mask=jnp.asarray(pad),
    )
    live = ~pad[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * live, np.asarray(ref) * live,
        rtol=2e-3, atol=2e-3,
    )


def test_auto_blocks_unpruned_grid():
    """The tuner's candidate grid carries no hand exclusions and the
    model ranks every lane-legal shape; canonical-family picks come
    from the measured-optima table (PERF.md round-3 sweep), so the
    fitted cost constant can't regress them."""
    import zlib

    from mca_tpu.ops.flash_attention import (
        _BLOCK_CANDIDATES,
        _MEASURED_BLOCKS,
        _auto_blocks,
        _model_ranked,
    )

    assert (640, 768) in _BLOCK_CANDIDATES  # previously hand-excluded
    ms = M.build_masks(
        [800, 198, 800, 662], 88, [4, 3, 2], fcl=True
    )
    mask = np.asarray(ms.attn_mask, bool)
    # the canonical TCGA mask hits its measured-table entry
    key = (mask.shape, zlib.crc32(mask.tobytes()))
    assert key in _MEASURED_BLOCKS
    assert _auto_blocks(mask) == (368, 896)  # measured-optimal (r3)
    ranked = _model_ranked(mask)
    # generic grid + length-fitted shapes, ranked together
    assert len(ranked) >= len(_BLOCK_CANDIDATES)
    assert set(_BLOCK_CANDIDATES) <= set(ranked)
    # CMU canonical mask: the measured-optima table wins regardless of
    # what the cost model would rank first (the pre-fitted model's top
    # pick 640x768 measured 3.2% slower than 512x1280, PERF.md round 3)
    cmu = M.build_masks(
        [1500, 450, 450, 50], 88, [4, 3, 2], fcl=True
    )
    cmask = np.asarray(cmu.attn_mask, bool)
    ckey = (cmask.shape, zlib.crc32(cmask.tobytes()))
    assert ckey in _MEASURED_BLOCKS
    assert _auto_blocks(cmask) == (512, 1280)
    # a novel (non-canonical) mask falls through to the model ranking
    novel = M.build_masks([256, 256, 256], 32, [3, 2], fcl=True)
    nmask = np.asarray(novel.attn_mask, bool)
    assert (nmask.shape, zlib.crc32(nmask.tobytes())) not in _MEASURED_BLOCKS
    assert _auto_blocks(nmask) == _model_ranked(nmask)[0]


def test_fitted_candidates_unmasked_lengths():
    """Length-fitted block shapes beat the generic grid on unmasked
    (EAO-style) passes: the top-ranked shape's padded coverage should
    waste little area at lengths the fixed grid pads badly."""
    from mca_tpu.ops.flash_attention import (
        _fitted_candidates,
        _model_ranked,
        _pad_to,
    )

    for t in (1600, 1462, 998):
        fits = _fitted_candidates(t)
        assert fits, t
        for bq, bk in fits:
            assert bq % 8 == 0 and bk % 128 == 0
            assert bq * bk <= 640 * 1024
        bq, bk = _model_ranked(np.zeros((t, t), bool))[0]
        waste = (_pad_to(t, bq) * _pad_to(t, bk)) / (t * t) - 1.0
        # generic picks pad T=1600 by up to 64% of visited area; the
        # fitted winners stay under 12%
        assert waste < 0.12, (t, bq, bk, waste)


def test_fitted_block_shape_kernel_correct(rng):
    """Kernel values + grads stay exact at a fitted odd block shape
    (bq not a multiple of 64, single wide kv tile)."""
    t = 412  # fitted: bq=208 covers in 2 tiles (416), bk=512 in 1
    q, k, v = _rand_qkv(rng, 1, 2, t, 64)
    _compare(q, k, v, None, None, block=None)  # block ignored below

    pad = np.zeros((1, t), bool)
    pad[0, 380:] = True
    pad_j = jnp.asarray(pad)
    w = jnp.asarray(rng.normal(size=(1, 2, t, 64)).astype(np.float32))
    live = jnp.asarray(~pad[:, :])  # no static mask: live = unpadded

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, key_padding_mask=pad_j
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, key_padding_mask=pad_j,
            block_q=208, block_k=512, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


# ---------------------------------------------------------------------------
# Row-band decomposition (MCA_FLASH_BANDS)
# ---------------------------------------------------------------------------


def _band_setup(rng):
    ms = M.build_masks([20, 7, 16, 12], 11, [4, 3, 2])
    mask = np.asarray(ms.attn_mask)
    t = mask.shape[0]
    q, k, v = _rand_qkv(rng, 2, 3, t, 16)
    pad = np.zeros((2, t), bool)
    pad[1, 15:20] = True
    pad[0, 30:35] = True
    return mask, q, k, v, jnp.asarray(pad)


def _live_weight(rng, mask, pad, shape):
    blocked = mask[None] | np.asarray(pad)[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return w * live[:, None, :, None]


def test_banded_matches_dense(rng):
    """Manual row bands (modalities + fusion, overlapping column
    supports) reproduce dense values AND grads — including the dk/dv
    accumulation across bands through the slice transposes."""
    from mca_tpu.ops import flash_attention as F

    mask, q, k, v, pad = _band_setup(rng)
    t = mask.shape[0]
    edges = [0, 20, 27, 43, 55, t]
    bands = []
    for r0, r1 in zip(edges[:-1], edges[1:]):
        c0, c1 = F._band_rect(mask, r0, r1)
        bands.append((r0, r1, c0, c1, 8, 128))
    fn = F.make_banded_flash_attention(
        mask, scale=SCALE, bands=bands, interpret=True
    )
    dense = dense_masked_attention(
        q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
        key_padding_mask=pad,
    )
    out = fn(q, k, v, pad)
    blocked = mask[None] | np.asarray(pad)[:, None, :]
    live = ~blocked.all(axis=2)
    d_np, f_np = np.asarray(dense), np.asarray(out)
    for b in range(2):
        np.testing.assert_allclose(
            f_np[b, :, live[b]], d_np[b, :, live[b]], atol=2e-5
        )

    w = _live_weight(rng, mask, pad, q.shape)

    def obj(f):
        return lambda q, k, v: (f(q, k, v) * w).sum()

    gd = jax.grad(
        obj(lambda q, k, v: dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
            key_padding_mask=pad,
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    gf = jax.grad(
        obj(lambda q, k, v: fn(q, k, v, pad)), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_banded_env_knob_end_to_end(rng, monkeypatch):
    """MCA_FLASH_BANDS=1 routes flash_masked_attention through the
    planner and matches dense.  The cost model correctly refuses to
    band a 66-token mask (the bk >= 128 lane floor dominates), so the
    planner is stubbed with a fixed partition — real-scale planner
    output is pinned by test_plan_bands_canonical_tcga."""
    from mca_tpu.ops import flash_attention as F

    mask, q, k, v, pad = _band_setup(rng)
    t = mask.shape[0]
    edges = [0, 20, 27, 43, 55, t]
    bands = [
        (r0, r1, *F._band_rect(mask, r0, r1), 8, 128)
        for r0, r1 in zip(edges[:-1], edges[1:])
    ]
    monkeypatch.setattr(F, "plan_bands", lambda m: bands)
    monkeypatch.setenv("MCA_FLASH_BANDS", "1")
    # contiguous cover of [0, T)
    assert bands[0][0] == 0 and bands[-1][1] == mask.shape[0]
    for a, b in zip(bands[:-1], bands[1:]):
        assert a[1] == b[0]

    out = flash_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask,
        key_padding_mask=pad, interpret=True,
    )
    dense = dense_masked_attention(
        q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
        key_padding_mask=pad,
    )
    blocked = mask[None] | np.asarray(pad)[:, None, :]
    live = ~blocked.all(axis=2)
    d_np, f_np = np.asarray(dense), np.asarray(out)
    for b in range(2):
        np.testing.assert_allclose(
            f_np[b, :, live[b]], d_np[b, :, live[b]], atol=2e-5
        )
    F._BAND_CACHE.clear()


def test_plan_bands_canonical_tcga():
    """At the real TCGA scale the planner returns >= 2 bands whose
    visited tile area beats the global auto-block schedule's."""
    from mca_tpu.ops import flash_attention as F

    ms = M.build_masks([800, 198, 800, 662], 88, [4, 3, 2])
    mask = np.asarray(ms.attn_mask)
    bands = F.plan_bands(mask)
    assert bands is not None and len(bands) >= 2
    assert bands[0][0] == 0 and bands[-1][1] == mask.shape[0]
    banded_area = 0
    for (r0, r1, c0, c1, bq, bk) in bands:
        q_of, *_ = F._tile_schedule(mask[r0:r1, c0:c1], bq, bk)
        banded_area += len(q_of) * bq * bk
        # every band column range contains the band's unmasked columns
        sub = mask[r0:r1]
        cols = np.nonzero(~sub.all(axis=0))[0]
        assert c0 <= cols.min() and cols.max() < c1
    gq, gk = F._auto_blocks(mask)
    q_of, *_ = F._tile_schedule(mask, gq, gk)
    global_area = len(q_of) * gq * gk
    assert banded_area < 0.75 * global_area, (banded_area, global_area)


def test_tile_schedule_covers_every_block():
    """Uncovered q/kv blocks get a synthetic fully-masked tile so every
    output block is written (rectangular band slices can have them)."""
    from mca_tpu.ops.flash_attention import _tile_schedule

    # 3 q-blocks x 4 kv-blocks of 8x128; only tile (1, 1) is naturally
    # active; q rows 0-7 and 16-23 and kv cols outside 128-255 are
    # fully masked
    mask = np.ones((24, 512), bool)
    mask[8:16, 128:256] = False
    qs, ks, fl, qs2, ks2, fl2, nq, nk = _tile_schedule(mask, 8, 128)
    assert set(qs.tolist()) == {0, 1, 2}
    assert set(ks.tolist()) == {0, 1, 2, 3}
    # synthetic tiles are never marked full
    for q_, k_, f_ in zip(qs, ks, fl):
        if (q_, k_) != (1, 1):
            assert f_ == 0
    # kv-major order is a permutation of the same tile set
    assert sorted(zip(qs.tolist(), ks.tolist())) == sorted(
        zip(qs2.tolist(), ks2.tolist())
    )


def test_banded_under_sharded_batch(rng, monkeypatch):
    """Banded kernels under jit over a batch sharded on the 'data'
    mesh axis equal the unsharded result — each band carries its own
    batch/head custom_partitioning wrap, so the composition must stay
    shard-local per band."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from mca_tpu.ops import flash_attention as F

    mask, q, k, v, pad = _band_setup(rng)
    t = mask.shape[0]
    edges = [0, 20, 27, 43, 55, t]
    bands = [
        (r0, r1, *F._band_rect(mask, r0, r1), 8, 128)
        for r0, r1 in zip(edges[:-1], edges[1:])
    ]
    monkeypatch.setattr(F, "plan_bands", lambda m: bands)
    monkeypatch.setenv("MCA_FLASH_BANDS", "1")
    # batch 8 so it splits over 8 devices (q from _band_setup is B=2)
    q, k, v = _rand_qkv(rng, 8, 3, t, 16)
    pad8 = np.zeros((8, t), bool)
    pad8[1, 15:20] = True
    pad8 = jnp.asarray(pad8)
    w = jnp.asarray(
        rng.normal(size=(8, 3, t, 16)).astype(np.float32)
    )
    blocked = mask[None] | np.asarray(pad8)[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))

    def obj(q, k, v, pad_):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask,
            key_padding_mask=pad_, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    g = jax.grad(obj, argnums=(0, 1, 2))
    ref = g(q, k, v, pad8)

    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    sh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(q, sh)
    ks = jax.device_put(k, sh)
    vs = jax.device_put(v, sh)
    ps = jax.device_put(pad8, sh)
    out = jax.jit(g)(qs, ks, vs, ps)
    for name, a, b in zip("qkv", ref, out):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=f"d{name} mismatch under sharded batch",
        )


def test_band_edges_override(rng, monkeypatch):
    """MCA_FLASH_BAND_EDGES forces an explicit row partition (block
    choice still model-fitted) and the result still matches dense."""
    from mca_tpu.ops import flash_attention as F

    mask, q, k, v, pad = _band_setup(rng)
    t = mask.shape[0]
    monkeypatch.setenv("MCA_FLASH_BANDS", "1")
    monkeypatch.setenv("MCA_FLASH_BAND_EDGES", "27,55")
    bands = F.plan_bands(mask)
    assert [(b[0], b[1]) for b in bands] == [(0, 27), (27, 55), (55, t)]
    out = flash_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask,
        key_padding_mask=pad, interpret=True,
    )
    dense = dense_masked_attention(
        q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
        key_padding_mask=pad,
    )
    blocked = mask[None] | np.asarray(pad)[:, None, :]
    live = ~blocked.all(axis=2)
    d_np, f_np = np.asarray(dense), np.asarray(out)
    for b in range(2):
        np.testing.assert_allclose(
            f_np[b, :, live[b]], d_np[b, :, live[b]], atol=2e-5
        )


def test_measure_mode_composes_with_bands(rng, monkeypatch):
    """MCA_FLASH_TUNE=measure measures blocks PER BAND (the partition
    stays the DP's): the wiring calls the tuner once per band with the
    band's rectangular sub-mask, and the composition matches dense."""
    from mca_tpu.ops import flash_attention as F

    mask, q, k, v, pad = _band_setup(rng)
    monkeypatch.setenv("MCA_FLASH_BANDS", "1")
    monkeypatch.setenv("MCA_FLASH_BAND_EDGES", "27,55")
    monkeypatch.setenv("MCA_FLASH_TUNE", "measure")
    # the TPU-only guard keys off the default backend; fake it and
    # intercept the tuner (the real one never runs on CPU)
    monkeypatch.setattr(
        jax, "default_backend", lambda: "tpu", raising=True
    )
    calls = []

    def fake_measure(sub_mask, scale, qshape, *a, **kw):
        calls.append((sub_mask.shape, qshape[2]))
        return 8, 128

    monkeypatch.setattr(F, "_measure_blocks", fake_measure)
    # the guard requires interpret=False (measuring in interpret mode
    # is meaningless in production); force interpret at kernel-build
    # level instead so the composition still runs on CPU
    orig_make = F.make_flash_attention
    monkeypatch.setattr(
        F,
        "make_flash_attention",
        lambda *a, **kw: orig_make(*a, **{**kw, "interpret": True}),
    )
    F._CACHE.clear()
    out = flash_masked_attention(
        q, k, v, scale=SCALE, attn_mask=mask, key_padding_mask=pad,
    )
    F._CACHE.clear()
    t = mask.shape[0]
    assert [c[1] for c in calls] == [27, 28, t - 55]
    for (shape, tq) in calls:
        assert shape[0] == tq  # rectangular sub-mask rows == q rows
    dense = dense_masked_attention(
        q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
        key_padding_mask=pad,
    )
    blocked = mask[None] | np.asarray(pad)[:, None, :]
    live = ~blocked.all(axis=2)
    d_np, f_np = np.asarray(dense), np.asarray(out)
    for b in range(2):
        np.testing.assert_allclose(
            f_np[b, :, live[b]], d_np[b, :, live[b]], atol=2e-5
        )


def test_measure_blocks_rectangular(rng, tmp_path, monkeypatch):
    """_measure_blocks runs on a rectangular (band) mask: kv tensors
    take the mask's column count, q the caller's row count."""
    from mca_tpu.ops import flash_attention as F

    monkeypatch.setenv(
        "MCA_FLASH_TUNE_CACHE", str(tmp_path / "tune.json")
    )
    # Pallas only lowers on TPU; force interpret for the CPU test
    orig_make = F.make_flash_attention
    monkeypatch.setattr(
        F,
        "make_flash_attention",
        lambda *a, **kw: orig_make(*a, **{**kw, "interpret": True}),
    )
    mask = np.zeros((16, 256), bool)
    mask[:, 200:] = True
    bq, bk = F._measure_blocks(
        mask, 0.25, (1, 2, 16, 8), jnp.float32, "fused"
    )
    assert bq >= 8 and bk >= 128
    # second call resolves from the disk cache (no re-measure)
    import json

    cached = json.load(open(tmp_path / "tune.json"))
    assert len(cached) == 1
    assert F._measure_blocks(
        mask, 0.25, (1, 2, 16, 8), jnp.float32, "fused"
    ) == (bq, bk)


@pytest.mark.parametrize("dq_mode", ["scratch", "partial"])
def test_dq_mode_matches_dense(rng, monkeypatch, dq_mode):
    """MCA_FLASH_DQ=scratch (fused-bwd dq accumulates in VMEM scratch,
    one output copy per batch-head) and =partial (every grid iteration
    writes its own output slot; one-hot segment-sum outside the
    kernel) produce the same values and gradients as the dense
    oracle — A/B arms for the roofline finding that the dq
    read-modify-write hazard serializes the backward's pipeline
    (PERF.md round 3)."""
    monkeypatch.setenv("MCA_FLASH_DQ", dq_mode)
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:130] = True
    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)
    blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, block_q=64, block_k=64,
            bwd_impl="fused", interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch (dq_mode={dq_mode})",
        )


@pytest.mark.parametrize("body_order", ["hoist", "pair"])
def test_bwd_body_order_matches_dense(rng, monkeypatch, body_order):
    """MCA_FLASH_BWD_ORDER=hoist (dp dot issued before the exp sweep)
    and =pair (two interleaved half-width chains) — intra-body
    MXU/VPU overlap A/B arms — produce the same values and gradients
    as the dense oracle (pair reorders only the dq contraction's
    accumulation)."""
    monkeypatch.setenv("MCA_FLASH_BWD_ORDER", body_order)
    ms = M.build_masks([96, 64], 66, [2, 1])
    t = ms.seq_len
    q, k, v = _rand_qkv(rng, 2, 2, t, 64)
    pad = np.zeros((2, t), bool)
    pad[0, 96:130] = True
    pad_j = jnp.asarray(pad)
    mask_j = jnp.asarray(ms.attn_mask)
    blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=(2, 2, t, 64)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask_j,
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
            key_padding_mask=pad_j, block_q=64, block_k=64,
            bwd_impl="fused", interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch (body_order={body_order})",
        )


@pytest.mark.parametrize(
    "dq_mode,body_order",
    [("scratch", "chain"), ("partial", "chain"), ("output", "pair")],
)
def test_dq_mode_banded(rng, monkeypatch, dq_mode, body_order):
    """Non-default dq modes / body orders compose with the row-band
    decomposition: the banded kernel's gradients still match the dense
    oracle."""
    import mca_tpu.ops.flash_attention as F

    monkeypatch.setenv("MCA_FLASH_DQ", dq_mode)
    monkeypatch.setenv("MCA_FLASH_BWD_ORDER", body_order)
    monkeypatch.setenv("MCA_FLASH_BANDS", "1")
    ms = M.build_masks([24, 31], 27, [2, 1])
    mask = np.asarray(ms.attn_mask, bool)
    t = mask.shape[0]
    bands = F._bands_from_edges(mask, [24, 55])
    assert bands is not None and len(bands) == 3
    monkeypatch.setattr(F, "plan_bands", lambda m: bands)
    q, k, v = _rand_qkv(rng, 2, 2, t, 32)
    pad = np.zeros((2, t), bool)
    pad[1, 40:55] = True
    pad_j = jnp.asarray(pad)
    blocked = mask[None] | pad[:, None, :]
    live = jnp.asarray(~blocked.all(axis=2))
    w = jnp.asarray(rng.normal(size=(2, 2, t, 32)).astype(np.float32))

    def obj_dense(q, k, v):
        o = dense_masked_attention(
            q, k, v, scale=SCALE, attn_mask=jnp.asarray(mask),
            key_padding_mask=pad_j,
        )
        return (o * w * live[:, None, :, None]).sum()

    def obj_flash(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask,
            key_padding_mask=pad_j, interpret=True,
        )
        return (o * w * live[:, None, :, None]).sum()

    gd = jax.grad(obj_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(obj_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gd, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"d{name} mismatch (banded dq_mode={dq_mode})",
        )
