"""Direct unit tests for every registry encoder (shapes + mask
semantics; numeric parity is covered by the transplant tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.encoders import (
    ContinuousValueEncoder,
    EmbeddedSequenceEncoder,
    PatchEncoder,
    PositionalEncoder,
    SequenceEncoder,
    SparseTabularEncoder,
    TabularEncoder,
    TokenEncoder,
    build_encoder,
    encoders_dict,
)


def _init_apply(module, batch, **kw):
    params = module.init(jax.random.key(0), batch, **kw)
    return module.apply(params, batch, **kw)


def test_token_encoder_max_norm_and_padding(rng):
    enc = TokenEncoder(num_embeddings=8, embedding_dim=16, padding_idx=0)
    x = jnp.asarray([[0, 1, 2], [3, 0, 7]])
    params = enc.init(jax.random.key(0), x)
    # scale one row far above max_norm and check it is renormalised
    table = np.asarray(params["params"]["embedding"]).copy()
    table[2] *= 100.0
    params = {"params": {"embedding": jnp.asarray(table)}}
    out = enc.apply(params, x)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert norms[0, 2] == pytest.approx(1.0, rel=1e-5)
    # padding_idx rows are zero
    assert (np.asarray(out)[0, 0] == 0).all()
    assert (np.asarray(out)[1, 1] == 0).all()


def test_continuous_value_encoder_clamp_and_padding(rng):
    enc = ContinuousValueEncoder(
        d_model=8, max_value=10.0, padding_value=-1.0
    )
    x = jnp.asarray([[0.5, 100.0, -1.0]])
    out = _init_apply(enc, x)
    assert out.shape == (1, 3, 8)
    assert (np.asarray(out)[0, 2] == 0).all()  # padding zeroed
    # clamped: value 100 encodes identically to value 10
    out2 = _init_apply(enc, jnp.asarray([[0.5, 10.0, -1.0]]))
    np.testing.assert_allclose(
        np.asarray(out)[0, 1], np.asarray(out2)[0, 1], atol=1e-6
    )


def test_positional_encoder_table():
    pe = PositionalEncoder(d_model=8, max_len=16)
    params = pe.init(jax.random.key(0), 5)
    out = np.asarray(pe.apply(params, 5))
    assert out.shape == (1, 5, 8)
    np.testing.assert_allclose(out[0, 0, 0], 0.0)  # sin(0)
    np.testing.assert_allclose(out[0, 0, 1], 1.0)  # cos(0)


def test_positional_encoder_per_sample_dropout():
    """Train-mode PE dropout draws an independent mask per sample,
    matching the reference's dropout(pe.repeat(B, 1, 1))
    (ref encoders.py:142)."""
    pe = PositionalEncoder(d_model=32, max_len=16, dropout=0.5)
    params = pe.init(jax.random.key(0), 8)
    out = np.asarray(
        pe.apply(
            params, 8, False, 4,
            rngs={"dropout": jax.random.key(1)},
        )
    )
    assert out.shape == (4, 8, 32)
    assert not np.array_equal(out[0], out[1])  # per-sample masks
    # eval mode: deterministic, batch-identical
    det = np.asarray(pe.apply(params, 8, True, 4))
    np.testing.assert_array_equal(det[0], det[1])


def test_sequence_encoder(rng):
    enc = SequenceEncoder(
        num_embeddings=12, embedding_dim=8, max_tokens=6
    )
    batch = {
        "tokens": jnp.asarray([[1, 2, 0, 0], [3, 4, 5, 0]]),
        "attention_mask": jnp.asarray(
            [[0, 0, 1, 1], [0, 0, 0, 1]]
        ),
    }
    tokens, mask = _init_apply(enc, batch)
    assert tokens.shape == (2, 4, 8)
    np.testing.assert_array_equal(
        np.asarray(mask), batch["attention_mask"]
    )


def test_sparse_tabular_encoder(rng):
    enc = SparseTabularEncoder(num_embeddings=20, embedding_dim=8)
    batch = {
        "indices": jnp.asarray([[3, 7, 0], [1, 0, 0]]),
        "data": jnp.asarray([[0.5, 1.5, 0.0], [2.0, 0.0, 0.0]]),
        "attention_mask": jnp.asarray([[0, 0, 1], [0, 1, 1]]),
    }
    tokens, mask = _init_apply(enc, batch)
    assert tokens.shape == (2, 3, 8)


@pytest.mark.parametrize(
    "mode,shape,patch,ntok",
    [
        ("matrix", (2, 8, 6), (2, 3), 8),  # (8/2)*(6/3)
        ("image", (2, 3, 8, 8), (4, 4), 4),
        ("video", (2, 3, 4, 8, 8), (2, 4, 4), 8),
    ],
)
def test_patch_encoder_modes(rng, mode, shape, patch, ntok):
    enc = PatchEncoder(
        patch_size=patch,
        mode=mode,
        num_channels=3 if mode != "matrix" else 0,
        embedding_dim=8,
        max_tokens=ntok,
        dropout=0.0,
    )
    values = rng.normal(size=shape).astype(np.float32)
    tokens, mask = _init_apply(enc, {"values": jnp.asarray(values)})
    assert tokens.shape == (2, ntok, 8)
    assert mask.shape == (2, ntok)
    assert not np.asarray(mask).any()  # nothing padded


def test_patch_encoder_pad_mask(rng):
    enc = PatchEncoder(
        patch_size=(2, 3),
        mode="matrix",
        embedding_dim=8,
        max_tokens=8,
        dropout=0.0,
    )
    values = rng.normal(size=(1, 8, 6)).astype(np.float32)
    values[0, 4:] = -10000.0  # bottom half fully padded
    _, mask = _init_apply(enc, {"values": jnp.asarray(values)})
    assert np.asarray(mask[0]).sum() == 4  # 4 of 8 patches padded


def test_build_encoder_registry():
    for etype in encoders_dict:
        cfg = {"type": etype, "max_tokens": 8}
        if etype == "TabularEncoder":
            cfg["num_embeddings"] = 8
        if etype == "EmbeddedSequenceEncoder":
            cfg["input_size"] = 4
        if etype == "PatchEncoder":
            cfg["patch_size"] = (2, 2)
        enc = build_encoder("x", cfg, embedding_dim=8)
        assert enc.name == "x"
