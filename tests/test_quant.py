"""Int8 serving quantization (mca_tpu.ops.quant): weight round-trip
bounds, the s8xs8->s32 dot against the float oracle, end-to-end
quantized-vs-fp32 embedding similarity, and the serve-path wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.ops.quant import (
    QUANT_DENSE_NAMES,
    int8_dot,
    quantize_params,
    quantize_weight,
)


def _setup(batch_size=8, **overrides):
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=batch_size, **overrides)
    )
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    return cfg, model, jax.tree.map(jnp.asarray, batch)


def test_quantize_weight_bounds():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32) * 0.3
    q, s = quantize_weight(w)
    assert q.dtype == np.int8 and s.shape == (48,)
    # symmetric rounding: per-entry error bounded by half a step
    err = np.abs(w - q.astype(np.float32) * s)
    assert (err <= s / 2 + 1e-7).all()


def test_int8_dot_matches_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 96, 64)).astype(np.float32))
    w = rng.normal(size=(64, 80)).astype(np.float32) * 0.2
    q, s = quantize_weight(w)
    y = int8_dot(x, jnp.asarray(q), jnp.asarray(s))
    ref = x @ w
    # int8 weights + dynamic int8 activations: ~1% relative error on
    # gaussian data
    err = np.abs(np.asarray(y - ref))
    assert err.max() <= 0.03 * np.abs(np.asarray(ref)).max()


def test_quantize_params_structure():
    cfg, model, batch = _setup()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    qparams = quantize_params(params)
    layers = qparams["params"]["layer_0"]
    for name in ("to_q", "to_kv", "to_out"):
        sub = layers["attn"][name]
        assert set(sub) == {"kernel_q", "scale"}
        assert sub["kernel_q"].dtype == jnp.int8
    for name in ("w_in", "w_out"):
        assert set(layers["ff"][name]) == {"kernel_q", "scale"}
    # the attentive pool stays float (its Attention is quant='none')
    pool = qparams["params"]["attn_pool"]
    for name in ("to_q", "to_kv", "to_out"):
        assert set(pool[name]) == {"kernel"}
    assert set(QUANT_DENSE_NAMES) == {
        "to_q", "to_kv", "to_out", "w_in", "w_out"
    }


def test_quantized_embeddings_close():
    """The quantized model reproduces the fp32 embeddings to int8
    fidelity: cosine similarity per sample per output key."""
    cfg, model, batch = _setup()
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out_fp = jax.jit(
        lambda p, b: model.apply(p, b, no_loss=True)
    )(params, batch)

    qmodel = build_model(dict(get_model_config(cfg), quant="int8"))
    qparams = quantize_params(params)
    out_q = jax.jit(
        lambda p, b: qmodel.apply(p, b, no_loss=True)
    )(qparams, batch)

    assert set(out_q) == set(out_fp)
    for k in out_fp:
        if k == "modality_sample_mask":
            for m in out_fp[k]:
                np.testing.assert_array_equal(
                    np.asarray(out_q[k][m]), np.asarray(out_fp[k][m])
                )
            continue
        a = np.asarray(out_fp[k], np.float64)
        b = np.asarray(out_q[k], np.float64)
        na = np.linalg.norm(a, axis=-1)
        nb = np.linalg.norm(b, axis=-1)
        live = na > 1e-6
        cos = (a * b).sum(-1)[live] / (na[live] * nb[live])
        assert cos.min() > 0.98, (k, cos.min())


def test_serve_quantized_matches_fp_service():
    from mca_tpu.serve import EmbeddingService

    cfg, model, batch = _setup(batch_size=2)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    rows = make_tcga_like(2, widths=widths, p_missing=0.25, seed=3)

    svc_fp = EmbeddingService(
        cfg, params=params, max_batch=2, warmup=False
    )
    svc_q = EmbeddingService(
        cfg, params=params, max_batch=2, warmup=False, quantize="int8"
    )
    out_fp = svc_fp.embed(rows)
    out_q = svc_q.embed(rows)
    assert all(
        np.array_equal(out_fp["present"][k], out_q["present"][k])
        for k in out_fp["present"]
    )
    for k, a in out_fp["embeddings"].items():
        b = out_q["embeddings"][k]
        na = np.linalg.norm(a, axis=-1)
        live = na > 1e-6
        cos = (a * b).sum(-1)[live] / (
            na[live] * np.linalg.norm(b, axis=-1)[live]
        )
        if cos.size:
            assert cos.min() > 0.98, (k, cos.min())
