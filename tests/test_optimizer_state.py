"""bf16 optimizer-moment storage (``moment_dtype: bf16``).

AdamW's mu/nu moments are stored in bf16 and upcast to fp32 for every
update (``train._with_state_dtype``), cutting optimizer-state HBM from
3P to 2P bytes with fp32 params.  The reference trains fp32 AdamW only
(ref train_accel_gpu.py:75-80) — this is a TPU-side memory extension,
default off.  Pins: the fp32-dtype wrapper is bit-identical to the
unwrapped optimizer (plumbing is exact); bf16 moments land as bf16 in
BOTH state modes (tree and flat); a short bf16-moments trajectory
tracks the fp32 one closely and keeps decreasing; checkpoints
round-trip the bf16 dtypes.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.train import (
    _with_state_dtype,
    hf_lr_schedule,
    init_state,
    make_flat_apparatus,
    make_optimizer,
    make_train_step,
)

SEED = 0


def _setup(**over):
    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            batch_size=8,
            precision="fp32",
            attention_impl="dense",
            **over,
        )
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(8, widths=widths, p_missing=0.25, seed=0)
    batch = jax.tree.map(
        jnp.asarray,
        MultimodalCollator(cfg.modality_config.to_plain())(samples),
    )
    return cfg, batch


def _float_dtypes(tree):
    return {
        np.dtype(leaf.dtype)
        for leaf in jax.tree.leaves(tree)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
    }


def test_fp32_wrapper_is_bit_identical():
    """_with_state_dtype(tx, float32) must be a no-op: exact same
    updates and state as the raw transformation over several steps —
    guards the upcast/downcast plumbing itself."""
    sched = hf_lr_schedule("cosine", 1e-3, 2, 20)
    raw = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    wrapped = _with_state_dtype(raw, jnp.float32)
    params = {
        "w": jnp.linspace(-1.0, 1.0, 12).reshape(3, 4),
        "b": jnp.ones((4,)),
    }
    s_raw, s_wr = raw.init(params), wrapped.init(params)
    key = jax.random.key(0)
    p_raw = p_wr = params
    for i in range(4):
        key, sub = jax.random.split(key)
        grads = jax.tree.map(
            lambda x: jax.random.normal(sub, x.shape), params
        )
        u_raw, s_raw = raw.update(grads, s_raw, p_raw)
        u_wr, s_wr = wrapped.update(grads, s_wr, p_wr)
        for a, b in zip(jax.tree.leaves(u_raw), jax.tree.leaves(u_wr)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        p_raw = optax.apply_updates(p_raw, u_raw)
        p_wr = optax.apply_updates(p_wr, u_wr)


def test_bf16_moment_dtype_tree_and_flat_state():
    cfg, batch = _setup(moment_dtype="bf16")
    model = build_model(get_model_config(cfg))
    tx = make_optimizer(cfg, 10)
    state = init_state(model, tx, batch, seed=SEED)
    # every float leaf of the optimizer state is a bf16 moment (clip /
    # schedule / clamp states carry only int counts)
    assert _float_dtypes(state["opt_state"]) == {np.dtype(jnp.bfloat16)}

    flat0, _, ftx = make_flat_apparatus(cfg, 10, state["params"])
    fstate = ftx.init(flat0)
    assert _float_dtypes(fstate) == {np.dtype(jnp.bfloat16)}

    # default stays fp32 on both paths
    cfg32, _ = _setup()
    tx32 = make_optimizer(cfg32, 10)
    s32 = init_state(model, tx32, batch, seed=SEED)
    assert _float_dtypes(s32["opt_state"]) == {np.dtype(np.float32)}


@pytest.mark.slow
def test_bf16_moments_trajectory_tracks_fp32():
    """8 steps with bf16 moments: loss decreases and the final loss is
    within a few % of the fp32-moments trajectory (storage rounding is
    the ONLY difference — update math is fp32 both ways)."""
    losses = {}
    for dtype in ("fp32", "bf16"):
        cfg, batch = _setup(moment_dtype=dtype)
        model = build_model(get_model_config(cfg))
        tx = make_optimizer(cfg, 8)
        sched = hf_lr_schedule(
            cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 8
        )
        state = init_state(model, tx, batch, seed=SEED)
        traj = []
        step = make_train_step(model, tx, sched, dropout_seed=SEED)
        for _ in range(8):
            state, metrics = step(state, batch)
            traj.append(float(metrics["total_loss"]))
        losses[dtype] = traj
    assert losses["bf16"][-1] < losses["bf16"][0]
    np.testing.assert_allclose(
        losses["bf16"][0], losses["fp32"][0], rtol=1e-6
    )  # step 0: moments were zero either way — identical by design
    np.testing.assert_allclose(
        losses["bf16"][-1], losses["fp32"][-1], rtol=0.05
    )


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    from mca_tpu import checkpoint as ckpt

    cfg, batch = _setup(moment_dtype="bf16")
    model = build_model(get_model_config(cfg))
    tx = make_optimizer(cfg, 10)
    state = init_state(model, tx, batch, seed=SEED)
    ckpt.save_state(state, str(tmp_path / "st"))
    restored = ckpt.load_state(str(tmp_path / "st"), target=state)
    assert _float_dtypes(restored["opt_state"]) == {
        np.dtype(jnp.bfloat16)
    }


def test_moment_dtype_rejects_unknown():
    cfg, _ = _setup(moment_dtype="fp8")
    import pytest

    with pytest.raises(ValueError, match="moment_dtype"):
        make_optimizer(cfg, 10)
