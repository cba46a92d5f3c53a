"""Training-time dropout semantics (VERDICT r1 item 5).

The reference trains in ``model.train()`` mode, so configured encoder
dropout is live during training (ref encoders.py:123-142 PositionalEncoder,
:266-271 PatchEncoder) and off during eval.  Our train step must match:
stochastic outputs under ``deterministic=False`` with per-step RNGs,
bit-identical outputs under ``deterministic=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_cmu_like, tiny_config
from mca_tpu.models import build_model


@pytest.fixture(scope="module")
def dropout_setup():
    cfg_dict = tiny_config("cmu", batch_size=4)
    for enc in cfg_dict["encoder_configs"].values():
        enc["dropout"] = 0.5
    cfg = training_config_from_dict(cfg_dict)
    model = build_model(get_model_config(cfg))
    shapes = {
        m: (e["input_size"], e["max_tokens"])
        for m, e in cfg_dict["encoder_configs"].items()
    }
    samples = make_cmu_like(4, shapes=shapes, seed=0)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    return cfg, model, params, batch


def test_train_mode_is_stochastic(dropout_setup):
    _, model, params, batch = dropout_setup
    loss = lambda rng: float(
        model.apply(
            params, batch, deterministic=False, rngs={"dropout": rng}
        )["loss"]
    )
    a = loss(jax.random.key(1))
    b = loss(jax.random.key(2))
    assert np.isfinite(a) and np.isfinite(b)
    assert a != b, "dropout-enabled train forward is not stochastic"


def test_eval_mode_is_deterministic(dropout_setup):
    _, model, params, batch = dropout_setup
    a = model.apply(params, batch)["loss"]
    b = model.apply(params, batch)["loss"]
    assert float(a) == float(b)


@pytest.mark.slow
def test_train_step_threads_dropout_rng(dropout_setup):
    """make_train_step must run a dropout-enabled config, and repeat
    steps must differ via the per-step folded key."""
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg, model, params, batch = dropout_setup
    tx = make_optimizer(cfg, num_training_steps=4)
    schedule = hf_lr_schedule("linear", cfg.lr, 1, 4)
    state = init_state(model, tx, batch, seed=0)
    step = make_train_step(model, tx, schedule, dropout_seed=cfg.seed)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(x) for x in losses)
    # same batch, different step -> different dropout mask -> the
    # losses can't follow the deterministic fixed-point trajectory
    assert len(set(losses)) == 3


def test_zero_dropout_unchanged_by_train_mode():
    """Canonical TCGA configs (dropout unset/0) must produce identical
    losses in train and eval mode — parity pin for trajectory tests."""
    cfg_dict = tiny_config("tcga", batch_size=4)
    cfg = training_config_from_dict(cfg_dict)
    model = build_model(get_model_config(cfg))
    from mca_tpu.data.synthetic import make_tcga_like

    widths = {
        m: e["max_tokens"]
        for m, e in cfg_dict["encoder_configs"].items()
    }
    samples = make_tcga_like(4, widths=widths, seed=0)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    train_loss = model.apply(
        params,
        batch,
        deterministic=False,
        rngs={"dropout": jax.random.key(7)},
    )["loss"]
    eval_loss = model.apply(params, batch)["loss"]
    assert float(train_loss) == float(eval_loss)
