"""Pipeline-parallelism exactness pins (virtual 8-device CPU mesh).

The GPipe schedule (`mca_tpu.parallel.pipeline`) must be a drop-in
replacement for the sequential layer stack: same outputs, same
gradients, same parameter tree — on its own, composed with data
parallelism, and inside the full MCA train step.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.parallel.mesh import make_mesh, shard_batch
from mca_tpu.parallel.pipeline import pipeline_layers


def _toy(depth=8, D=16, B=8, T=6, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 * depth + 1)
    params = {
        "w": jnp.stack(
            [jax.random.normal(ks[i], (D, D)) * 0.3 for i in range(depth)]
        ),
        "b": jnp.stack(
            [
                jax.random.normal(ks[depth + i], (D,)) * 0.1
                for i in range(depth)
            ]
        ),
    }
    x = jax.random.normal(ks[-1], (B, T, D))
    padding = jnp.zeros((B, T), bool)
    return params, x, padding


def _layer(p, x, pad):
    # padding participates so the test catches a schedule that pairs
    # the wrong microbatch's mask with an activation
    return jnp.tanh(x @ p["w"] + p["b"]) * (~pad)[..., None]


def _sequential(params, x, pad):
    return jax.lax.scan(
        lambda c, p: (_layer(p, c, pad), None), x, params
    )[0]


def test_pipeline_matches_sequential_fwd_and_grad():
    params, x, _ = _toy()
    # make the padding non-trivial and microbatch-dependent
    padding = (
        jax.random.uniform(jax.random.PRNGKey(3), (8, 6)) < 0.3
    )
    mesh = make_mesh(2, 1, pipe=4)
    y_seq = jax.jit(_sequential)(params, x, padding)

    def piped(params, x, padding):
        return pipeline_layers(
            _layer, params, x, padding, mesh, n_stages=4
        )

    y_pipe = jax.jit(piped)(params, x, padding)
    np.testing.assert_allclose(
        np.asarray(y_pipe), np.asarray(y_seq), rtol=1e-6, atol=1e-6
    )

    g_seq = jax.jit(
        jax.grad(lambda p: jnp.sum(_sequential(p, x, padding) ** 2))
    )(params)
    g_pipe = jax.jit(
        jax.grad(lambda p: jnp.sum(piped(p, x, padding) ** 2))
    )(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
        ),
        g_seq,
        g_pipe,
    )


def test_pipeline_more_microbatches_and_dp_sharded():
    """n_micro > n_stages shrinks the bubble but not the math; the
    batch sharded over 'data' composes (shard_map is manual over
    'pipe' only)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params, x, padding = _toy(depth=4, B=8)
    mesh = make_mesh(4, 1, pipe=2)
    y_seq = jax.jit(_sequential)(params, x, padding)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y = jax.jit(
        lambda p, x_, m_: pipeline_layers(
            _layer, p, x_, m_, mesh, n_stages=2, n_micro=4
        )
    )(params, xs, padding)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_seq), rtol=1e-6, atol=1e-6
    )


def _mca_setup(batch_size=8, **overrides):
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=batch_size, **overrides)
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    return cfg, batch


def test_mca_pipelined_forward_matches_sequential():
    """MCA with pipeline_stages=2 on a (2,1,2) mesh: identical param
    tree, same loss as the sequential model with the same params."""
    cfg, batch = _mca_setup(precision="fp32", attention_impl="dense")
    batch_j = jax.tree.map(jnp.asarray, batch)
    mc = get_model_config(cfg)
    seq_model = build_model(mc)
    params = jax.jit(seq_model.init)(jax.random.key(0), batch_j)
    loss_seq = float(
        jax.jit(lambda p, b: seq_model.apply(p, b)["loss"])(
            params, batch_j
        )
    )

    mesh = make_mesh(2, 1, pipe=2)
    pipe_model = build_model(
        dict(mc, pipeline_stages=2, pipeline_mesh=mesh)
    )
    # same parameter tree: pipelining is a pure execution strategy
    p2 = jax.jit(pipe_model.init)(jax.random.key(0), batch_j)
    assert jax.tree_util.tree_structure(
        p2
    ) == jax.tree_util.tree_structure(params)

    sb = shard_batch(batch, mesh)
    loss_pipe = float(
        jax.jit(lambda p, b: pipe_model.apply(p, b)["loss"])(
            params, sb
        )
    )
    np.testing.assert_allclose(loss_pipe, loss_seq, rtol=1e-5)


def test_mca_pipelined_train_step_matches_sequential():
    """One full train step (grads + AdamW) with the pipelined stack ==
    the sequential step: losses and every updated parameter leaf."""
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg, batch = _mca_setup(precision="fp32", attention_impl="dense")
    batch_j = jax.tree.map(jnp.asarray, batch)
    mc = get_model_config(cfg)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )

    seq_model = build_model(mc)
    state = init_state(seq_model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    s1, m1 = make_train_step(seq_model, tx, schedule)(state, batch_j)

    mesh = make_mesh(2, 1, pipe=2)
    pipe_model = build_model(
        dict(mc, pipeline_stages=2, pipeline_mesh=mesh)
    )
    state2 = {
        "params": jax.tree.map(jnp.asarray, ref_params),
        "opt_state": tx.init(jax.tree.map(jnp.asarray, ref_params)),
        "step": jnp.zeros((), jnp.int32),
    }
    s2, m2 = make_train_step(pipe_model, tx, schedule)(
        state2, shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1["params"])),
        jax.tree.leaves(jax.device_get(s2["params"])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_mca_pipelined_pallas_bf16():
    """The production kernel path (bf16 + pallas flash, interpret on
    CPU) runs inside the pipeline's shard_map and matches the
    sequential loss at bf16 tolerance."""
    cfg, batch = _mca_setup(precision="bf16", attention_impl="pallas")
    batch_j = jax.tree.map(jnp.asarray, batch)
    mc = get_model_config(cfg)
    seq_model = build_model(mc)
    params = jax.jit(seq_model.init)(jax.random.key(0), batch_j)
    loss_seq = float(
        jax.jit(lambda p, b: seq_model.apply(p, b)["loss"])(
            params, batch_j
        )
    )
    mesh = make_mesh(2, 1, pipe=2)
    pipe_model = build_model(
        dict(mc, pipeline_stages=2, pipeline_mesh=mesh)
    )
    loss_pipe = float(
        jax.jit(lambda p, b: pipe_model.apply(p, b)["loss"])(
            params, shard_batch(batch, mesh)
        )
    )
    np.testing.assert_allclose(loss_pipe, loss_seq, rtol=2e-3)


@pytest.mark.slow
def test_mca_pipelined_with_fsdp_params():
    """PP x FSDP (the standard at-scale combo): parameters ZeRO-sharded
    over 'data' while the layer stack runs pipelined over 'pipe' — the
    stacked per-layer params enter the shard_map replicated-over-pipe
    but keep their data-axis sharding with the partitioner.  One full
    train step == the sequential unsharded step."""
    from mca_tpu.parallel.sharding import (
        shard_opt_state,
        shard_params,
        state_shardings,
    )
    from mca_tpu.parallel.mesh import replicated
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg, batch = _mca_setup(
        batch_size=8, precision="fp32", attention_impl="dense",
        fsdp=True,
    )
    batch_j = jax.tree.map(jnp.asarray, batch)
    mc = get_model_config(cfg)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    seq_model = build_model(mc)
    state = init_state(seq_model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    s1, m1 = make_train_step(seq_model, tx, schedule)(state, batch_j)

    mesh = make_mesh(2, 1, pipe=2)
    pipe_model = build_model(
        dict(mc, pipeline_stages=2, pipeline_mesh=mesh)
    )
    params2 = shard_params(
        jax.tree.map(jnp.asarray, ref_params), mesh, fsdp=True,
        fsdp_min_size=0,
    )
    state2 = {
        "params": params2,
        "opt_state": shard_opt_state(
            tx.init(params2), mesh, fsdp=True, fsdp_min_size=0
        ),
        "step": jax.device_put(
            jnp.zeros((), jnp.int32), replicated(mesh)
        ),
    }
    step = make_train_step(
        pipe_model,
        tx,
        schedule,
        out_shardings=(state_shardings(state2), replicated(mesh)),
    )
    state2, m2 = step(state2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1["params"])),
        jax.tree.leaves(jax.device_get(state2["params"])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
