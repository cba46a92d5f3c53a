"""Gradient-accumulation exactness pins.

``grad_accum: N`` splits the batch into N STRIDED microbatches
(rows i, i+N, ... — every device keeps a share of every microbatch
under data parallelism) inside the jitted step, accumulates a running
mean gradient at fixed parameters, and applies ONE optimizer update.  Loss semantics are
microbatch-local (the contrastive loss is batch-global, so each
microbatch computes its own logit matrix — the reference's DDP-rank
semantics without a global gather, ref utils/distributed.py), so the
oracle here is the mean of independently computed per-microbatch
gradients, not the full-batch step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.train import (
    hf_lr_schedule,
    init_state,
    make_flat_apparatus,
    make_flat_train_step_scan,
    make_optimizer,
    make_train_step,
    step_metric_names,
)

N_ACCUM = 2
SEED = 0


def _setup(batch_size=8):
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=batch_size, precision="fp32",
                    attention_impl="dense")
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = jax.tree.map(
        jnp.asarray,
        MultimodalCollator(cfg.modality_config.to_plain())(samples),
    )
    return cfg, batch


def _micro(batch, i, n=N_ACCUM):
    # strided microbatches (rows i, i+n, ...) — the TPU-correct
    # decomposition: every device keeps a share of every microbatch
    return jax.tree.map(lambda x: x[i::n], batch)


def _oracle_grads(model, params, batch, step):
    """Mean of per-microbatch grads at FIXED params, replicating the
    production RNG scheme (dropout key folded with step then the
    microbatch index)."""

    def loss(p, b, i):
        rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(SEED), step), i
        )
        return model.apply(
            p, b, deterministic=False, rngs={"dropout": rng}
        )["loss"]

    losses, grads = [], []
    for i in range(N_ACCUM):
        l, g = jax.value_and_grad(loss)(params, _micro(batch, i), i)
        losses.append(l)
        grads.append(g)
    gmean = jax.tree.map(
        lambda *xs: sum(xs) / N_ACCUM, *grads
    )
    return float(np.mean([float(l) for l in losses])), gmean


@pytest.mark.slow
def test_accum_step_equals_mean_of_microbatch_grads():
    cfg, batch = _setup()
    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch, seed=SEED)
    ref_params = jax.tree.map(np.copy, state["params"])

    loss_o, gmean = _oracle_grads(model, ref_params, batch, 0)
    import optax

    updates, _ = tx.update(gmean, tx.init(ref_params), ref_params)
    params_o = optax.apply_updates(ref_params, updates)

    step = make_train_step(
        model, tx, schedule, dropout_seed=SEED, n_accum=N_ACCUM
    )
    state, metrics = step(state, batch)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), loss_o, rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(params_o),
        jax.tree.leaves(jax.device_get(state["params"])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )


def test_accum_nan_pair_metrics_average_over_present_microbatches():
    """A pair absent from ONE microbatch logs NaN there (losses.py
    empty-mask semantics); the accumulated step's logged pair metric
    must be the mean over the microbatches that HAD the pair — not
    NaN-poisoned by the empty one."""
    cfg, batch = _setup()
    pad = float(cfg.modality_config["protein"]["pad_token"])
    batch = jax.tree.map(lambda x: np.array(x, copy=True), batch)
    # microbatch 0 (strided rows 0,2,4,6): protein entirely missing —
    # values at the pad sentinel and the collator's attention_mask
    # all-1 (mask==0 means attended; presence is (a==0).any(),
    # mca.py:183)
    batch["protein"]["values"][::2] = pad
    batch["protein"]["attention_mask"][::2] = 1
    batch = jax.tree.map(jnp.asarray, batch)

    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch, seed=SEED)
    params = jax.tree.map(np.copy, state["params"])
    step = make_train_step(
        model, tx, schedule, dropout_seed=SEED, n_accum=N_ACCUM
    )
    _, metrics = step(state, batch)

    def pair_loss(mb, i):
        rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(SEED), 0), i
        )
        out = model.apply(
            params, mb, deterministic=False, rngs={"dropout": rng}
        )
        return float(out["losses"]["gene_protein"])

    v0 = pair_loss(_micro(batch, 0), 0)
    v1 = pair_loss(_micro(batch, 1), 1)
    assert not np.isfinite(v0)  # the empty-pair microbatch is NaN
    assert np.isfinite(v1)
    got = float(metrics["gene_protein"])
    np.testing.assert_allclose(got, v1, rtol=1e-5)


@pytest.mark.slow
def test_accum_on_dp_mesh_matches_single_device():
    """grad_accum composes with data parallelism: the batch-axis
    reshape [B] -> [N, B/N] crosses the sharded axis (the partitioner
    reshards each microbatch), and the result must still equal the
    single-device accumulated step."""
    from mca_tpu.parallel.mesh import make_mesh, shard_batch

    cfg, batch = _setup()
    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch, seed=SEED)
    ref_params = jax.tree.map(np.copy, state["params"])
    step = make_train_step(
        model, tx, schedule, dropout_seed=SEED, n_accum=N_ACCUM
    )
    s1, m1 = step(state, batch)

    mesh = make_mesh(4, 1)
    state2 = {
        "params": jax.tree.map(jnp.asarray, ref_params),
        "opt_state": tx.init(jax.tree.map(jnp.asarray, ref_params)),
        "step": jnp.zeros((), jnp.int32),
    }
    s2, m2 = step(state2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m2["total_loss"]), float(m1["total_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1["params"])),
        jax.tree.leaves(jax.device_get(s2["params"])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )


@pytest.mark.slow
def test_flat_scan_accum_matches_tree_accum():
    """The flat-vector fast path with grad_accum == the tree-state
    accumulated step (same mean-gradient math through the raveled
    optimizer)."""
    cfg, batch = _setup()
    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch, seed=SEED)
    ref_params = jax.tree.map(np.copy, state["params"])

    step = make_train_step(
        model, tx, schedule, dropout_seed=SEED, n_accum=N_ACCUM
    )
    s_tree, m_tree = step(state, batch)

    flat0, unravel, flat_tx = make_flat_apparatus(cfg, 10, ref_params)
    fstate = {
        "flat": flat0,
        "opt_state": flat_tx.init(flat0),
        "step": jnp.zeros((), jnp.int32),
    }
    names = step_metric_names(
        model, tx, schedule,
        {"params": ref_params, "opt_state": tx.init(ref_params),
         "step": jnp.zeros((), jnp.int32)},
        batch,
    )
    steps = make_flat_train_step_scan(
        model, flat_tx, schedule, unravel, names,
        dropout_seed=SEED, n_accum=N_ACCUM,
    )
    batches = jax.tree.map(lambda x: x[None], batch)  # K=1
    fstate, packed = steps(fstate, batches)

    loss_idx = names.index("total_loss")
    np.testing.assert_allclose(
        float(packed[0, loss_idx]), float(m_tree["total_loss"]),
        rtol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_tree["params"])),
        jax.tree.leaves(
            jax.device_get(jax.jit(unravel)(fstate["flat"]))
        ),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )
