"""Distributed-correctness pins on the virtual 8-device CPU mesh.

- the jit-over-sharded-batch training loss equals the single-device
  loss on the same global batch (XLA-partitioner path);
- a full train step under DP+TP shardings matches the unsharded step;
- parameter sharding rules put attention/FF matrices on the model axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.parallel.mesh import make_mesh, shard_batch
from mca_tpu.parallel.sharding import param_shardings, shard_params
from mca_tpu.train import (
    hf_lr_schedule,
    init_state,
    make_optimizer,
    make_train_step,
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
    return cfg, model, batch


def test_sharded_loss_equals_single_device():
    cfg, model, batch = _setup()
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)
    single = float(
        jax.jit(lambda p, b: model.apply(p, b)["loss"])(
            params, batch_j
        )
    )
    mesh = make_mesh(8, 1)
    sharded_batch = shard_batch(batch, mesh)
    sharded_params = shard_params(params, mesh)
    multi = float(
        jax.jit(lambda p, b: model.apply(p, b)["loss"])(
            sharded_params, sharded_batch
        )
    )
    np.testing.assert_allclose(multi, single, rtol=1e-5)


@pytest.mark.slow
def test_train_step_dp_tp_matches_unsharded():
    cfg, model, batch = _setup()
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    step = make_train_step(model, tx, schedule)

    batch_j = jax.tree.map(jnp.asarray, batch)
    state = init_state(model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    state1, metrics1 = step(state, batch_j)

    mesh = make_mesh(4, 2)
    state2 = {
        "params": shard_params(
            jax.tree.map(jnp.asarray, ref_params), mesh
        ),
        "opt_state": tx.init(
            shard_params(jax.tree.map(jnp.asarray, ref_params), mesh)
        ),
        "step": jnp.zeros((), jnp.int32),
    }
    state2, metrics2 = step(state2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(metrics2["total_loss"]),
        float(metrics1["total_loss"]),
        rtol=1e-5,
    )
    # updated parameters agree leaf-by-leaf
    flat1 = jax.tree.leaves(jax.device_get(state1["params"]))
    flat2 = jax.tree.leaves(jax.device_get(state2["params"]))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_param_sharding_rules():
    cfg, model, batch = _setup(batch_size=4)
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)
    mesh = make_mesh(4, 2)
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    n_model_sharded = 0
    for path, sharding in flat:
        name = jax.tree_util.keystr(path)
        spec = sharding.spec
        if "attn" in name and "kernel" in name and "pool" not in name:
            assert "model" in str(spec), (name, spec)
            n_model_sharded += 1
        elif "embedding" in name:
            assert spec == jax.sharding.PartitionSpec(), (name, spec)
    assert n_model_sharded >= cfg.layers * 3


def test_shard_map_loss_axis_equals_global():
    """The explicit-collective path (loss_axis_name under shard_map)
    must equal the XLA-partitioner path (global loss under jit)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    cfg, model, batch = _setup(batch_size=8)
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)
    single = float(
        jax.jit(lambda p, b: model.apply(p, b)["loss"])(
            params, batch_j
        )
    )

    from mca_tpu.config import get_model_config
    from mca_tpu.models import build_model

    mc = get_model_config(cfg)
    mc["loss_axis_name"] = "data"
    sharded_model = build_model(mc)
    mesh = make_mesh(8, 1)

    @jax.jit
    def distributed(params, batch):
        def inner(batch):
            # each pair loss psums row-loss sums and mask counts over
            # 'data', so every shard holds the identical global
            # row-weighted mean (ref semantics: mask rows of the
            # GLOBAL batch, mean over all selected rows) and the
            # NaN-safe pair aggregation is shard-invariant
            return sharded_model.apply(params, batch)["loss"]

        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(P("data"),),
            out_specs=P(),
            check_vma=False,
        )(batch)

    sharded_batch = jax.tree.map(jnp.asarray, batch)
    multi = float(distributed(params, sharded_batch))
    # exact reference semantics on both paths now: the explicit
    # shard_map collectives reproduce the jit-partitioner global loss
    # to fp32 reduction-order noise even with unbalanced presence
    # (p_missing=0.25 -> shards have unequal mask counts)
    np.testing.assert_allclose(multi, single, rtol=1e-5)


# ---------------------------------------------------------------------------
# PRODUCTION-path multi-device pins (VERDICT r2 item 1): the bench/train
# fast path — bf16 + Pallas flash (interpret on the CPU mesh) +
# flat-vector state + lax.scan K-step launches — must produce the same
# losses and parameters on a mesh as on one device.  The Pallas kernel
# participates in partitioning via its custom_partitioning rule
# (mca_tpu.ops.flash_attention._shard_batch_heads); without it the
# kernel would be replicated (inputs all-gathered), which these tests
# would catch as either an error or a numeric mismatch.
# ---------------------------------------------------------------------------


def _production_apparatus(cfg, model, batches, pad_to_multiple=1, out_shardings=None):
    from mca_tpu.train import (
        make_flat_apparatus,
        make_flat_train_step_scan,
        stack_batches,
        step_metric_names,
    )

    batch0 = jax.tree.map(jnp.asarray, batches[0])
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state0 = init_state(model, tx, batch0, seed=0)
    names = step_metric_names(model, tx, schedule, state0, batch0)
    flat0, unravel, flat_tx = make_flat_apparatus(
        cfg, 10, state0["params"], pad_to_multiple=pad_to_multiple
    )
    steps = make_flat_train_step_scan(
        model, flat_tx, schedule, unravel, names,
        out_shardings=out_shardings,
    )
    stacked = stack_batches(batches)

    def fresh_state():
        f = jnp.array(flat0)
        return {
            "flat": f,
            "opt_state": flat_tx.init(f),
            "step": jnp.zeros((), jnp.int32),
        }

    return steps, fresh_state, stacked


@pytest.mark.slow
def test_production_flat_scan_pallas_bf16_dp_matches_single():
    """Flat-state scan (K=2) with bf16 + pallas flash: DP-8 mesh ==
    single device, losses and updated parameter vector."""
    cfg, model, _ = _setup(
        batch_size=8, precision="bf16", attention_impl="pallas"
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    collate = MultimodalCollator(cfg.modality_config.to_plain())
    batches = [
        collate(
            make_tcga_like(8, widths=widths, p_missing=0.25, seed=s)
        )
        for s in (0, 1)
    ]
    steps, fresh_state, stacked = _production_apparatus(
        cfg, model, batches
    )

    s1, m1 = steps(fresh_state(), jax.tree.map(jnp.asarray, stacked))
    m1, flat1 = np.asarray(m1), np.asarray(s1["flat"])

    mesh = make_mesh(8, 1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    state2 = jax.tree.map(
        lambda x: jax.device_put(x, repl), fresh_state()
    )
    s2, m2 = steps(state2, shard_batch(stacked, mesh, leading_scan_axis=True))
    m2, flat2 = np.asarray(m2), np.asarray(s2["flat"])

    # bf16 matmul products accumulate in fp32; partitioned reductions
    # only reorder those accumulations
    np.testing.assert_allclose(m2, m1, rtol=2e-3, atol=2e-4)
    # AdamW's grad/sqrt(v) normalisation amplifies fp reduction-order
    # noise on near-zero entries -> absolute tolerance dominates there
    np.testing.assert_allclose(flat2, flat1, rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_production_tree_step_pallas_bf16_dp_tp_matches_single():
    """Tree-state single step with bf16 + pallas flash under DP x TP
    (4x2) shardings == unsharded step (megatron head sharding composes
    with the kernel's batch/head partitioning rule)."""
    cfg, model, batch = _setup(
        batch_size=8, precision="bf16", attention_impl="pallas"
    )
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    step = make_train_step(model, tx, schedule)

    batch_j = jax.tree.map(jnp.asarray, batch)
    state = init_state(model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    state1, metrics1 = step(state, batch_j)

    mesh = make_mesh(4, 2)
    state2 = {
        "params": shard_params(
            jax.tree.map(jnp.asarray, ref_params), mesh
        ),
        "opt_state": tx.init(
            shard_params(jax.tree.map(jnp.asarray, ref_params), mesh)
        ),
        "step": jnp.zeros((), jnp.int32),
    }
    state2, metrics2 = step(state2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(metrics2["total_loss"]),
        float(metrics1["total_loss"]),
        rtol=2e-3,
    )
    flat1 = jax.tree.leaves(jax.device_get(state1["params"]))
    flat2 = jax.tree.leaves(jax.device_get(state2["params"]))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=4e-3, atol=2e-4
        )


# ---------------------------------------------------------------------------
# FSDP (ZeRO-style param/optimizer sharding over 'data'): the sharded
# runs must reproduce the unsharded trajectories, the state must
# actually END UP sharded (out_shardings pins the donated outputs), and
# the flat vector's divisibility padding must be numerically inert.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_flat_apparatus_padding_is_inert():
    """pad_to_multiple changes the vector length but not the math:
    padded and unpadded single-device scans produce identical metrics
    and parameters."""
    from mca_tpu.train import (
        make_flat_apparatus,
        make_flat_train_step_scan,
        stack_batches,
        step_metric_names,
    )

    cfg, model, _ = _setup(batch_size=4)
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    collate = MultimodalCollator(cfg.modality_config.to_plain())
    batches = [
        collate(make_tcga_like(4, widths=widths, p_missing=0.25, seed=s))
        for s in (0, 1)
    ]
    batch0 = jax.tree.map(jnp.asarray, batches[0])
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state0 = init_state(model, tx, batch0, seed=0)
    names = step_metric_names(model, tx, schedule, state0, batch0)
    stacked = jax.tree.map(jnp.asarray, stack_batches(batches))

    results = {}
    for mult in (1, 8):
        flat0, unravel, flat_tx = make_flat_apparatus(
            cfg, 10, state0["params"], pad_to_multiple=mult
        )
        steps = make_flat_train_step_scan(
            model, flat_tx, schedule, unravel, names
        )
        st = {
            "flat": jnp.array(flat0),
            "opt_state": flat_tx.init(jnp.array(flat0)),
            "step": jnp.zeros((), jnp.int32),
        }
        s, m = steps(st, stacked)
        results[mult] = (np.asarray(m), np.asarray(s["flat"]))

    n = results[1][1].shape[0]
    assert results[8][1].shape[0] >= n
    # the padded vector reorders the global-norm clip's partial sums
    # (norm over n+pad elements), so "inert" means fp reduction-order
    # noise, not bit-equality
    np.testing.assert_allclose(
        results[8][0], results[1][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results[8][1][:n], results[1][1], rtol=1e-5, atol=1e-7
    )
    # the pad tail never moves off zero: zero grad -> zero moments,
    # zero weight-decay, clip scales zero
    np.testing.assert_array_equal(results[8][1][n:], 0.0)


@pytest.mark.slow
def test_production_flat_scan_fsdp_matches_single():
    """FSDP on the production fast path: flat state sharded P('data')
    over 8 devices (params + AdamW moments), bf16 + pallas flash +
    scan K=2 — equals the single-device run, and the donated outputs
    stay sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mca_tpu.parallel.mesh import replicated
    from mca_tpu.parallel.sharding import (
        shard_opt_state,
        state_shardings,
    )
    from mca_tpu.train import (
        make_flat_apparatus,
        make_flat_train_step_scan,
        stack_batches,
        step_metric_names,
    )

    cfg, model, _ = _setup(
        batch_size=8, precision="bf16", attention_impl="pallas"
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    collate = MultimodalCollator(cfg.modality_config.to_plain())
    batches = [
        collate(make_tcga_like(8, widths=widths, p_missing=0.25, seed=s))
        for s in (0, 1)
    ]
    batch0 = jax.tree.map(jnp.asarray, batches[0])
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state0 = init_state(model, tx, batch0, seed=0)
    names = step_metric_names(model, tx, schedule, state0, batch0)
    flat0, unravel, flat_tx = make_flat_apparatus(
        cfg, 10, state0["params"], pad_to_multiple=8
    )
    stacked = stack_batches(batches)

    # single device (same padded apparatus -> identical math)
    steps1 = make_flat_train_step_scan(
        model, flat_tx, schedule, unravel, names
    )
    st1 = {
        "flat": jnp.array(flat0),
        "opt_state": flat_tx.init(jnp.array(flat0)),
        "step": jnp.zeros((), jnp.int32),
    }
    s1, m1 = steps1(st1, jax.tree.map(jnp.asarray, stacked))
    m1, flat1 = np.asarray(m1), np.asarray(s1["flat"])

    # fsdp over DP-8
    mesh = make_mesh(8, 1)
    fshard = NamedSharding(mesh, P("data"))
    flat_s = jax.device_put(jnp.array(flat0), fshard)
    st2 = {
        "flat": flat_s,
        "opt_state": shard_opt_state(
            flat_tx.init(flat_s), mesh, fsdp=True, fsdp_min_size=0
        ),
        "step": jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)),
    }
    # AdamW moments really are distributed: one flat vector on 'data'
    mus = [
        x
        for x in jax.tree.leaves(st2["opt_state"])
        if getattr(x, "ndim", 0) == 1 and x.size == flat_s.size
    ]
    assert mus and all(x.sharding.spec == P("data") for x in mus)
    steps2 = make_flat_train_step_scan(
        model,
        flat_tx,
        schedule,
        unravel,
        names,
        out_shardings=(state_shardings(st2), replicated(mesh)),
    )
    s2, m2 = steps2(
        st2, shard_batch(stacked, mesh, leading_scan_axis=True)
    )
    assert s2["flat"].sharding.spec == P("data")
    m2, flat2 = np.asarray(m2), np.asarray(s2["flat"])

    np.testing.assert_allclose(m2, m1, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(flat2, flat1, rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_tree_step_fsdp_tp_matches_unsharded():
    """Tree-state step with fsdp=True composed with TP on a 4x2 mesh
    (per-leaf mu/nu via fuse_optimizer=False so the moments shard like
    their parameters) == the unsharded step."""
    from jax.sharding import PartitionSpec as P

    from mca_tpu.parallel.mesh import replicated
    from mca_tpu.parallel.sharding import (
        param_shardings,
        shard_opt_state,
        state_shardings,
    )

    cfg, model, batch = _setup(batch_size=8, fuse_optimizer=False)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    batch_j = jax.tree.map(jnp.asarray, batch)
    state = init_state(model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    step_fn = make_train_step(model, tx, schedule)
    state1, metrics1 = step_fn(state, batch_j)

    mesh = make_mesh(4, 2)
    params2 = shard_params(
        jax.tree.map(jnp.asarray, ref_params), mesh, fsdp=True,
        fsdp_min_size=0,
    )
    # at least one big leaf is sharded on BOTH axes (fsdp x tp)
    specs = [
        s.spec
        for s in jax.tree.leaves(
            param_shardings(ref_params, mesh, fsdp=True, fsdp_min_size=0)
        )
    ]
    assert any("data" in str(sp) and "model" in str(sp) for sp in specs)
    assert any(sp == P("data") or "data" in str(sp) for sp in specs)
    state2 = {
        "params": params2,
        "opt_state": shard_opt_state(
            tx.init(params2), mesh, fsdp=True, fsdp_min_size=0
        ),
        "step": jax.device_put(
            jnp.zeros((), jnp.int32), replicated(mesh)
        ),
    }
    fsdp_step = make_train_step(
        model,
        tx,
        schedule,
        out_shardings=(state_shardings(state2), replicated(mesh)),
    )
    state2, metrics2 = fsdp_step(state2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(metrics2["total_loss"]),
        float(metrics1["total_loss"]),
        rtol=1e-5,
    )
    flat1 = jax.tree.leaves(jax.device_get(state1["params"]))
    flat2 = jax.tree.leaves(jax.device_get(state2["params"]))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
    # moments stayed sharded after the donated step
    mu_specs = [
        x.sharding.spec
        for x in jax.tree.leaves(state2["opt_state"])
        if getattr(x, "ndim", 0) >= 2
    ]
    assert any("data" in str(sp) for sp in mu_specs)


@pytest.mark.slow
def test_seq_shard_matches_unsharded():
    """Megatron sequence parallelism (activations constrained to shard
    T over the TP axis between blocks) is numerically transparent: the
    DPxTP train step with seq_shard equals the unsharded step."""
    cfg, model, batch = _setup(batch_size=8)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    batch_j = jax.tree.map(jnp.asarray, batch)
    state = init_state(model, tx, batch_j, seed=0)
    ref_params = jax.tree.map(np.copy, state["params"])
    state1, metrics1 = make_train_step(model, tx, schedule)(
        state, batch_j
    )

    mesh = make_mesh(4, 2)
    mc = get_model_config(cfg)
    sp_model = build_model(
        dict(mc, seq_shard=True, seq_shard_mesh=mesh)
    )
    state2 = {
        "params": shard_params(
            jax.tree.map(jnp.asarray, ref_params), mesh
        ),
        "opt_state": tx.init(
            shard_params(jax.tree.map(jnp.asarray, ref_params), mesh)
        ),
        "step": jnp.zeros((), jnp.int32),
    }
    state2, metrics2 = make_train_step(sp_model, tx, schedule)(
        state2, shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(metrics2["total_loss"]),
        float(metrics1["total_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state1["params"])),
        jax.tree.leaves(jax.device_get(state2["params"])),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
