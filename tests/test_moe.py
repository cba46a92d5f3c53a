"""Mixture-of-experts FF (mca_tpu.models.moe) — exactness pins.

The MoE is a capability extension (the reference's FF is always dense,
ref model.py:35-54); these tests anchor it three ways:

- degenerate exactness: one expert at full capacity IS the dense GEGLU
  FeedForward (params transplanted leaf-for-leaf);
- the one-hot dispatch/combine einsums match a per-token python-loop
  oracle for values AND gradients;
- expert parallelism: the DPxEP-sharded train step (expert dim on the
  'model' mesh axis) matches the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import FeedForward, build_model
from mca_tpu.models.moe import MoEFeedForward, expert_capacity
from mca_tpu.parallel.mesh import make_mesh, shard_batch
from mca_tpu.parallel.sharding import param_shardings, shard_params
from mca_tpu.train import (
    hf_lr_schedule,
    init_state,
    make_optimizer,
    make_train_step,
)


def test_expert_capacity():
    assert expert_capacity(12, 4, 2.0) == 6
    assert expert_capacity(12, 1, 1.0) == 12
    assert expert_capacity(8, 8, 0.01) == 1  # clamped low
    assert expert_capacity(8, 1, 9.0) == 8  # clamped to T


def test_single_expert_full_capacity_is_dense_ff():
    """E=1, cf=1: every token routed to the only expert with gate 1.0
    (softmax over one expert) — the module IS the dense FeedForward."""
    B, T, D = 2, 12, 16
    x = jax.random.normal(jax.random.key(0), (B, T, D), jnp.float32)
    dense = FeedForward(dim=D, mult=4)
    moe = MoEFeedForward(dim=D, num_experts=1, mult=4, capacity_factor=1.0)
    pd = dense.init(jax.random.key(1), x)
    pm = moe.init(jax.random.key(2), x)
    pm = jax.tree.map(lambda a: a, pm)
    pm["params"]["w_in"] = pd["params"]["w_in"]["kernel"][None]
    pm["params"]["w_out"] = pd["params"]["w_out"]["kernel"][None]
    np.testing.assert_allclose(
        np.asarray(moe.apply(pm, x)),
        np.asarray(dense.apply(pd, x)),
        atol=1e-6,
        rtol=1e-5,
    )


def _oracle(params, x, padding, num_experts, cf):
    """Per-token loop reference of expert-choice routing."""
    router, w_in, w_out = (
        params["router"],
        params["w_in"],
        params["w_out"],
    )
    B, T, D = x.shape
    C = expert_capacity(T, num_experts, cf)
    scores = jax.nn.softmax(
        x.astype(jnp.float32) @ router, axis=-1
    )
    if padding is not None:
        scores = jnp.where(padding[..., None], 0.0, scores)
    out = jnp.zeros_like(x)
    for b in range(B):
        for e in range(num_experts):
            g, idx = jax.lax.top_k(scores[b, :, e], C)
            for c in range(C):
                t = idx[c]
                h = x[b, t] @ w_in[e]
                h1, gate = jnp.split(h, 2)
                ff = (
                    jax.nn.gelu(gate, approximate=False) * h1
                ) @ w_out[e]
                out = out.at[b, t].add(g[c] * ff)
    return out


@pytest.mark.parametrize("with_padding", [False, True])
def test_dispatch_matches_loop_oracle(with_padding):
    B, T, D, E, CF = 2, 8, 12, 3, 1.5
    x = jax.random.normal(jax.random.key(3), (B, T, D), jnp.float32)
    padding = None
    if with_padding:
        padding = jnp.zeros((B, T), bool).at[0, 5:].set(True)
    moe = MoEFeedForward(dim=D, num_experts=E, mult=4, capacity_factor=CF)
    variables = moe.init(jax.random.key(4), x)
    p = variables["params"]

    y = moe.apply(variables, x, padding)
    y_ref = _oracle(p, x, padding, E, CF)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-4
    )

    # gradients through gates, dispatched tokens, and expert weights
    g = jax.grad(
        lambda p_: (moe.apply({"params": p_}, x, padding) ** 2).sum()
    )(p)
    g_ref = jax.grad(
        lambda p_: (_oracle(p_, x, padding, E, CF) ** 2).sum()
    )(p)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g[k]),
            np.asarray(g_ref[k]),
            atol=1e-4,
            rtol=1e-3,
            err_msg=k,
        )


@pytest.mark.parametrize("with_padding", [False, True])
def test_gather_impl_matches_onehot_oracle(with_padding, monkeypatch):
    """The gather/scatter dispatch arm (O(cf*T*D)) equals the default
    one-hot einsum pair (O(cf*T^2*D)) for values AND grads — each arm
    is the other's exactness oracle behind MCA_MOE_IMPL."""
    B, T, D, E, CF = 2, 10, 12, 3, 1.5
    x = jax.random.normal(jax.random.key(8), (B, T, D), jnp.float32)
    padding = None
    if with_padding:
        padding = jnp.zeros((B, T), bool).at[1, 6:].set(True)
    moe = MoEFeedForward(dim=D, num_experts=E, mult=4, capacity_factor=CF)
    variables = moe.init(jax.random.key(9), x)
    p = variables["params"]

    outs, grads = {}, {}
    for impl in ("gather", "onehot"):
        monkeypatch.setenv("MCA_MOE_IMPL", impl)
        # fresh function object per arm — a shared jit cache would
        # silently reuse the first trace and never read the env
        outs[impl] = np.asarray(moe.apply(variables, x, padding))
        grads[impl] = jax.grad(
            lambda p_: (moe.apply({"params": p_}, x, padding) ** 2).sum()
        )(p)
    np.testing.assert_allclose(
        outs["gather"], outs["onehot"], atol=1e-6, rtol=1e-5
    )
    for k in p:
        np.testing.assert_allclose(
            np.asarray(grads["gather"][k]),
            np.asarray(grads["onehot"][k]),
            atol=1e-5,
            rtol=1e-4,
            err_msg=k,
        )


def test_padded_tokens_get_zero_ff_output():
    """Padded tokens route with score 0: picked only when capacity
    exceeds the real-token count, and then combine with weight 0."""
    B, T, D = 1, 8, 12
    x = jax.random.normal(jax.random.key(5), (B, T, D), jnp.float32)
    padding = jnp.zeros((B, T), bool).at[:, 5:].set(True)
    moe = MoEFeedForward(dim=D, num_experts=1, mult=4, capacity_factor=1.0)
    variables = moe.init(jax.random.key(6), x)
    y = moe.apply(variables, x, padding)  # C = 8 > 5 real tokens
    np.testing.assert_array_equal(np.asarray(y[0, 5:]), 0.0)
    assert float(jnp.abs(y[0, :5]).min()) > 0.0


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


@pytest.mark.slow
def test_moe_mca_trains_and_param_layout():
    cfg, model, batch = _setup(moe_experts=2, moe_capacity_factor=2.0)
    batch_j = jax.tree.map(jnp.asarray, batch)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch_j, seed=0)
    layer0 = state["params"]["params"]["layer_0"]["ff"]
    inner = int(cfg.hidden_size * cfg.ff_mult * 2 / 3)
    assert layer0["router"].shape == (cfg.hidden_size, 2)
    assert layer0["w_in"].shape == (2, cfg.hidden_size, inner * 2)
    assert layer0["w_out"].shape == (2, inner, cfg.hidden_size)

    step = make_train_step(model, tx, schedule)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch_j)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_moe_eao_variant_runs():
    """EAO threads moe_experts through to its MCALayers: the per-
    channel passes (several distinct sequence lengths -> several
    expert-capacity C values per block) run and produce a finite
    loss with the expert-shaped param layout."""
    from tests.test_model import make_batch

    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            eao=True,
            no_fusion=True,
            mean_pool=True,
            num_fusion_tokens=0,
            fusion_combos=[2],
            fcl_root=[0, 1],
            moe_experts=2,
            moe_capacity_factor=2.0,
        )
    )
    model = build_model(get_model_config(cfg))
    batch, _ = make_batch(cfg, n=4, seed=0)
    batch = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    layer0 = params["params"]["layer_0"]["ff"]
    assert layer0["w_in"].ndim == 3 and layer0["w_in"].shape[0] == 2
    out = jax.jit(model.apply)(params, batch)
    assert np.isfinite(float(out["loss"]))


def test_moe_export_import_round_trip():
    """export_state_dict handles the MoE ff layout (stacked [E, ...]
    arrays under extension names) and import_state_dict inverts it —
    the dense-FF key map would crash indexing ff['w_in']['kernel']."""
    from mca_tpu.interop import export_state_dict, import_state_dict

    cfg, model, batch = _setup(moe_experts=2, moe_capacity_factor=2.0)
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(7), batch_j)
    sd = export_state_dict(params)
    assert "layers.0.ff.router.weight" in sd
    assert "layers.0.ff.experts.w_in" in sd
    assert sd["layers.0.ff.experts.w_in"].ndim == 3  # [E, D, 2*inner]

    blank = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)), params)
    restored, report = import_state_dict(sd, blank)
    assert not report["missing"], report["missing"]
    for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moe_pipeline_parallel_matches_sequential():
    """MoE composes with GPipe: the stacked per-layer params carry the
    novel [L, E, ...] expert shapes through pipeline_layers; forward
    loss == the sequential stack with the same params."""
    cfg, model, batch = _setup(moe_experts=2, moe_capacity_factor=2.0)
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
    assert jax.tree_util.tree_structure(
        jax.jit(pipe_model.init)(jax.random.key(0), batch_j)
    ) == jax.tree_util.tree_structure(params)
    loss_pipe = float(
        jax.jit(lambda p, b: pipe_model.apply(p, b)["loss"])(
            params, shard_batch(batch, mesh)
        )
    )
    np.testing.assert_allclose(loss_pipe, loss_seq, rtol=1e-5)


@pytest.mark.slow
def test_moe_stats_intermediates_and_tool(tmp_path):
    """The sow hooks only materialise under mutable=["intermediates"]
    (hot path unchanged), and moe_stats computes sane routing numbers:
    expert probability mass sums to 1 (softmax), coverage in (0, 1],
    and cf=2 with E=2 picks every real token at least once here."""
    from mca_tpu.data.synthetic import make_tcga_like, to_hf_dataset
    from mca_tpu.tools.moe_stats import extract_moe_stats, routing_stats

    cfg, model, batch = _setup(moe_experts=2, moe_capacity_factor=2.0)
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)

    # plain apply returns the usual output dict — no intermediates leak
    out = model.apply(params, batch_j)
    assert "loss" in out

    _, mut = model.apply(params, batch_j, mutable=["intermediates"])
    ff0 = mut["intermediates"]["layer_0"]["ff"]
    scores = np.asarray(ff0["router_scores"][0])
    token_idx = np.asarray(ff0["token_idx"][0])
    gates = np.asarray(ff0["gates"][0])
    assert scores.shape[-1] == 2 and token_idx.shape[1] == 2

    row = routing_stats(scores, token_idx, gates)
    np.testing.assert_allclose(
        sum(row["expert_prob_mass"]), 1.0, atol=1e-4
    )
    assert 0.0 < row["coverage_real"] <= 1.0
    assert row["experts_per_real_token"] >= row["coverage_real"]
    assert row["tokens_real"] <= row["tokens_total"]

    # the CLI-level extraction path (dataset from disk, fresh init)
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(16, widths=widths, p_missing=0.25, seed=1)
    to_hf_dataset(samples).save_to_disk(str(tmp_path / "ds"))
    cfg.dataset = str(tmp_path / "ds")
    rows = extract_moe_stats(cfg)
    assert len(rows) == cfg.layers
    assert all(r["experts"] == 2 for r in rows)


@pytest.mark.slow
def test_expert_parallel_step_matches_unsharded():
    """DPxEP: experts sharded over the 'model' axis; train step equals
    the unsharded step (same batch, same init)."""
    cfg, model, batch = _setup(moe_experts=4, moe_capacity_factor=2.0)
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
    # the partition rules put the expert dim on 'model'
    specs = param_shardings(
        {"p": jax.tree.map(np.asarray, ref_params)}, mesh
    )["p"]["params"]["layer_0"]["ff"]
    assert specs["w_in"].spec == jax.sharding.PartitionSpec("model")
    assert specs["w_out"].spec == jax.sharding.PartitionSpec("model")
    assert specs["router"].spec == jax.sharding.PartitionSpec()

    sharded = shard_params(jax.tree.map(jnp.asarray, ref_params), mesh)
    state2 = {
        "params": sharded,
        "opt_state": tx.init(sharded),
        "step": jnp.zeros((), jnp.int32),
    }
    state2, metrics2 = step(state2, shard_batch(batch, mesh))
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
