"""Loss-stack tests: naive oracle, masking/NaN semantics, pair graphs,
and multi-device == single-device equivalence on the virtual CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.losses import (
    LOGIT_SCALE_INIT,
    MCAPretrainingLoss,
    clip_contrastive_loss,
    combo_key,
)


def naive_clip_loss(a, b, logit_scale, mask=None):
    """O(B^2) numpy oracle for the CLIP loss (no normalisation)."""
    t = math.exp(np.clip(logit_scale, 0.0, math.log(100)))
    logits_a = a @ b.T * t
    logits_b = b @ a.T * t

    def ce(logits):
        logits = logits - logits.max(axis=1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        rows = -logp[np.arange(len(logits)), np.arange(len(logits))]
        if mask is not None:
            if mask.sum() == 0:
                return np.nan
            rows = rows[mask]
        return rows.mean()

    return (ce(logits_a) + ce(logits_b)) / 2


@pytest.mark.parametrize("with_mask", [False, True])
def test_clip_loss_matches_oracle(rng, with_mask):
    # moderate scale: raw (unnormalised) dots x temperature 14.3 must
    # not saturate fp32 softmax, or the oracle comparison is noise
    a = 0.2 * rng.normal(size=(6, 8)).astype(np.float32)
    b = 0.2 * rng.normal(size=(6, 8)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1], bool) if with_mask else None
    got = jax.jit(
        lambda a, b, m: clip_contrastive_loss(
            a, b, jnp.float32(LOGIT_SCALE_INIT), mask=m
        )
    )(a, b, mask)
    want = naive_clip_loss(a, b, LOGIT_SCALE_INIT, mask)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_clip_loss_empty_mask_nan(rng):
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(4, 8)).astype(np.float32)
    mask = np.zeros(4, bool)
    got = jax.jit(
        lambda a, b, m: clip_contrastive_loss(
            a, b, jnp.float32(LOGIT_SCALE_INIT), mask=m
        )
    )(a, b, mask)
    assert np.isnan(float(got))


def test_clip_loss_scale_clamped(rng):
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(4, 8)).astype(np.float32)
    hi = jax.jit(
        lambda s: clip_contrastive_loss(a, b, s)
    )(jnp.float32(10.0))  # way above ln(100)
    want = naive_clip_loss(a, b, math.log(100.0))
    np.testing.assert_allclose(float(hi), want, rtol=1e-5)


def _run_loss_module(names, pooled, sample_mask, **kwargs):
    mod = MCAPretrainingLoss(modality_names=tuple(names), **kwargs)
    params = mod.init(
        jax.random.key(0), jnp.asarray(pooled), sample_mask
    )
    out = jax.jit(
        lambda p, t, m: mod.apply(p, t, m)
    )(params, jnp.asarray(pooled), sample_mask)
    return params, out


def _sample_masks(names, b, rng, present_prob=1.0):
    return {
        n: jnp.asarray(rng.random(b) < present_prob) for n in names
    }


def test_pair_graph_default_modality_to_fusion(rng):
    names = ["a", "b", "c"]
    pooled = rng.normal(size=(4, 5, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    _, out = _run_loss_module(names, pooled, masks)
    assert set(out["losses"]) == {"a_fusion", "b_fusion", "c_fusion"}


def test_pair_graph_bimodal(rng):
    names = ["a", "b"]
    pooled = rng.normal(size=(4, 4, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    _, out = _run_loss_module(
        names, pooled, masks, bimodal_contrastive=True
    )
    assert set(out["losses"]) == {"a_b", "a_fusion", "b_fusion"}


def test_pair_graph_no_fusion(rng):
    names = ["a", "b", "c"]
    pooled = rng.normal(size=(4, 4, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    _, out = _run_loss_module(names, pooled, masks, no_fusion=True)
    assert set(out["losses"]) == {"a_b", "a_c", "b_c"}
    assert "fusion" not in out


def test_pair_graph_fcl(rng):
    names = ["a", "b"]
    combos = (frozenset({0, 1}), frozenset({0}), frozenset({1}))
    # pooled layout: [a, b, combo01, combo0, combo1, global]
    pooled = rng.normal(size=(4, 6, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    _, out = _run_loss_module(
        names,
        pooled,
        masks,
        do_fcl=True,
        fusion_combos=combos,
        non_fusion_fcl=True,
        bimodal_contrastive=True,
    )
    expected = {
        "a_b",
        "a_fusion",
        "b_fusion",
        "fcl_fusion|a",
        "fcl_fusion|b",
        "fcl_a|a",
        "fcl_b|a",
        "fcl_a|b",
        "fcl_b|b",
    }
    assert set(out["losses"]) == expected
    assert "fcl_loss" in out and "no-fcl_loss" in out
    # fusion == root combo embedding (combo index 0)
    np.testing.assert_allclose(
        np.asarray(out["fusion"]),
        np.asarray(out[combo_key(combos[0])]),
    )


def test_shared_temperature_single_param(rng):
    names = ["a", "b"]
    pooled = rng.normal(size=(4, 4, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    params, _ = _run_loss_module(
        names, pooled, masks, bimodal_contrastive=True
    )
    leaves = jax.tree.leaves(params)
    assert len(leaves) == 1  # ONE shared logit_scale (ref model.py:152)


def test_separate_temperatures(rng):
    names = ["a", "b"]
    pooled = rng.normal(size=(4, 4, 8)).astype(np.float32)
    masks = _sample_masks(names, 4, rng)
    params, _ = _run_loss_module(
        names,
        pooled,
        masks,
        bimodal_contrastive=True,
        separate_modal_loss_fns=True,
    )
    assert len(jax.tree.leaves(params)) == 3  # one per pair


def test_missing_modality_masked_out(rng):
    """A pair whose modality is absent in every sample goes NaN and is
    excluded from the average (ref model.py:224-232)."""
    names = ["a", "b"]
    pooled = rng.normal(size=(4, 4, 8)).astype(np.float32)
    masks = {
        "a": jnp.zeros(4, bool),  # modality a missing everywhere
        "b": jnp.ones(4, bool),
    }
    _, out = _run_loss_module(
        names, pooled, masks, bimodal_contrastive=True
    )
    assert np.isnan(float(out["losses"]["a_fusion"]))
    assert np.isnan(float(out["losses"]["a_b"]))
    assert np.isfinite(float(out["losses"]["b_fusion"]))
    # total = mean over the finite ones only
    np.testing.assert_allclose(
        float(out["loss"]),
        float(out["losses"]["b_fusion"]),
        rtol=1e-6,
    )


def test_loss_gradable(rng):
    """Gradients stay finite even with NaN (empty-mask) pair losses."""
    names = ["a", "b"]
    masks = {"a": jnp.zeros(4, bool), "b": jnp.ones(4, bool)}
    mod = MCAPretrainingLoss(
        modality_names=("a", "b"), bimodal_contrastive=True
    )
    pooled = jnp.asarray(
        rng.normal(size=(4, 4, 8)).astype(np.float32)
    )
    params = mod.init(jax.random.key(0), pooled, masks)

    def loss_fn(p, t):
        return mod.apply(p, t, masks)["loss"]

    g = jax.jit(jax.grad(loss_fn, argnums=1))(params, pooled)
    assert np.isfinite(np.asarray(g)).all()


def test_multi_device_equals_single_device(rng):
    """all-gather loss over 8 shards == single-device loss on the
    concatenated batch (the distributed-correctness pin, SURVEY §4)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should force 8 virtual CPU devices"
    b_local, d = 4, 16
    a = rng.normal(size=(n_dev * b_local, d)).astype(np.float32)
    b = rng.normal(size=(n_dev * b_local, d)).astype(np.float32)
    mask = rng.random(n_dev * b_local) < 0.7
    scale = jnp.float32(LOGIT_SCALE_INIT)

    single = clip_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), scale, mask=jnp.asarray(mask)
    )

    mesh = Mesh(np.array(jax.devices()), ("data",))

    @jax.jit
    def distributed(a, b, m):
        def inner(a, b, m):
            # per-shard masked SUM + count, then psum -> global mean,
            # equivalent to the reference's row-masked global CE
            loss = clip_contrastive_loss(
                a, b, scale, mask=m, axis_name="data"
            )
            cnt = m.sum()
            total = jnp.where(cnt > 0, loss * cnt, 0.0)
            g_cnt = jax.lax.psum(cnt, "data")
            g_total = jax.lax.psum(total, "data")
            return g_total / g_cnt

        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P(),
        )(a, b, m)

    multi = distributed(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(multi), float(single), rtol=1e-5)


def test_gather_tensor_modes(rng):
    """Gradient semantics of the three backprop modes (mirroring ref
    utils/distributed.py:11-56 under DDP gradient averaging):

    - GLOBAL: grad == the exact gradient of the same loss computed on
      the global batch on one device (grads flow to every shard's
      contribution),
    - LOCAL: grads flow only through the shard's own rows, scaled by
      1/world (each worker only differentiates its own replica's loss),
    - NONE: the gathered values carry no gradient at all.
    """
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from mca_tpu.parallel.collectives import BackpropType, gather_tensor

    mesh = Mesh(np.array(jax.devices()), ("data",))
    world = 8
    x = rng.normal(size=(16, 4)).astype(np.float32)

    def grad_through_gather(mode):
        def inner(x):
            g = gather_tensor(x, "data", mode)
            return (g**2).sum() / 2  # replicated per-shard loss

        f = shard_map(
            inner,
            mesh=mesh,
            in_specs=(P("data"),),
            out_specs=P(),
            check_vma=False,  # the value IS replicated, but the static
            # checker cannot prove it through the grad pass
        )
        return np.asarray(
            jax.jit(jax.grad(lambda x: f(x)))(jnp.asarray(x))
        )

    true_grad = x  # d/dx of ||x||^2 / 2 on the global batch
    np.testing.assert_allclose(
        grad_through_gather(BackpropType.GLOBAL), true_grad, rtol=1e-5
    )
    assert (grad_through_gather(BackpropType.NONE) == 0).all()
    np.testing.assert_allclose(
        grad_through_gather(BackpropType.LOCAL),
        true_grad / world,
        rtol=1e-5,
    )
