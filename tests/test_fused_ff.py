"""Fused GEGLU-FF kernel: values, grads, param-tree identity, and
the row-sharded SPMD rule (CPU interpret mode; the on-chip speed A/B
and Mosaic lowering live in baselines/ab_fused_ff.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mca_tpu.ops.fused_ff import fused_geglu_ff, geglu_ff_reference


@pytest.fixture()
def case(rng):
    D, inner, N = 64, int(64 * 4 * 2 / 3), 96  # inner=170, unaligned
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    w1 = jnp.asarray(
        rng.standard_normal((D, 2 * inner)) * 0.05, jnp.float32
    )
    w2 = jnp.asarray(
        rng.standard_normal((inner, D)) * 0.05, jnp.float32
    )
    return x, w1, w2


def test_values_and_grads_match_reference(case):
    x, w1, w2 = case
    ref = geglu_ff_reference(x, w1, w2)
    got = fused_geglu_ff(x, w1, w2, 32, True)
    np.testing.assert_allclose(got, ref, atol=2e-6)

    def loss(fn):
        return lambda x, w1, w2: (fn(x, w1, w2) ** 2).sum()

    gr = jax.grad(loss(geglu_ff_reference), argnums=(0, 1, 2))(
        x, w1, w2
    )
    gf = jax.grad(
        lambda x, w1, w2: (fused_geglu_ff(x, w1, w2, 32, True) ** 2).sum(),
        argnums=(0, 1, 2),
    )(x, w1, w2)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


def test_leading_dims_and_row_padding(case):
    x, w1, w2 = case
    x3 = x.reshape(4, 24, -1)
    got = fused_geglu_ff(x3, w1, w2, 64, True)  # 96 rows pad to 128
    ref = geglu_ff_reference(x3, w1, w2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_sharded_rows_match_unsharded(case):
    """The custom_partitioning rule: rows sharded over 'data' must
    produce the same values as the unsharded call (weights
    replicated per the rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x, w1, w2 = case
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    xs = jax.device_put(
        x, NamedSharding(mesh, P("data", None))
    )
    with mesh:
        got = jax.jit(
            lambda x, a, b: fused_geglu_ff(x, a, b, 16, True)
        )(xs, w1, w2)
    ref = geglu_ff_reference(x, w1, w2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6
    )


def test_feedforward_module_knob(monkeypatch, rng):
    """MCA_FUSED_FF=1 must produce an IDENTICAL param tree to the
    Dense path (checkpoint/interop compatibility) and matching
    outputs/grads."""
    from mca_tpu.models.layers import FeedForward

    x = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)

    def build(mode):
        monkeypatch.setenv("MCA_FUSED_FF", mode)
        m = FeedForward(dim=32)
        params = m.init(jax.random.key(0), x)
        return m, params

    m0, p0 = build("0")
    m1, p1 = build("1")
    assert jax.tree_util.tree_structure(
        p0
    ) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b)  # same init, same seeds

    monkeypatch.setenv("MCA_FUSED_FF", "0")
    ref = m0.apply(p0, x)
    monkeypatch.setenv("MCA_FUSED_FF", "1")
    got = m1.apply(p0, x)
    np.testing.assert_allclose(got, ref, atol=2e-6)

    def loss(mode, params):
        import os

        os.environ["MCA_FUSED_FF"] = mode
        return lambda p: (
            (FeedForward(dim=32).apply(p, x)) ** 2
        ).sum()

    g0 = jax.grad(loss("0", p0))(p0)
    g1 = jax.grad(loss("1", p0))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, atol=5e-5)
