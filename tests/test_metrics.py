"""Metric-suite unit tests against hand-computed values (and torch
reference formulas for alignment/uniformity)."""

import numpy as np
import pytest

from mca_tpu.metrics import (
    MetricAccumulator,
    alignment,
    binary_auprc,
    binary_auroc,
    binary_metrics,
    multiclass_metrics,
    pearson_r,
    rank_metrics,
    uniformity,
)


def test_alignment_zero_for_identical():
    x = np.random.default_rng(0).normal(size=(10, 4))
    assert alignment(x, x) == 0.0


def test_alignment_known_value():
    x = np.array([[1.0, 0.0]])
    y = np.array([[0.0, 1.0]])
    # normalised distance^2 between orthogonal unit vectors = 2
    np.testing.assert_allclose(alignment(x, y, alpha=2), 2.0)


def test_uniformity_matches_formula(rng):
    x = rng.normal(size=(6, 4))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    # direct O(n^2) formula
    vals = []
    for i in range(6):
        for j in range(i + 1, 6):
            vals.append(
                np.exp(-2 * np.sum((xn[i] - xn[j]) ** 2))
            )
    np.testing.assert_allclose(
        uniformity(x, t=2, norm=True), np.log(np.mean(vals)), rtol=1e-6
    )


def test_metric_accumulator(rng):
    acc = MetricAccumulator()
    x = rng.normal(size=(8, 4))
    y = rng.normal(size=(8, 4))
    acc.update(x[:4], y[:4])
    acc.update(x[4:], y[4:])
    np.testing.assert_allclose(
        acc.compute_alignment(norm=True), alignment(x, y, norm=True)
    )
    np.testing.assert_allclose(
        acc.compute_uniformity(norm=True), uniformity(x, norm=True)
    )
    acc.reset()
    assert not acc


def test_rank_metrics_perfect_retrieval():
    emb = np.eye(8, 16)
    m = rank_metrics(emb, emb)
    assert m["median_rank"] == 0.0
    assert m["r1"] == m["r5"] == m["r10"] == 1.0


def test_rank_metrics_shifted():
    # embeddings[i] closest to targets[(i+1) % n] -> rank 1 for all
    tgt = np.eye(8, 16)
    emb = np.roll(tgt, -1, axis=0) + 0.01 * tgt
    m = rank_metrics(emb, tgt)
    assert m["r1"] == 0.0
    assert m["r5"] == 1.0
    assert m["median_rank"] == 1.0


def test_rank_metrics_mask():
    tgt = np.eye(6, 8)
    m = rank_metrics(tgt, tgt, mask=np.array([1, 1, 0, 0, 1, 1], bool))
    assert m["r1"] == 1.0


def test_binary_auroc_known():
    scores = np.array([0.1, 0.4, 0.35, 0.8])
    target = np.array([0, 0, 1, 1])
    # hand-computed: pairs (pos, neg): (0.35 vs 0.1 ok, 0.35 vs 0.4 no,
    # 0.8 vs both ok) -> 3/4
    np.testing.assert_allclose(
        binary_auroc(scores, target), 0.75
    )


def test_binary_auprc_known():
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    target = np.array([1, 0, 1, 0])
    # precision at hits: 1/1 and 2/3 -> AP = (1 + 2/3)/2
    np.testing.assert_allclose(
        binary_auprc(scores, target), (1 + 2 / 3) / 2
    )


def test_binary_metrics_counts():
    logits = np.array([2.0, 2.0, -2.0, -2.0, 2.0])
    target = np.array([1, 0, 0, 1, 1])
    m = binary_metrics(logits, target)
    # pred = [1,1,0,0,1]; tp=2 fp=1 tn=1 fn=1
    assert m["accuracy"] == pytest.approx(3 / 5)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["specificity"] == pytest.approx(1 / 2)
    assert m["f1"] == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    np.testing.assert_array_equal(m["cm"], [[1, 1], [1, 2]])


def test_multiclass_metrics_perfect():
    logits = np.eye(4)[np.array([0, 1, 2, 3, 0, 1])] * 10
    target = np.array([0, 1, 2, 3, 0, 1])
    m = multiclass_metrics(logits, target, 4)
    assert m["accuracy"] == 1.0
    assert m["f1"] == 1.0
    assert m["auroc"] == 1.0


def test_pearson_r():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(pearson_r(x, 2 * x + 1), 1.0)
    np.testing.assert_allclose(pearson_r(x, -x), -1.0)
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=1000), rng.normal(size=1000)
    assert abs(pearson_r(a, b)) < 0.1


def test_get_rank_metrics_alias():
    from mca_tpu.metrics import get_rank_metrics, rank_metrics

    assert get_rank_metrics is rank_metrics


def test_probe_mse_loss():
    import jax.numpy as jnp

    from mca_tpu.probe import make_loss_fn

    fn = make_loss_fn("MSE")
    val = float(
        fn(jnp.asarray([[1.0], [2.0]]), jnp.asarray([0.0, 0.0]))
    )
    assert val == pytest.approx((1 + 4) / 2)


def test_throughput_meter_burst_window():
    """Scanned launches stamp K steps in one burst; the meter must
    report 0 until its window spans at least two launches (regression:
    a single-burst window produced absurd rates from a ~us dt)."""
    import time as _time
    from unittest import mock

    from mca_tpu.utils.logging import ThroughputMeter

    m = ThroughputMeter(tokens_per_step=100, warmup_steps=2, window=64)
    t = [0.0]
    with mock.patch.object(_time, "perf_counter", lambda: t[0]):
        from mca_tpu.utils import logging as L

        with mock.patch.object(L.time, "perf_counter", lambda: t[0]):
            for _ in range(32):  # burst 1 (same timestamp)
                m.step()
            assert m.tokens_per_sec == 0.0  # single burst: no rate
            t[0] = 1.0
            for _ in range(32):  # burst 2, one second later
                m.step()
            rate = m.tokens_per_sec
            # burst-merged stamps: exactly the 32 steps of burst 2
            # completed in the 1s window (per-step stamps used to
            # count up to K-1 steps from before the window start)
            assert rate == pytest.approx(3200.0)
