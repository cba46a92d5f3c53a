"""Device-side eval-epoch metrics must match the numpy accumulators
(which are themselves pinned to the reference's Wang&Isola formulas)."""

import jax.numpy as jnp
import numpy as np

from mca_tpu.eval_metrics import (
    epoch_metrics,
    masked_alignment,
    masked_uniformity,
)
from mca_tpu.metrics import MetricAccumulator, alignment, uniformity


def test_masked_uniformity_matches_numpy(rng):
    x = rng.normal(size=(40, 16)).astype(np.float32)
    m = rng.random(40) < 0.7
    for norm in (False, True):
        ours = float(masked_uniformity(jnp.asarray(x), jnp.asarray(m), norm=norm))
        ref = uniformity(x[m], norm=norm)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_masked_alignment_matches_numpy(rng):
    x = rng.normal(size=(40, 16)).astype(np.float32)
    y = rng.normal(size=(40, 16)).astype(np.float32)
    m = rng.random(40) < 0.6
    for norm in (False, True):
        ours = float(
            masked_alignment(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(m), norm=norm
            )
        )
        ref = alignment(x[m], y[m], norm=norm)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_epoch_metrics_matches_accumulators(rng):
    """Mixed single-step + scanned chunks reduce to the same epoch
    metrics the per-chunk host accumulation produced in round 1."""
    E, B, D = 3, 4, 8
    emb_names = ("a", "b", "fusion")
    mask_names = ("a", "b")
    loss_names = ("a|b", "fcl")

    # one scanned chunk [K=2,...] + one single-step chunk
    chunks = []
    for k in (2, None):
        shape = lambda *s: ((k,) + s) if k else s
        chunks.append(
            (
                rng.normal(size=shape(E, B, D)).astype(np.float32),
                (rng.random(shape(len(mask_names), B)) < 0.7),
                rng.normal(size=shape()).astype(np.float32) + 5,
                rng.normal(size=shape(len(loss_names))).astype(np.float32),
            )
        )
    losses, lvs, unif, align, counts = epoch_metrics(
        tuple(jnp.asarray(c[0]) for c in chunks),
        tuple(jnp.asarray(c[1]) for c in chunks),
        tuple(jnp.asarray(c[2]) for c in chunks),
        tuple(jnp.asarray(c[3]) for c in chunks),
        emb_names=emb_names,
        mask_names=mask_names,
        fusion=True,
    )
    assert losses.shape == (3,) and lvs.shape == (3, 2)

    # reproduce with the numpy accumulators over the same stream
    acc_u = {k: MetricAccumulator() for k in ("a", "b", "fusion")}
    acc_a = {k: MetricAccumulator() for k in ("a", "b")}
    for emb, msk, _, _ in chunks:
        emb = emb if emb.ndim == 4 else emb[None]
        msk = msk if msk.ndim == 3 else msk[None]
        for t in range(emb.shape[0]):
            by_e = dict(zip(emb_names, emb[t]))
            by_m = dict(zip(mask_names, msk[t]))
            acc_u["fusion"].update(by_e["fusion"])
            for k in mask_names:
                acc_u[k].update(by_e[k][by_m[k]])
                acc_a[k].update(by_e[k][by_m[k]], by_e["fusion"][by_m[k]])
    for k in ("a", "b", "fusion"):
        for norm, variant in ((False, "raw"), (True, "norm")):
            np.testing.assert_allclose(
                float(unif[k][variant]),
                acc_u[k].compute_uniformity(norm=norm),
                rtol=1e-4,
                err_msg=f"uniformity {k} {variant}",
            )
    for k in ("a", "b"):
        for norm, variant in ((False, "raw"), (True, "norm")):
            np.testing.assert_allclose(
                float(align[k][variant]),
                acc_a[k].compute_alignment(norm=norm),
                rtol=1e-4,
                err_msg=f"alignment {k} {variant}",
            )
    assert int(counts["fusion"]) == 12
