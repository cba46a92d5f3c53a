"""Is the 0.72%-at-step-384 parity drift fp32 rounding, or semantics?

The cross-implementation parity run (baselines/parity_run.py,
PARITY_RUN.md) measured 0.72% relative loss drift at step 384 between
our trajectory and the torch reference, explained as fp32 op-order
rounding — but the explanation was asserted, not demonstrated
(VERDICT r4 weak item 5).  This arm demonstrates it: run OUR pipeline
TWICE at the exact parity-run scale and batch sequence — arm A from
the transplant-identical init, arm B from the same init with every
parameter perturbed by ONE part in 2^23 (1 ulp of the fp32 mantissa,
the smallest representable relative difference) — and measure the
same per-step relative loss drift.

If a 1-ulp init perturbation grows to the same order of drift by step
384, then ANY fp32 rounding difference (op order, fma contraction,
matmul tiling — all of which legitimately differ across frameworks)
explains the observed divergence, and the 6-step rtol-2e-3 bit-level
pin plus probe-metric agreement (<=0.6%) remain the meaningful parity
evidence.  If instead the 1-ulp arm stays orders of magnitude tighter,
the cross-impl drift would point at a semantic difference and the
parity claim would need re-examination.

CPU, fp32, HIGHEST matmul precision — identical numerics discipline
to parity_run.  Appends one JSON line to --out.

Usage: python baselines/parity_drift_sensitivity.py [--scale 1.0]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import parity_run as P  # noqa: E402  (forces cpu + highest precision)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mca_tpu.config import (  # noqa: E402
    get_model_config,
    training_config_from_dict,
)
from mca_tpu.data.collators import MultimodalCollator  # noqa: E402
from mca_tpu.data.synthetic import tiny_config  # noqa: E402
from mca_tpu.models import build_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="fraction of the 384 parity steps to run")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "parity_drift_sensitivity.jsonl",
        ),
    )
    args = ap.parse_args()

    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=P.WIDTHS,
            batch_size=P.BATCH,
            hidden=P.DIM,
            heads=P.HEADS,
            dim_head=P.DIM_HEAD,
            layers=P.LAYERS,
            num_fusion_tokens=P.FUSION,
            lr=P.LR,
            num_warmup_steps=P.WARMUP,
        )
    )
    cfg.clip = P.CLIP
    mc = get_model_config(cfg)
    collator = MultimodalCollator(
        cfg.modality_config.to_plain(), labels="Labels"
    )
    train_s, _ = P.build_dataset()
    rng = np.random.default_rng(42)  # same batch-order discipline
    batches = []
    for ep in range(P.EPOCHS):
        order = rng.permutation(len(train_s))
        for b in P.collate_all(train_s, collator, P.BATCH, order):
            batches.append((P.split_labels(b)))
    n_steps = max(8, int(len(batches) * args.scale))
    batches = batches[:n_steps]

    model = build_model(mc)
    # HOST copies: our_train's jitted step donates its state, so a
    # device tree would be deleted by the first arm and crash the next
    params0 = jax.tree.map(
        np.asarray,
        jax.jit(model.init)(
            jax.random.key(0), jax.tree.map(jnp.asarray, batches[0][0])
        ),
    )

    def run_batches(params_init, bs):
        t0 = time.time()
        _, losses = P.our_train(cfg, model, params_init, bs, n_steps)
        print(f"arm done in {time.time() - t0:.0f}s", flush=True)
        return np.asarray(losses, np.float64)

    def run(params_init):
        return run_batches(params_init, batches)

    ulp = np.float32(1.0) + np.float32(2.0) ** -23  # exactly 1 ulp
    perturbed = jax.tree.map(
        lambda p: (p * ulp).astype(p.dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params0,
    )

    la = run(params0)
    lb = run(perturbed)
    rel = np.abs(la - lb) / np.maximum(np.abs(la), 1e-9)

    # Second arm: 'highest' vs 'default' fp32 matmul precision — on
    # CPU these lower IDENTICALLY (measured: exactly 0.0 drift), so
    # the arm is a negative control for the harness, not evidence.
    jax.config.update("jax_default_matmul_precision", "default")
    lc = run(params0)
    jax.config.update("jax_default_matmul_precision", "highest")
    rel_mm = np.abs(la - lc) / np.maximum(np.abs(la), 1e-9)

    # Third arm — the operator-level model: cross-framework per-op
    # numeric differences (erf/exp polynomials, softmax/LayerNorm
    # reduction arrangements, matmul accumulation order) are
    # ~1e-6..1e-4 RELATIVE, injected EVERY step, not once at init.
    # Proxy: each step's batch 'values' carry fresh +-delta relative
    # noise (delta = 1e-5); the resulting drift at step 384 measures
    # the trajectory's amplification of sustained per-step
    # perturbation at that scale.
    delta = 1e-5
    nrng = np.random.default_rng(123)

    def perturb_values(v):
        v = np.asarray(v, np.float32)
        noise = (
            1.0 + delta * nrng.choice([-1.0, 1.0], size=v.shape)
        ).astype(np.float32)
        # never touch the -10000 pad sentinel: the encoders key
        # padding off exact equality
        return np.where(v == -10000.0, v, v * noise)

    noisy = []
    for batch, y in batches:
        nb = {
            m: {
                k: perturb_values(v) if k == "values" else v
                for k, v in fields.items()
            }
            for m, fields in batch.items()
        }
        noisy.append((nb, y))
    ld = run_batches(params0, noisy)
    rel_ps = np.abs(la - ld) / np.maximum(np.abs(la), 1e-9)
    # the parity run reported drift over trajectory WINDOWS; report
    # matching aggregates plus the end-point value
    rec = {
        "n_steps": int(n_steps),
        "perturbation": "1 ulp (x(1+2^-23)) on every fp param",
        "rel_drift_step6": float(rel[min(5, n_steps - 1)]),
        "rel_drift_last": float(rel[-1]),
        "rel_drift_last32_mean": float(rel[-32:].mean()),
        "rel_drift_max": float(rel.max()),
        "matmul_precision_drift_last32_mean": float(
            rel_mm[-32:].mean()
        ),
        "matmul_precision_drift_max": float(rel_mm.max()),
        "per_step_1e-5_drift_last32_mean": float(rel_ps[-32:].mean()),
        "per_step_1e-5_drift_max": float(rel_ps.max()),
        "cross_impl_reference_pct_at_384": 0.72,
        "conclusion": (
            "sustained-per-step-op-noise-explains-drift"
            if rel_ps[-32:].mean() * 100 > 0.72 / 10
            else (
                "init-rounding-explains-drift"
                if rel[-32:].mean() * 100 > 0.72 / 10
                else "drift-NOT-explained-by-tested-perturbations"
            )
        ),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
