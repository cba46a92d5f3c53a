"""Component-level timing of the canonical train step on the TPU.

Times K-step scans of nested subsets of the step so the deltas
attribute wall time to each component (all-identical-args caching is
avoided by chaining state through the scan, see PERF.md):

  full       = fwd + loss graph + bwd + AdamW
  fwd_loss   = fwd + loss graph (value only)
  fwd_only   = fwd, no loss graph (no_loss=True, sum(pooled) reduced)
  fwd_bwd    = grad of sum(pooled) — transformer fwd+bwd, no loss graph
  opt_only   = AdamW update on frozen grads

Usage:  python baselines/profile_step.py [--k 32] [--dataset tcga]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, state, xs, k, label, n_calls=2):
    """Compile + time a (state, xs) -> state chained scan."""
    state = jax.block_until_ready(fn(state, xs))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = fn(state, xs)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (n_calls * k)
    print(f"{label:>10}: {dt * 1000:8.2f} ms/step", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dataset", default="tcga")
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size (0 = canonical 8)")
    args = ap.parse_args()

    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like
    from mca_tpu.models import build_model
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_flat_apparatus,
        make_optimizer,
    )

    cfg = training_config_from_dict(
        ge._tcga_config(
            **({"batch_size": args.batch} if args.batch else {})
        )
    )
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        cfg.batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)

    tx = make_optimizer(cfg, 1000)
    schedule = hf_lr_schedule("cosine", cfg.lr, 10, 1000)
    state0 = init_state(model, tx, batch, seed=0)
    flat0, unravel, flat_tx = make_flat_apparatus(cfg, 1000, state0["params"])
    opt_state0 = flat_tx.init(flat0)
    K = args.k
    print(f"device={jax.devices()[0]} K={K}", flush=True)

    # ---- full step (fwd+loss+bwd+opt), flat state --------------------
    @partial(jax.jit, donate_argnums=0)
    def full(carry, _):
        def body(c, _):
            flat, opt, step = c

            def lf(fl):
                return model.apply(unravel(fl), batch)["loss"]

            loss, g = jax.value_and_grad(lf)(flat)
            upd, opt = flat_tx.update(g, opt, flat)
            import optax

            return (optax.apply_updates(flat, upd), opt, step + 1), loss

        c, losses = jax.lax.scan(body, carry, None, length=K)
        return c

    # ---- fwd + loss graph, value only --------------------------------
    @partial(jax.jit, donate_argnums=0)
    def fwd_loss(carry, _):
        def body(c, _):
            # chain: perturb the param vector by the loss value so the
            # next step's inputs differ (defeats result caching)
            loss = model.apply(unravel(c), batch)["loss"]
            return c * (1.0 + 1e-12 * loss), loss

        c, _ = jax.lax.scan(body, carry, None, length=K)
        return c

    # ---- fwd only (no loss graph) -------------------------------------
    def pooled_sum(fl):
        out = model.apply(unravel(fl), batch, no_loss=True)
        leaves = [
            v
            for k, v in out.items()
            if k not in ("modality_sample_mask", "losses")
            and hasattr(v, "sum")
        ]
        return sum(x.astype(jnp.float32).sum() for x in leaves)

    @partial(jax.jit, donate_argnums=0)
    def fwd_only(carry, _):
        def body(c, _):
            s = pooled_sum(c)
            return c * (1.0 + 1e-12 * s), s

        c, _ = jax.lax.scan(body, carry, None, length=K)
        return c

    # ---- fwd + bwd, no loss graph --------------------------------------
    @partial(jax.jit, donate_argnums=0)
    def fwd_bwd(carry, _):
        def body(c, _):
            s, g = jax.value_and_grad(pooled_sum)(c)
            return c * (1.0 + 1e-12 * s) + 0.0 * g, s

        c, _ = jax.lax.scan(body, carry, None, length=K)
        return c

    # ---- optimizer only -------------------------------------------------
    g0 = jnp.ones_like(flat0) * 1e-6

    @partial(jax.jit, donate_argnums=0)
    def opt_only(carry, _):
        def body(c, _):
            import optax

            flat, opt = c
            upd, opt = flat_tx.update(g0, opt, flat)
            return (optax.apply_updates(flat, upd), opt), 0.0

        c, _ = jax.lax.scan(body, carry, None, length=K)
        return c

    times = {}
    times["fwd_only"] = timed_scan(
        fwd_only, flat0 + 0.0, None, K, "fwd_only"
    )
    times["fwd_loss"] = timed_scan(
        fwd_loss, flat0 + 0.0, None, K, "fwd_loss"
    )
    times["fwd_bwd"] = timed_scan(fwd_bwd, flat0 + 0.0, None, K, "fwd_bwd")
    times["opt_only"] = timed_scan(
        opt_only, (flat0 + 0.0, opt_state0), None, K, "opt_only"
    )
    times["full"] = timed_scan(
        full,
        (flat0 + 0.0, flat_tx.init(flat0), jnp.zeros((), jnp.int32)),
        None,
        K,
        "full",
    )

    d = {k: v * 1000 for k, v in times.items()}
    print(json.dumps({
        "ms": {k: round(v, 2) for k, v in d.items()},
        "loss_graph_fwd_ms": round(d["fwd_loss"] - d["fwd_only"], 2),
        "bwd_ms": round(d["fwd_bwd"] - d["fwd_only"], 2),
        "loss_graph_total_ms": round(
            d["full"] - d["fwd_bwd"] - d["opt_only"], 2
        ),
    }, indent=2), flush=True)

    if args.trace_dir:
        from mca_tpu.utils.logging import trace_context

        with trace_context(args.trace_dir):
            jax.block_until_ready(
                full(
                    (flat0 + 0.0, flat_tx.init(flat0),
                     jnp.zeros((), jnp.int32)),
                    None,
                )
            )
        print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
