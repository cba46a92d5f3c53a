"""Stage-level attribution of the forward pass on the TPU.

profile_step.py attributes fwd/bwd/optimizer; roofline.py bounds the
attention kernel and found the NON-attention forward (~10 of 16 ms)
running ~2x above its GEMM+elementwise light speed.  This script times
each forward stage separately (K-scan chained, input-perturbed — see
PERF.md methodology) to localize that gap:

  pack   — modality encoders + fusion-token concat (_pack_sequence)
  stack  — depth x MCALayer on a random packed [B, T, D] (includes
           the flash kernel: subtract roofline's attention number)
  pool   — final norm + return-token cross-attention pooling
  loss   — the contrastive pair/FCL graph on pooled tokens

Usage: python baselines/profile_fwd_parts.py [--dataset tcga] [--k 32]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def timed_scan(fn, x0, k, n_calls=2):
    import jax

    x = jax.block_until_ready(fn(x0))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / (n_calls * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="tcga")
    ap.add_argument("--k", type=int, default=32)
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like
    from mca_tpu.models import build_model
    from mca_tpu.train import init_state, make_optimizer

    cfg = training_config_from_dict(ge._tcga_config())
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        cfg.batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)
    tx = make_optimizer(cfg, 1000)
    params = init_state(model, tx, batch, seed=0)["params"]
    K = args.k
    print(f"device={jax.devices()[0]} K={K}", flush=True)

    mask_set = model.bind(params).mask_set
    t = mask_set.seq_len
    b, d = cfg.batch_size, get_model_config(cfg)["dim"]
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (b, t, d), jnp.bfloat16) * 0.1
    pad0 = jnp.zeros((b, t), bool)

    times = {}

    # ---- full forward (reference point) --------------------------------
    @partial(jax.jit, donate_argnums=0)
    def full_fwd(carry, _=None):
        def body(c, _):
            out = model.apply(params, batch)
            return c * (1.0 + 1e-12 * out["loss"]), None

        return jax.lax.scan(body, carry, None, length=K)[0]

    times["full_fwd"] = timed_scan(full_fwd, jnp.float32(1.0), K)

    # ---- pack: encoders + fusion concat --------------------------------
    def pack_fn(m, bch):
        x, padding, sm = m._pack_sequence(bch, True)
        return (
            x.astype(jnp.float32).sum()
            + padding.sum()
            + sum(v.sum() for v in sm.values())
        )

    @partial(jax.jit, donate_argnums=0)
    def pack_chain(carry, _=None):
        def body(c, _):
            s = model.apply(params, batch, method=pack_fn)
            return c * (1.0 + 1e-12 * s), None

        return jax.lax.scan(body, carry, None, length=K)[0]

    times["pack"] = timed_scan(pack_chain, jnp.float32(1.0), K)

    # ---- stack: depth x MCALayer on random activations ------------------
    def stack_fn(m, x, padding):
        am = m.mask_set.attn_mask
        for layer in m.layers:
            x = layer(x, am, padding)
        return x

    @partial(jax.jit, donate_argnums=0)
    def stack_chain(x, _=None):
        def body(c, _):
            y = model.apply(params, c, pad0, method=stack_fn)
            return (c + y * 1e-6).astype(c.dtype), None

        return jax.lax.scan(body, x, None, length=K)[0]

    times["stack"] = timed_scan(stack_chain, x0.copy(), K)

    # ---- pool: final norm + return-token cross-attention ----------------
    def pool_fn(m, x, padding):
        x = m.final_norm(x.astype(jnp.float32))
        bsz = x.shape[0]
        ret = jnp.broadcast_to(
            m.return_tokens[None], (bsz,) + m.return_tokens.shape
        )
        pooled = (
            m.attn_pool(
                ret,
                context=x,
                attn_mask=jnp.asarray(m.mask_set.pool_mask),
                key_padding_mask=padding,
            )
            + ret
        )
        return pooled

    @partial(jax.jit, donate_argnums=0)
    def pool_chain(x, _=None):
        def body(c, _):
            p = model.apply(params, c, pad0, method=pool_fn)
            return (
                c * (1.0 + 1e-12 * p.astype(jnp.float32).sum())
            ).astype(c.dtype), None

        return jax.lax.scan(body, x, None, length=K)[0]

    times["pool"] = timed_scan(pool_chain, x0.copy(), K)

    # ---- loss graph on pooled tokens ------------------------------------
    pooled0 = model.apply(params, x0, pad0, method=pool_fn)
    sample_mask = {
        m: jnp.ones((b,), bool) for m in cfg.modality_config.keys()
    }

    def loss_fn(m, pooled, sm):
        return m.loss(pooled, sm, no_loss=False)["loss"]

    @partial(jax.jit, donate_argnums=0)
    def loss_chain(p, _=None):
        def body(c, _):
            lv = model.apply(params, c, sample_mask, method=loss_fn)
            return (c * (1.0 + 1e-12 * lv)).astype(c.dtype), None

        return jax.lax.scan(body, p, None, length=K)[0]

    times["loss"] = timed_scan(loss_chain, pooled0 + 0.0, K)

    d_ms = {k2: round(v2 * 1e3, 3) for k2, v2 in times.items()}
    d_ms["sum_of_parts"] = round(
        d_ms["pack"] + d_ms["stack"] + d_ms["pool"] + d_ms["loss"], 3
    )
    print(json.dumps({"dataset": args.dataset, "ms": d_ms}, indent=1))


if __name__ == "__main__":
    main()
