"""A/B the fused GEGLU-FF Pallas kernel against the XLA path on-chip.

The forward XLA stack measures 1.29x of its platform-serial bound
(PERF.md round 4) and its largest non-bound term is the GEGLU inner
activation's HBM round-trips (~166 MB/layer).  This measures one FF
layer at canonical scale ([8*2548, 512] rows, inner 1365, bf16) for
both implementations, fwd-only and fwd+bwd, with the chained
full-minus-half methodology.

Usage: python baselines/ab_fused_ff.py [--k 64] [--bm 256]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--bm", type=int, default=256)
    ap.add_argument("--n", type=int, default=8 * 2548)
    ap.add_argument("--dim", type=int, default=512)
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mca_tpu.ops.fused_ff import (
        fused_geglu_ff,
        geglu_ff_reference,
    )

    D = args.dim
    inner = int(D * 4 * 2 / 3)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((args.n, D)) * 0.1, jnp.bfloat16
    )
    w1 = jnp.asarray(
        rng.standard_normal((D, 2 * inner)) * 0.02, jnp.bfloat16
    )
    w2 = jnp.asarray(
        rng.standard_normal((inner, D)) * 0.02, jnp.bfloat16
    )

    impls = {
        "xla": lambda x: geglu_ff_reference(x, w1, w2),
        "fused": lambda x: fused_geglu_ff(x, w1, w2, args.bm, False),
    }

    def fwd_chain(f, length):
        @partial(jax.jit, donate_argnums=0)
        def run(x):
            def body(c, _):
                o = f(c)
                return (c + o * jnp.bfloat16(1e-3)).astype(c.dtype), None

            return jax.lax.scan(body, x, None, length=length)[0]

        return run

    def bwd_chain(f, length):
        def loss(x):
            return f(x).astype(jnp.float32).sum()

        @partial(jax.jit, donate_argnums=0)
        def run(x):
            def body(c, _):
                g = jax.grad(loss)(c)
                return (c + g * jnp.bfloat16(1e-6)).astype(c.dtype), None

            return jax.lax.scan(body, x, None, length=length)[0]

        return run

    def timed(run, n_calls=3):
        x = jax.block_until_ready(run(x0.copy()))
        t0 = time.perf_counter()
        for _ in range(n_calls):
            x = run(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / n_calls

    print(f"device={jax.devices()[0]} n={args.n} inner={inner}", flush=True)
    out = {}
    for name, f in impls.items():
        r = {}
        for dirn, chain in (("fwd", fwd_chain), ("fwd_bwd", bwd_chain)):
            t_full = timed(chain(f, args.k))
            t_half = timed(chain(f, args.k // 2))
            r[dirn] = (
                (t_full - t_half) / (args.k - args.k // 2) * 1e3
            )
        r["bwd"] = r["fwd_bwd"] - r["fwd"]
        out[name] = {k2: round(v2, 4) for k2, v2 in r.items()}
        print(f"  {name}: {out[name]}", flush=True)

    # on-chip numerics: fused must match XLA at the same dtype
    ref = geglu_ff_reference(x0, w1, w2).astype(jnp.float32)
    got = fused_geglu_ff(x0, w1, w2, args.bm, False).astype(jnp.float32)
    err = float(
        jnp.abs(ref - got).max() / jnp.abs(ref).mean()
    )
    rec = {
        "per_layer_ms": out,
        "bm": args.bm,
        "max_err_over_mean_abs": round(err, 5),
        "fwd_gain_ms": round(out["xla"]["fwd"] - out["fused"]["fwd"], 4),
        "bwd_gain_ms": round(out["xla"]["bwd"] - out["fused"]["bwd"], 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ab_fused_ff.jsonl"), "a"
    ) as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
