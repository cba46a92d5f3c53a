"""Batch-inference (embedding extraction) throughput at canonical scale.

Measures the PRODUCTION inference launch — ``mca_tpu.infer``'s packed
forward scan (K forwards per executable, few-buffer outputs; the same
``make_packed_forward``/``make_forward_scan`` the CLI runs) — on the
real chip, the inference analogue of bench.py's training headline.
The reference's ``infer_accel_gpu.py`` is the per-batch torch loop
this replaces.

Env: BENCH_DATASET=tcga|cmu, BENCH_BATCH (default 8), BENCH_K (32),
INFER_REPEATS (4).  Appends one JSON line per run to
baselines/measure_infer_results.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like
    from mca_tpu.infer import make_packed_forward, split_output_keys
    from mca_tpu.models import build_model

    dataset = os.environ.get("BENCH_DATASET", "tcga")
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    K = int(os.environ.get("BENCH_K", "32"))
    repeats = int(os.environ.get("INFER_REPEATS", "4"))

    overrides = {"batch_size": batch_size}
    if dataset == "cmu":
        from mca_tpu.data.synthetic import CMU_MODALITIES as shapes

        overrides["encoder_configs"] = {
            m: {
                "type": "EmbeddedSequenceEncoder",
                "input_size": d,
                "max_tokens": t,
            }
            for m, (d, t) in shapes.items()
        }
        overrides["modality_config"] = {
            m: {
                "type": "embedded_sequence",
                "pad_len": t,
                "data_col_name": "data",
                "pad_token": -10000,
                "embedding_size": d,
            }
            for m, (d, t) in shapes.items()
        }
        overrides["bimodal_contrastive"] = False
        overrides["non_fusion_fcl"] = False
    cfg = training_config_from_dict(ge._tcga_config(**overrides))
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    if dataset == "cmu":
        samples = make_cmu_like(
            cfg.batch_size,
            shapes={
                m: (e["input_size"], e["max_tokens"])
                for m, e in cfg.encoder_configs.to_plain().items()
            },
            p_missing=0.25,
            seed=0,
        )
    else:
        samples = make_tcga_like(
            cfg.batch_size, widths=widths, p_missing=0.25, seed=0
        )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)

    params = jax.jit(model.init)(jax.random.key(0), batch)
    shapes_out = jax.eval_shape(
        lambda p, b: model.apply(p, b), params, batch
    )
    emb_keys, mask_keys = split_output_keys(shapes_out)
    packed_forward = make_packed_forward(model, emb_keys, mask_keys)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )

    # Timed variant of the production forward_scan: identical-args
    # launches return CACHED results on the remote relay (verify-skill
    # pitfall; the first run of this script measured 5.9e9 "tok/s"),
    # so chain a loss-dependent perturbation of the params through
    # each launch — same executable, different argument values every
    # call.  The scale must be REPRESENTABLE in fp32: 1 + 1e-12
    # rounds to exactly 1.0 (bit-identical params, cache hit — the
    # second failure mode this script hit); 1e-6 * a O(10) loss gives
    # ~1e-5 relative drift per launch, irrelevant to timing.
    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def timed_scan(params, batches):
        def body(carry, b):
            return carry, packed_forward(params, b)

        _, outs = jax.lax.scan(body, None, batches)
        eps = 1e-6 * outs[2].mean().astype(jnp.float32)
        params = jax.tree.map(
            lambda p: p * (1.0 + eps).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
        )
        return params, outs

    # compile + warmup (first dispatch pays the relay tax, PERF.md)
    params, out = timed_scan(params, stacked)
    float(jax.device_get(out[2]).mean())
    params, out = timed_scan(params, stacked)
    float(jax.device_get(out[2]).mean())

    tokens_per_batch = sum(widths.values()) + int(
        cfg.num_fusion_tokens
    )
    # Per-launch device_get of the [K] losses (a few hundred bytes)
    # drains the relay pipeline — block_until_ready alone measured
    # 0.000s on back-to-back chained launches here, while the same
    # launches interposed with a get measure the true ~19 ms/forward
    # (= profile_step's fwd_only).  The get is timed IN the loop, so
    # the number is honest end-to-end launch time.
    per_launch = []
    t0 = time.perf_counter()
    for _ in range(repeats):
        params, out = timed_scan(params, stacked)
        float(jax.device_get(out[2]).mean())
        per_launch.append(time.perf_counter() - t0 - sum(per_launch))
    dt = time.perf_counter() - t0
    sys.stderr.write(
        "per-launch s: "
        + " ".join(f"{x:.3f}" for x in per_launch)
        + "\n"
    )
    n_fwd = repeats * K
    ms_per_fwd = 1e3 * dt / n_fwd
    tok_s = n_fwd * batch_size * tokens_per_batch / dt
    samples_s = n_fwd * batch_size / dt

    line = {
        "metric": f"{dataset} batch-inference (packed forward scan)",
        "tokens_per_sec": round(tok_s, 0),
        "samples_per_sec": round(samples_s, 1),
        "ms_per_forward": round(ms_per_fwd, 2),
        "batch": batch_size,
        "K": K,
        "repeats": repeats,
        "device": jax.devices()[0].device_kind,
        "emb_keys": len(emb_keys),
    }
    print(json.dumps(line))
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "measure_infer_results.jsonl",
        ),
        "a",
    ) as f:
        f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
