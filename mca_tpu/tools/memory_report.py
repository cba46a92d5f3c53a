"""Compile-time memory accounting for a training configuration.

``python -m mca_tpu.tools.memory_report <config.yaml> [--batch B]
[--grad-accum N] [--remat] [--json]``

AOT-lowers and compiles ONE train step for the config (no data, no
device state — shapes come from ``jax.eval_shape``) and prints XLA's
own memory analysis of the compiled executable: argument / output /
temp (activations + workspace) / generated-code bytes.  This is the
planning tool the reference lacks (its OOM story is try-it-and-see):
it answers "does this config fit a chip?" and "what do `remat:` /
`grad_accum:` buy me?" without touching hardware — the analysis is
exact for the backend it compiles for.

Reference counterpart: none (torch reports allocator stats only after
running, ref train_accel_gpu.py has no memory planning).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def step_memory_analysis(
    config, batch=None, grad_accum: int = 1, remat=None
):
    """Compile the config's train step abstractly; return XLA's
    memory analysis as a plain dict (bytes).

    ``batch`` defaults to a synthetic batch at the config's
    ``batch_size``; ``remat`` overrides the config's flag.  The step
    compiled is the single-batch tree-state step — the flat/scan
    launch wraps the same per-step computation, so temp (activation)
    sizes are representative.
    """
    from mca_tpu.config import get_model_config
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like
    from mca_tpu.models import build_model
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    if remat is not None:
        config = type(config).from_dict(
            dict(config.to_plain(), remat=bool(remat))
        )
    if batch is None:
        mod_cfg = config.modality_config.to_plain()
        if any(
            "embedded" in c.get("type", "") for c in mod_cfg.values()
        ):
            samples = make_cmu_like(
                config.batch_size,
                shapes={
                    m: (e["input_size"], e["max_tokens"])
                    for m, e in config.encoder_configs.to_plain().items()
                },
                p_missing=0.25,
                seed=0,
            )
        else:
            samples = make_tcga_like(
                config.batch_size,
                widths={
                    m: c["pad_len"] for m, c in mod_cfg.items()
                },
                p_missing=0.25,
                seed=0,
            )
        batch = MultimodalCollator(mod_cfg)(samples)
    batch = jax.tree.map(jnp.asarray, batch)
    mc = get_model_config(config)
    model = build_model(mc)
    tx = make_optimizer(config, 1000)
    schedule = hf_lr_schedule(
        config.lr_scheduler_type, config.lr,
        config.num_warmup_steps, 1000,
    )
    state_shapes = jax.eval_shape(
        lambda b: init_state(model, tx, b, seed=0), batch
    )
    step = make_train_step(model, tx, schedule, n_accum=grad_accum)
    compiled = step.lower(state_shapes, batch).compile()
    ma = compiled.memory_analysis()
    fields = (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    )
    out = {}
    for f in fields:
        v = getattr(ma, f, None)
        if v is not None:
            out[f] = int(v)
    out["peak_estimate_bytes"] = (
        out.get("argument_size_in_bytes", 0)
        + out.get("output_size_in_bytes", 0)
        + out.get("temp_size_in_bytes", 0)
        - out.get("alias_size_in_bytes", 0)
    )
    return out


def _fmt(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n}"


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=0,
                   help="override batch_size")
    p.add_argument("--grad-accum", type=int, default=0,
                   help="override grad_accum")
    p.add_argument("--remat", action="store_true",
                   help="force remat on")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from mca_tpu.config import training_config

    # pure inspection: never create a training_output_* dir
    config = training_config(args.config, make_output_dir=False)
    if args.batch:
        config.batch_size = args.batch
    n_accum = args.grad_accum or int(config.get("grad_accum", 1))
    out = step_memory_analysis(
        config,
        grad_accum=n_accum,
        remat=True if args.remat else None,
    )
    out["backend"] = jax.default_backend()
    out["batch_size"] = int(config.batch_size)
    out["grad_accum"] = n_accum
    if args.json:
        print(json.dumps(out))
        return
    print(f"backend: {out['backend']}  batch: {out['batch_size']}  "
          f"grad_accum: {out['grad_accum']}")
    for k, v in out.items():
        if isinstance(v, int):
            print(f"  {k:32s} {_fmt(v):>12s}")


if __name__ == "__main__":
    main()
