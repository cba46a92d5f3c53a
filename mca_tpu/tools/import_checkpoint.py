"""Import a reference (PyTorch) checkpoint into an Orbax params dir.

Usage:
    python -m mca_tpu.tools.import_checkpoint <train_config.yaml> \
        <torch_checkpoint_path> <out_dir> [--export <file.safetensors>]

``train_config.yaml`` is the (reference-format) training config that
describes the model — the same YAML the checkpoint was trained with.
``torch_checkpoint_path`` is a ``.safetensors``/``.bin``/``.pt`` file
or an Accelerate ``save_state`` directory (ref train_accel_gpu.py:122,
:133, :187 — the formats of the README-linked pretrained checkpoints).
The result is an Orbax directory usable as ``restart:`` in our train /
infer configs.

``--export FILE`` writes the imported params back out as a
reference-named safetensors state_dict; with ``--from-orbax DIR``
instead of a torch checkpoint, it exports OUR trained params so the
reference's own scripts can load them.

``--with-optimizer`` (checkpoint must be an Accelerate ``save_state``
directory containing ``optimizer.bin``) also imports the AdamW
moments and the scheduler step, writing a full train-state checkpoint
(``<out_dir>/state``) instead of a params-only one — so a reference
training run CONTINUES mid-stream on TPU with its optimizer memory
intact (trajectory-parity-tested in tests/test_optimizer_interop.py).
``--state-mode`` picks the optimizer-state layout: ``flat`` (default —
matches the production flat single-vector training mode) or ``tree``
(``flat_state: false`` / tensor-parallel runs).  A mode mismatch at
restart falls back to params-only restore with a warning.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

logger = logging.getLogger(__name__)


def zero_batch_for(cfg):
    """A structurally-correct batch built from modality_config alone
    (collators define the batch schema; values are irrelevant for
    parameter shapes)."""
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like

    enc_types = {e["type"] for e in cfg.encoder_configs.values()}
    if enc_types & {"EmbeddedSequenceEncoder"}:
        shapes = {
            m: (int(e["input_size"]), int(e["max_tokens"]))
            for m, e in cfg.encoder_configs.items()
        }
        samples = make_cmu_like(2, shapes=shapes, seed=0)
    else:
        widths = {
            m: int(e["max_tokens"])
            for m, e in cfg.encoder_configs.items()
        }
        samples = make_tcga_like(2, widths=widths, seed=0)
    mc = (
        cfg.modality_config.to_plain()
        if hasattr(cfg.modality_config, "to_plain")
        else cfg.modality_config
    )
    return MultimodalCollator(mc)(samples)


def init_params(cfg):
    import jax

    from mca_tpu.config import get_model_config
    from mca_tpu.models import build_model

    model = build_model(get_model_config(cfg))
    batch = zero_batch_for(cfg)
    return jax.jit(model.init)(jax.random.key(0), batch)


def _load_orbax_params(ckpt, path: str):
    """Accept a final-save parent dir (``<dir>/model``), the orbax dir
    itself, or an epoch checkpoint (``<dir>/state`` train state)."""
    import os

    base = os.path.basename(os.path.normpath(path))
    if os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
        tree = ckpt._checkpointer().restore(os.path.abspath(path))
        if base == "state" and "params" in tree:
            return tree["params"]
        return tree
    if os.path.isdir(os.path.join(path, "state")):
        return ckpt.load_state(path)["params"]
    return ckpt.load_params(path)


def _import_with_optimizer(args, cfg, ckpt, params, model_sd) -> None:
    """Build a full train-state checkpoint (params + filled optax
    state + step) in the requested layout and save it under
    ``<out_dir>/state`` — the directory shape ``restart:`` restores."""
    import os

    import jax.numpy as jnp

    from mca_tpu.interop import (
        fill_adam_state,
        import_optimizer_state,
        load_accelerate_dir,
    )
    from mca_tpu.train import make_flat_apparatus, make_optimizer

    if not os.path.isdir(args.checkpoint):
        raise SystemExit(
            "--with-optimizer needs an accelerate save_state "
            "DIRECTORY (optimizer.bin lives next to the weights)"
        )
    saved = load_accelerate_dir(args.checkpoint, load_model=False)
    if saved["optimizer"] is None:
        raise SystemExit(
            f"no optimizer.bin under {args.checkpoint}"
        )
    mu, nu, opt_count = import_optimizer_state(
        saved["optimizer"],
        params,
        modalities=list(cfg.encoder_configs.keys()),
        model_sd=model_sd,
    )
    step = (
        saved["scheduler_step"]
        if saved["scheduler_step"] is not None
        else opt_count
    )
    # the optax state STRUCTURE does not depend on the schedule
    # horizon (only its count/moment leaves matter), so any
    # num_training_steps builds the right template
    if args.state_mode == "flat":
        flat0, _unravel, flat_tx = make_flat_apparatus(cfg, 1000, params)
        opt_state = fill_adam_state(flat_tx.init(flat0), mu, nu, step)
    else:
        tx = make_optimizer(cfg, 1000)
        opt_state = fill_adam_state(tx.init(params), mu, nu, step)
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(step, jnp.int32),
    }
    ckpt.save_state(state, args.out_dir)
    logger.info(
        "optimizer moments + step %d imported (%s layout)",
        step,
        args.state_mode,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="reference-format train config YAML")
    ap.add_argument("checkpoint", nargs="?", help="torch checkpoint path")
    ap.add_argument("out_dir", nargs="?", help="Orbax output directory")
    ap.add_argument(
        "--export",
        metavar="FILE",
        help="write a reference-named .safetensors of the params",
    )
    ap.add_argument(
        "--from-orbax",
        metavar="DIR",
        help="export OUR params from this Orbax dir (no torch import)",
    )
    ap.add_argument(
        "--with-optimizer",
        action="store_true",
        help=(
            "also import AdamW moments + scheduler step from an "
            "accelerate save_state dir (optimizer.bin/scheduler.bin) "
            "into a full train-state checkpoint"
        ),
    )
    ap.add_argument(
        "--state-mode",
        choices=("flat", "tree"),
        default="flat",
        help="optimizer-state layout of the run that will restart",
    )
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from mca_tpu import checkpoint as ckpt
    from mca_tpu.config import load_yaml, training_config_from_dict
    from mca_tpu.interop import (
        export_state_dict,
        import_state_dict,
        load_torch_state_dict,
    )

    cfg = training_config_from_dict(load_yaml(args.config))
    if args.from_orbax:
        if not args.export:
            ap.error("--from-orbax requires --export")
        if args.with_optimizer:
            ap.error(
                "--with-optimizer only applies when importing an "
                "accelerate save_state directory, not --from-orbax"
            )
        params = _load_orbax_params(ckpt, args.from_orbax)
    elif args.checkpoint:
        if not args.out_dir:
            ap.error("out_dir required when importing a checkpoint")
        sd = load_torch_state_dict(args.checkpoint)
        params = init_params(cfg)
        params, report = import_state_dict(sd, params)
        if args.with_optimizer:
            _import_with_optimizer(args, cfg, ckpt, params, sd)
        else:
            ckpt.save_params(params, args.out_dir)
        logger.info(
            "imported %d tensors -> %s (%d reference keys unused: %s)",
            len(report["matched"]),
            args.out_dir,
            len(report["unused"]),
            json.dumps(report["unused"][:8]),
        )
    else:
        ap.error(
            "nothing to do: give a torch checkpoint to import, or "
            "--from-orbax DIR --export FILE"
        )

    if args.export:
        import numpy as np
        from safetensors.numpy import save_file

        sd_out = {
            k: np.ascontiguousarray(v)
            for k, v in export_state_dict(params).items()
        }
        save_file(sd_out, args.export)
        logger.info("exported %d tensors -> %s", len(sd_out), args.export)
    return 0


if __name__ == "__main__":
    sys.exit(main())
