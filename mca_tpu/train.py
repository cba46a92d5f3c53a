"""Pretraining loop: ``python -m mca_tpu.train <config.yaml>``.

TPU-native replacement for the reference's Accelerate-driven script
(``/root/reference/train_accel_gpu.py``): one jit-compiled train step
(forward + loss + grads + optax update, donated state) over a
``('data','model')`` device mesh.  The batch is sharded on ``data``;
the contrastive loss is written on the global batch, so the all-gather
the reference does by hand (utils/distributed.py) is inserted by the
XLA partitioner over ICI.

Matches the reference's training semantics:
- AdamW (wd 0.01, torch defaults) + HF-style LR schedule with linear
  warmup (ref train_accel_gpu.py:80-86),
- global-norm gradient clipping when ``clip`` is set (ref :116-117),
- per-step metric logs: total/per-pair losses (keys without '|'),
  param/grad norms, lr (ref :126-130) — to JSONL (+ optional wandb),
- per-epoch + every-n-step checkpoints in ``output_dir/<epoch>/``
  (ref :122-123, 133-134), restart via ``config.restart`` (ref :97-99),
- eval loop with per-pair losses and Uniformity/Alignment metrics,
  normalised and not (ref :137-184),
- final parameter save (ref :187).

The learnable contrastive temperature is clamped to [ln1, ln100] after
every update (the reference clamps the parameter in-place before each
forward, ref utils/contrastive_loss_with_temperature.py:156-187).
"""

from __future__ import annotations

import logging
import math
import sys
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mca_tpu import checkpoint as ckpt
from mca_tpu.config import Config, get_model_config, training_config
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.dataset import BatchedLoader, setup_data
from mca_tpu.losses import LOGIT_SCALE_MAX, LOGIT_SCALE_MIN
from mca_tpu.metrics import MetricAccumulator
from mca_tpu.models import build_model
from mca_tpu.parallel.mesh import make_mesh, shard_batch
from mca_tpu.parallel.sharding import shard_params
from mca_tpu.utils.logging import JSONLLogger, ThroughputMeter
from mca_tpu.utils.trees import count_parameters, global_norm

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Schedule + optimizer
# ---------------------------------------------------------------------------


def hf_lr_schedule(
    kind: str, lr: float, num_warmup_steps: int, num_training_steps: int
):
    """transformers.get_scheduler semantics (linear warmup + decay)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = jnp.maximum(num_warmup_steps, 1)
        warm = step / warmup
        progress = (step - num_warmup_steps) / jnp.maximum(
            num_training_steps - num_warmup_steps, 1
        )
        progress = jnp.clip(progress, 0.0, 1.0)
        if kind == "cosine":
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        elif kind == "linear":
            decay = 1.0 - progress
        elif kind == "constant_with_warmup":
            decay = 1.0
        elif kind == "constant":
            return jnp.asarray(lr, jnp.float32)
        else:
            raise ValueError(f"unknown lr_scheduler_type {kind!r}")
        return lr * jnp.where(step < num_warmup_steps, warm, decay)

    return schedule


def clamp_logit_scale() -> optax.GradientTransformation:
    """Post-update clamp of every ``logit_scale*`` parameter."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del state
        if params is None:
            return updates, optax.EmptyState()

        def clamp(path, u, p):
            name = jax.tree_util.keystr(path)
            if "logit_scale" in name:
                # clamp the post-update VALUE by adjusting the update
                return (
                    jnp.clip(
                        p + u, LOGIT_SCALE_MIN, LOGIT_SCALE_MAX
                    )
                    - p
                )
            return u

        return (
            jax.tree_util.tree_map_with_path(clamp, updates, params),
            optax.EmptyState(),
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    config: Config, num_training_steps: int
) -> optax.GradientTransformation:
    schedule = hf_lr_schedule(
        config.lr_scheduler_type,
        config.lr,
        config.num_warmup_steps,
        num_training_steps,
    )
    chain = []
    if config.clip:
        chain.append(optax.clip_by_global_norm(config.clip))
    chain.append(
        optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=0.01,  # torch AdamW default
        )
    )
    chain.append(clamp_logit_scale())
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Train state + step
# ---------------------------------------------------------------------------


def init_state(
    model, tx, batch, seed: int
) -> Dict[str, Any]:
    params = jax.jit(model.init)(jax.random.key(seed), batch)
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def _step_body(model, tx, schedule, state, batch):
    """grads + update + metric scalars for one batch."""

    def loss_fn(params):
        out = model.apply(params, batch)
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state["params"]
    )
    updates, opt_state = tx.update(
        grads, state["opt_state"], state["params"]
    )
    params = optax.apply_updates(state["params"], updates)
    new_state = {
        "params": params,
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    metrics = {
        "total_loss": loss,
        "param_norm": global_norm(params),
        "grad_norm": global_norm(grads),
        "lr": schedule(state["step"]),
    }
    # per-pair logs, reference filters keys containing '|'
    # (train_accel_gpu.py:127)
    for k, v in out["losses"].items():
        if "|" not in k:
            metrics[k] = v
    for k in ("fcl_loss", "no-fcl_loss"):
        if k in out:
            metrics[k] = out[k]
    return new_state, metrics


def make_train_step(model, tx, schedule):
    """One jit-compiled step (single batch)."""

    @partial(jax.jit, donate_argnums=0)
    def train_step(state, batch):
        return _step_body(model, tx, schedule, state, batch)

    return train_step


def make_train_step_scan(model, tx, schedule):
    """K optimiser steps per executable launch.

    ``batches`` is a batch pytree with a leading [K] axis;
    ``lax.scan`` runs the K steps on-device in one call and returns
    stacked per-step metrics.  This amortises host->device dispatch —
    essential on remote-attached TPUs where per-launch latency is large
    relative to the ~100ms step — and is the idiomatic way to keep the
    chip busy regardless.
    """

    @partial(jax.jit, donate_argnums=0)
    def train_steps(state, batches):
        def body(st, batch):
            return _step_body(model, tx, schedule, st, batch)

        return jax.lax.scan(body, state, batches)

    return train_steps


def stack_batches(batch_list):
    """List of K same-shape batch pytrees -> one pytree with [K] axis."""
    return jax.tree.map(
        lambda *xs: np.stack(xs), *batch_list
    )


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch)
        return out

    return eval_step


def make_eval_step_scan(model):
    """Evaluate K batches per launch; outputs stacked on axis 0."""

    @jax.jit
    def eval_steps(params, batches):
        def body(carry, batch):
            return carry, model.apply(params, batch)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return eval_steps


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------


def run_eval_epoch(
    config: Config,
    model_config: Dict[str, Any],
    eval_step,
    params,
    eval_dl,
    mesh,
    log: JSONLLogger,
    step: int,
) -> None:
    """Eval loop with the reference's metric names
    (train_accel_gpu.py:137-184)."""
    modality_names = list(config.modality_config.keys())
    unif = {k: MetricAccumulator() for k in modality_names}
    if not model_config["eao"]:
        unif["fusion"] = MetricAccumulator()
        align = {k: MetricAccumulator() for k in modality_names}
    else:
        align = {}
    losses: Dict[str, float] = {}
    n_batches = 0

    def consume(out) -> None:
        nonlocal n_batches
        n_batches += 1
        losses["total_loss"] = losses.get("total_loss", 0.0) + float(
            out["loss"]
        )
        step_log = {"val_step_total_loss": float(out["loss"])}
        for k, v in out["losses"].items():
            losses[k] = losses.get(k, 0.0) + float(v)
            if "|" not in k:
                step_log["val_step_" + k] = float(v)
        log.log(step_log, step=step)
        sample_mask = out["modality_sample_mask"]
        for k, acc in unif.items():
            if k == "fusion":
                acc.update(np.asarray(out["fusion"]))
            else:
                m = np.asarray(sample_mask[k])
                acc.update(np.asarray(out[k])[m])
        for k, acc in align.items():
            m = np.asarray(sample_mask[k])
            acc.update(
                np.asarray(out[k])[m], np.asarray(out["fusion"])[m]
            )

    eval_step, eval_steps, k_per_call = eval_step
    chunk = []

    def flush(chunk):
        if len(chunk) == 1 or eval_steps is None:
            for b in chunk:
                consume(
                    jax.device_get(
                        eval_step(params, shard_batch(b, mesh))
                    )
                )
        else:
            stacked = shard_batch(
                stack_batches(chunk), mesh, leading_scan_axis=True
            )
            outs = jax.device_get(eval_steps(params, stacked))
            for i in range(len(chunk)):
                consume(jax.tree.map(lambda x: x[i], outs))

    for batch in eval_dl:
        chunk.append(batch)
        if len(chunk) == k_per_call:
            flush(chunk)
            chunk = []
    if chunk:
        flush(chunk)
    if not n_batches:
        return
    epoch_log = {
        "val_epoch_" + k: v / n_batches
        for k, v in losses.items()
        if "|" not in k
    }
    for norm, prefix in ((False, ""), (True, "norm_")):
        u = {
            f"val_epoch_{prefix}uniformity_{k}": acc.compute_uniformity(
                norm=norm
            )
            for k, acc in unif.items()
            if acc
        }
        epoch_log.update(u)
        if u:
            epoch_log[f"val_epoch_{prefix}unformity_avg"] = float(
                np.mean(list(u.values()))
            )
        if align:
            a = {
                f"val_epoch_{prefix}alignment_{k}": acc.compute_alignment(
                    norm=norm
                )
                for k, acc in align.items()
                if acc
            }
            epoch_log.update(a)
            if a:
                epoch_log[f"val_epoch_{prefix}alignment_avg"] = float(
                    np.mean(list(a.values()))
                )
    log.log(epoch_log, step=step)


def _prune_checkpoints(output_dir: str, epoch: int, keep: int) -> None:
    """Keep only the newest ``keep`` per-epoch checkpoint dirs."""
    import shutil

    for old in range(epoch - keep + 1):
        path = os.path.join(output_dir, str(old))
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)


def train(config: Config) -> str:
    """Run pretraining; returns the output directory."""
    mesh = make_mesh(
        config.mesh_data,
        config.mesh_model,
        batch_size=config.batch_size,
    )
    model_config = get_model_config(config)
    model = build_model(model_config)

    datasets = setup_data(
        config.dataset,
        split=config.split,
        ds_frac=config.ds_frac,
        ds_seed=config.ds_seed,
        predrop=config.predrop,
        predrop_config=config.modality_config.to_plain()
        if hasattr(config.modality_config, "to_plain")
        else config.modality_config,
    )
    collator = MultimodalCollator(
        config.modality_config.to_plain()
        if hasattr(config.modality_config, "to_plain")
        else config.modality_config
    )
    train_dl = BatchedLoader(
        datasets["train"],
        collator,
        config.batch_size,
        shuffle=True,
        seed=config.seed,
    )
    eval_dl = BatchedLoader(
        datasets["test"], collator, config.batch_size
    )
    num_training_steps = config.epochs * len(train_dl)
    schedule = hf_lr_schedule(
        config.lr_scheduler_type,
        config.lr,
        config.num_warmup_steps,
        num_training_steps,
    )
    tx = make_optimizer(config, num_training_steps)

    first_batch = shard_batch(next(iter(train_dl)), mesh)
    state = init_state(model, tx, first_batch, config.seed)
    state["params"] = shard_params(state["params"], mesh)

    n_emb, n_non = count_parameters(state["params"])
    logger.info("Number of embedding parameters: %.2fM", n_emb / 1e6)
    logger.info(
        "Number of non-embedding parameters: %.2fM", n_non / 1e6
    )
    logger.info(
        "Number of training samples: %d", len(datasets["train"])
    )
    logger.info(
        "Number of training batches per epoch: %d", len(train_dl)
    )

    if config.restart:
        logger.info("Loading saved state from %s", config.restart)
        state = ckpt.load_state(config.restart, target=state)

    wandb_cfg = None
    if config.wandb:
        wandb_cfg = {
            "project": config.wandb_name,
            "entity": config.wandb_account_name or None,
            "config": config.to_plain(),
        }
    log = JSONLLogger(config.output_dir, wandb_config=wandb_cfg)
    tokens_per_step = config.batch_size * int(
        sum(
            e["max_tokens"] for e in config.encoder_configs.values()
        )
        + config.num_fusion_tokens
    )
    meter = ThroughputMeter(tokens_per_step)

    steps_per_call = int(config.get("steps_per_call", 0))
    if steps_per_call <= 0:
        # remote-attached TPUs pay seconds of dispatch per launch;
        # amortise with multi-step scan calls there, stay single-step
        # on CPU (test) backends to keep compiles cheap
        steps_per_call = 1 if jax.default_backend() == "cpu" else 8
    train_step = make_train_step(model, tx, schedule)
    train_steps = (
        make_train_step_scan(model, tx, schedule)
        if steps_per_call > 1
        else None
    )
    eval_step = (
        make_eval_step(model),
        make_eval_step_scan(model) if steps_per_call > 1 else None,
        steps_per_call,
    )

    def flush_chunk(state, chunk, epoch):
        """Run a group of collated batches through one launch."""
        if len(chunk) == 1 or train_steps is None:
            for b in chunk:
                state, metrics = train_step(
                    state, shard_batch(b, mesh)
                )
                meter.step()
                _log_metrics(metrics, state, epoch, None)
        else:
            stacked = shard_batch(
                stack_batches(chunk), mesh, leading_scan_axis=True
            )
            state, metrics = train_steps(state, stacked)
            host = jax.device_get(metrics)
            base_step = int(state["step"]) - len(chunk)
            for i in range(len(chunk)):
                meter.step()
                _log_metrics(
                    jax.tree.map(lambda x: x[i], host),
                    state,
                    epoch,
                    base_step + i + 1,
                )
        return state

    def _log_metrics(metrics, state, epoch, step):
        step = int(state["step"]) if step is None else step
        if step % max(config.log_every, 1) == 0:
            rec = {k: float(v) for k, v in metrics.items()}
            rec["tokens_per_sec"] = meter.tokens_per_sec
            rec["epoch"] = epoch
            log.log(rec, step=step)

    trace_dir = config.get("trace_dir", "")
    launches = 0

    for epoch in range(config.start_epoch, config.epochs):
        train_dl.set_epoch(epoch)
        chunk = []
        last_ckpt_bucket = 0
        for idb, batch in enumerate(train_dl):
            chunk.append(batch)
            if len(chunk) == steps_per_call:
                launches += 1
                if trace_dir and launches == 2:  # post-warmup launch
                    from mca_tpu.utils.logging import trace_context

                    with trace_context(trace_dir):
                        state = flush_chunk(state, chunk, epoch)
                else:
                    state = flush_chunk(state, chunk, epoch)
                chunk = []
            if config.n_step_checkpoint:
                bucket = idb // config.n_step_checkpoint
                if bucket != last_ckpt_bucket and not chunk:
                    last_ckpt_bucket = bucket
                    ckpt.save_state(state, config.output_dir)
        if chunk:
            state = flush_chunk(state, chunk, epoch)
        ckpt.save_state(
            state, os.path.join(config.output_dir, str(epoch))
        )
        if config.get("checkpoint_keep", 0):
            _prune_checkpoints(
                config.output_dir, epoch, config.checkpoint_keep
            )
        if config.run_eval_loop:
            run_eval_epoch(
                config,
                model_config,
                eval_step,
                state["params"],
                eval_dl,
                mesh,
                log,
                int(state["step"]),
            )
    ckpt.save_params(state["params"], config.output_dir)
    log.close()
    return config.output_dir


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    config = training_config(argv[0])
    train(config)


if __name__ == "__main__":
    main()
