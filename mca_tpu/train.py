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

import json
import logging
import sys
import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mca_tpu import checkpoint as ckpt
from mca_tpu.config import Config, get_model_config, training_config
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.dataset import BatchedLoader, setup_data
from mca_tpu.losses import LOGIT_SCALE_MAX, LOGIT_SCALE_MIN
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


def _with_state_dtype(
    inner: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store ``inner``'s float state leaves (AdamW's mu/nu moments) in
    ``dtype``; every update still computes in fp32 (moments are upcast
    on entry, rounded back for storage).

    ``moment_dtype: bf16`` cuts optimizer-state HBM by half on the
    moments (state goes 3P -> 2P bytes with fp32 params) — the
    production memory lever for models big enough that the parameter
    state competes with activations.  The reference trains fp32
    AdamW only (train_accel_gpu.py:75-80); this is a TPU-side
    extension, default off, trajectory pinned close to fp32 in
    tests/test_optimizer_state.py.  The planner and memory_report
    account for it automatically (state shapes come from
    ``jax.eval_shape`` of the real init).
    """

    def _cast(tree, to_dtype):
        def leaf(x):
            if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating
            ):
                return jnp.asarray(x).astype(to_dtype)
            return x

        return jax.tree.map(leaf, tree)

    def init(params):
        return _cast(inner.init(params), dtype)

    def update(updates, state, params=None):
        updates, new_state = inner.update(
            updates, _cast(state, jnp.float32), params
        )
        return updates, _cast(new_state, dtype)

    return optax.GradientTransformation(init, update)


def _make_adamw(config: Config, schedule) -> optax.GradientTransformation:
    """The AdamW core both state modes share, honoring
    ``moment_dtype`` (fp32 default | bf16 half-width moments)."""
    adamw = optax.adamw(
        schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=0.01,  # torch AdamW default
    )
    moment_dtype = str(config.get("moment_dtype", "fp32"))
    if moment_dtype == "bf16":
        adamw = _with_state_dtype(adamw, jnp.bfloat16)
    elif moment_dtype != "fp32":
        raise ValueError(
            f"moment_dtype must be fp32 or bf16, got {moment_dtype!r}"
        )
    return adamw


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
    chain.append(_make_adamw(config, schedule))
    inner = optax.chain(*chain)
    # flattening folds the moments into ONE raveled vector whose length
    # is rarely divisible by the data axis — under fsdp that would
    # silently leave the moments fully replicated (no ZeRO memory win),
    # so fsdp keeps per-leaf moments, which shard like their parameters.
    # (The flat-state fast path has its own padded flat optimizer,
    # make_flat_apparatus, and never uses this tree tx for stepping.)
    if config.get("fuse_optimizer", True) and not config.get(
        "fsdp", False
    ):
        # one AdamW over a single flat vector instead of ~90 leaves:
        # per-leaf kernel launches dominate the update on this backend
        # (identical math — ravel/unravel are two contiguous copies)
        inner = optax.flatten(inner)
    # the clamp needs parameter paths -> applied outside the flattening
    return optax.chain(inner, clamp_logit_scale())


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


# The reference's universal pad/missing marker (ref encoders.py:288,
# 346) — the default when a modality_config doesn't say otherwise.
_DEFAULT_PAD_TOKEN = -10000.0


def staging_sentinels(config) -> dict:
    """Per-modality float value the ON-DEVICE path re-detects by exact
    equality (so staging narrowing must preserve it and never round a
    live value onto it), or ``None`` when narrowing is unconditionally
    safe for that modality:

    - ``matrix`` -> PatchEncoder marks patches entirely equal to its
      ``pad_token`` (encoders.py:343; ref encoders.py:273)
    - ``sequence`` + (Sparse)TabularEncoder -> ContinuousValueEncoder
      zeroes positions equal to ``padding_value=float(padding_idx)``
      (encoders.py:100; ref encoders.py:55)
    - ``embedded_sequence`` / SequenceEncoder -> pad rides in an
      explicit ``attention_mask`` / int token ids; no float equality
      ever runs on device, so the big streamed CMU float features
      narrow freely
    """
    enc = config.encoder_configs.to_plain()
    out = {}
    for m, c in config.modality_config.to_plain().items():
        typ = c.get("type")
        if typ == "matrix":
            e = enc.get(m, {})
            out[m] = float(
                e.get(
                    "pad_token",
                    c.get("pad_token", _DEFAULT_PAD_TOKEN),
                )
            )
        elif typ == "sequence":
            e = enc.get(m, {})
            et = e.get("type", "")
            if et == "TabularEncoder":
                out[m] = float(e.get("padding_idx", -1))
            elif et == "SparseTabularEncoder":
                out[m] = float(e.get("padding_idx", 0))
            else:
                out[m] = None  # SequenceEncoder: int tokens only
        else:
            out[m] = None
    return out


def _pad_representable(pad: float, nd) -> bool:
    return float(np.asarray(pad, nd).astype(np.float32)) == float(
        np.float32(pad)
    )


def _nearest_distinct(pad: float, nd):
    """The closest ``nd``-representable value that is NOT ``pad``
    (toward zero, sign-preserving) — where live values that narrowing
    rounds ONTO the sentinel get nudged to."""
    p32 = np.float32(pad)
    if p32 == 0:
        return np.asarray(np.finfo(nd).smallest_normal, nd)
    pn = np.asarray(p32, nd)
    for k in range(12, 5, -1):  # finest first -> nearest distinct
        c = np.asarray(p32 * np.float32(1 - 2.0 ** -k), nd)
        if c != pn:
            return c
    raise AssertionError(f"no {nd} neighbour for pad {pad}")


def narrow_for_staging(batch, stage_dtype: str, sentinels=None):
    """Host-side batch narrowing before H2D staging.

    The streaming input pipeline is H2D-bandwidth-bound through the
    remote TPU relay (PERF.md round 2: ~475 MB staged per 32-step CMU
    launch at ~425 MB/s).  ``stage_dtype: fp16|bf16`` ships float
    features in half the bytes (int64 index/mask columns also drop to
    int32) and :func:`_upcast_staged` restores fp32 inside the step, so
    everything downstream of the input quantisation is unchanged.
    Default ``fp32`` is byte-exact with the reference's pipeline.

    ``sentinels`` maps modality -> the float value its on-device path
    re-detects by exact equality, or ``None`` for none (see
    :func:`staging_sentinels`); when the dict itself is omitted, every
    modality conservatively gets the reference's universal ``-10000``
    pad marker (ref encoders.py:288, 346).  Narrowing must preserve
    the live/sentinel partition exactly.  Two hazards, both handled
    STATICALLY per modality so staged dtypes never depend on batch
    contents (a data-dependent dtype would re-trigger jit compilation
    of the K-step scan whenever sentinel presence flips between
    chunks):

    - a float modality whose sentinel the narrow dtype cannot
      represent exactly stays fp32 for EVERY batch (bf16 rounds
      ``-10000 -> -9984``, silently defeating the equality test);
    - in narrowable modalities, live values that ROUND onto the
      sentinel (fp16 maps all of ``(-10004, -9996)`` to ``-10000``)
      are nudged one representable step toward zero — a <0.1%
      perturbation inside the staging quantisation budget, instead of
      a live token silently becoming padding.

    Sentinel-free modalities skip both the check and the per-batch
    collision pass entirely.
    """
    if stage_dtype in ("fp32", "", None):
        return batch
    nd = {"fp16": np.float16, "bf16": jnp.bfloat16}[stage_dtype]

    out = {}
    for mod, cols in batch.items():
        if sentinels is None:
            pad = _DEFAULT_PAD_TOKEN
        else:
            pad = sentinels.get(mod)
        if pad is None:
            pad_ok, bump = True, None  # no on-device float equality
        else:
            pad = float(pad)
            pad_ok = _pad_representable(pad, nd)
            bump = _nearest_distinct(pad, nd) if pad_ok else None
        ncols = {}
        for name, x in cols.items():
            x = np.asarray(x)
            if x.dtype == np.float32:
                if not pad_ok:
                    ncols[name] = x  # static: never narrows
                    continue
                xn = x.astype(nd)
                if bump is not None:
                    collided = (
                        xn.astype(np.float32) == np.float32(pad)
                    ) & (x != np.float32(pad))
                    if collided.any():
                        xn[collided] = bump
                ncols[name] = xn
            elif x.dtype == np.int64:
                ncols[name] = x.astype(np.int32)
            else:
                ncols[name] = x
        out[mod] = ncols
    return out


def _upcast_staged(batch):
    """Undo :func:`narrow_for_staging` on device (fuses into first use)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if x.dtype in (jnp.float16, jnp.bfloat16)
        else x,
        batch,
    )


def _train_apply(model, params, batch, step, dropout_seed, micro=None):
    """Train-mode forward: ``deterministic=False`` with a per-step
    dropout RNG, matching the reference's ``model.train()`` semantics
    (ref train_accel_gpu.py trains in train mode, so any configured
    encoder dropout — e.g. PatchEncoder's default 0.1, ref
    encoders.py:266-271 — is live).  Encoders with ``dropout == 0``
    never construct a Dropout module, so canonical TCGA/CMU numerics
    are unchanged.  The key is folded with the step counter for
    reproducibility across restarts.  ``micro`` (grad-accumulation
    microbatch index) is folded in additionally when given, so the
    ``grad_accum == 1`` RNG stream is unchanged."""
    rng = jax.random.fold_in(jax.random.key(dropout_seed), step)
    if micro is not None:
        rng = jax.random.fold_in(rng, micro)
    return model.apply(
        params,
        _upcast_staged(batch),
        deterministic=False,
        rngs={"dropout": rng},
    )


def _scalar_losses(out):
    """The per-step scalar metrics drawn from a model output: the total
    loss, the per-pair losses without a '|' in the key (the reference's
    logging filter, train_accel_gpu.py:127), and the fcl aggregates."""
    scal = {"total_loss": out["loss"]}
    for k, v in out["losses"].items():
        if "|" not in k:
            scal[k] = v
    for k in ("fcl_loss", "no-fcl_loss"):
        if k in out:
            scal[k] = out[k]
    return scal


def _accum_grads(
    model, param_view, params, batch, step, dropout_seed, n_accum
):
    """(mean scalar metrics, mean gradient) over ``n_accum``
    microbatches at FIXED ``params``.

    ``n_accum == 1`` is the plain single-pass value_and_grad.  For
    ``n_accum > 1`` the batch splits into STRIDED microbatches
    (microbatch i = rows ``i, i+N, i+2N, ...``) and a ``lax.scan``
    accumulates a running gradient sum — peak activation memory is
    that of ONE microbatch, which is the point of the feature.
    Strided (not contiguous-chunk) selection is the TPU-correct
    decomposition under data parallelism: every device keeps
    ``B/(N*D)`` of every microbatch (contiguous chunks would idle all
    but ``D/N`` devices per microbatch), and the reshape
    ``[B] -> [B/N, N] -> swap`` keeps the sharded axis intact
    (``P(None, 'data')``), which the flash kernel's
    custom_partitioning rule requires.  Loss semantics: the
    contrastive loss is batch-global, so each microbatch computes its
    own logit matrix over its B/N rows — exactly the semantics of the
    reference's DDP ranks without a global gather (ref
    utils/distributed.py gather modes; gather LOCAL/NONE), not a
    re-association of the full-batch loss.  ``param_view`` maps
    optimizer-space parameters to the model's tree (identity for the
    tree path, ``unravel`` for the flat-vector path)."""

    def loss_fn(p, b, i):
        out = _train_apply(
            model, param_view(p), b, step, dropout_seed, micro=i
        )
        return out["loss"], _scalar_losses(out)

    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if n_accum <= 1:
        (_, scal), grads = vg(params, batch, None)
        return scal, grads
    micro = jax.tree.map(
        lambda x: x.reshape(
            (x.shape[0] // n_accum, n_accum) + x.shape[1:]
        ).swapaxes(0, 1),
        batch,
    )
    mb0 = jax.tree.map(lambda x: x[0], micro)
    (_, scal_s), g_s = jax.eval_shape(vg, params, mb0, 0)
    zeros = lambda tree: jax.tree.map(  # noqa: E731
        lambda s: jnp.zeros(s.shape, s.dtype), tree
    )

    def body(carry, xs):
        mb, i = xs
        (_, scal), g = vg(params, mb, i)
        # NaN-aware metric accumulation: a pair whose joint presence
        # mask is empty in ONE microbatch logs NaN for that microbatch
        # (losses.py semantics); the step's logged value must be the
        # mean over the microbatches that HAD the pair, not NaN —
        # matching what grad_accum=1 logs for the same data
        scal_sum = jax.tree.map(
            lambda acc, v: acc + jnp.where(jnp.isfinite(v), v, 0.0),
            carry[0],
            scal,
        )
        scal_cnt = jax.tree.map(
            lambda acc, v: acc + jnp.isfinite(v).astype(jnp.float32),
            carry[1],
            scal,
        )
        return (
            scal_sum,
            scal_cnt,
            jax.tree.map(jnp.add, carry[2], g),
        ), None

    (scal_sum, scal_cnt, g_sum), _ = jax.lax.scan(
        body,
        (zeros(scal_s), zeros(scal_s), zeros(g_s)),
        (micro, jnp.arange(n_accum)),
    )
    inv = 1.0 / n_accum
    return (
        jax.tree.map(
            lambda s, c: jnp.where(c > 0, s / c, jnp.nan).astype(
                s.dtype
            ),
            scal_sum,
            scal_cnt,
        ),
        jax.tree.map(lambda x: (x * inv).astype(x.dtype), g_sum),
    )


def _step_body(model, tx, schedule, state, batch, dropout_seed=0, n_accum=1):
    """grads + update + metric scalars for one batch."""
    scal, grads = _accum_grads(
        model,
        lambda p: p,
        state["params"],
        batch,
        state["step"],
        dropout_seed,
        n_accum,
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
        "param_norm": global_norm(params),
        "grad_norm": global_norm(grads),
        "lr": schedule(state["step"]),
        **scal,
    }
    return new_state, metrics


def make_train_step(
    model, tx, schedule, dropout_seed=0, out_shardings=None, n_accum=1
):
    """One jit-compiled step (single batch).

    ``out_shardings=(state_shardings, metrics_sharding)`` pins the
    donated state's output layout — required under FSDP so XLA keeps
    parameters/moments sharded on 'data' across steps instead of
    choosing its own layout for the outputs."""

    @partial(jax.jit, donate_argnums=0, out_shardings=out_shardings)
    def train_step(state, batch):
        return _step_body(
            model, tx, schedule, state, batch, dropout_seed, n_accum
        )

    return train_step


def step_metric_names(model, tx, schedule, state, batch):
    """Static metric-name list via an abstract trace (no device work)."""
    shapes = jax.eval_shape(
        lambda s, b: _step_body(model, tx, schedule, s, b)[1],
        state,
        batch,
    )
    return tuple(sorted(shapes.keys()))


def make_train_step_scan(
    model,
    tx,
    schedule,
    metric_names,
    dropout_seed=0,
    out_shardings=None,
    n_accum=1,
):
    """K optimiser steps per executable launch.

    ``batches`` is a batch pytree with a leading [K] axis;
    ``lax.scan`` runs the K steps on-device in one call.  Per-step
    metric scalars are PACKED into one [M] vector inside the body (one
    stacked [K, M] output instead of M separate outputs): on
    remote-attached TPUs every output handle costs milliseconds, and a
    dict of ~65 scalars per step dominated the step time (measured
    896ms/step vs 111ms/step packed at TCGA scale).
    """

    @partial(jax.jit, donate_argnums=0, out_shardings=out_shardings)
    def train_steps(state, batches):
        def body(st, batch):
            ns, metrics = _step_body(
                model, tx, schedule, st, batch, dropout_seed, n_accum
            )
            packed = jnp.stack(
                [
                    metrics[k].astype(jnp.float32)
                    for k in metric_names
                ]
            )
            return ns, packed

        return jax.lax.scan(body, state, batches)

    return train_steps


def stack_batches(batch_list):
    """List of K same-shape batch pytrees -> one pytree with [K] axis."""
    return jax.tree.map(
        lambda *xs: np.stack(xs), *batch_list
    )


# ---------------------------------------------------------------------------
# Flat-state training (single param vector)
# ---------------------------------------------------------------------------


def clamp_logit_scale_flat(
    mask,
) -> optax.GradientTransformation:
    """Flat-vector variant of :func:`clamp_logit_scale` (mask of the
    logit_scale positions in the raveled parameter vector)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del state
        if params is None:
            return updates, optax.EmptyState()
        clamped = (
            jnp.clip(params + updates, LOGIT_SCALE_MIN, LOGIT_SCALE_MAX)
            - params
        )
        return jnp.where(mask, clamped, updates), optax.EmptyState()

    return optax.GradientTransformation(init, update)


def make_flat_apparatus(
    config: Config,
    num_training_steps: int,
    params,
    pad_to_multiple: int = 1,
):
    """(flat0, unravel, tx) for single-vector training state.

    The whole parameter tree is raveled into ONE fp32 vector: the
    optimiser becomes a handful of full-vector kernels instead of
    ~90-leaf elementwise chains, and the train state is ~6 device
    buffers instead of ~260 — which matters on remote-attached TPUs
    where every argument/output handle has per-launch cost.  Composes
    with data parallelism and (via ``pad_to_multiple``) FSDP;
    tensor-parallel runs keep the tree state.

    ``pad_to_multiple`` zero-pads the vector so it shards evenly over
    the FSDP ``data`` axis (jax requires divisible dims).  The tail is
    numerically inert: ``unravel`` slices it off before the forward,
    so its gradient is zero, AdamW's moments stay zero (zero grad,
    zero weight-decay on zero weights), and the global-norm clip sums
    zero squares over it.
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel_base = ravel_pytree(params)
    marker = jax.tree_util.tree_map_with_path(
        lambda p, x: np.full(
            np.shape(x), "logit_scale" in jax.tree_util.keystr(p)
        ),
        params,
    )
    flat_mask = jnp.asarray(ravel_pytree(marker)[0], bool)
    n = int(flat0.size)
    pad = (-n) % max(int(pad_to_multiple), 1)
    if pad:
        flat0 = jnp.concatenate(
            [flat0, jnp.zeros((pad,), flat0.dtype)]
        )
        flat_mask = jnp.concatenate(
            [flat_mask, jnp.zeros((pad,), bool)]
        )
        unravel = lambda v: unravel_base(v[:n])  # noqa: E731
    else:
        unravel = unravel_base
    schedule = hf_lr_schedule(
        config.lr_scheduler_type,
        config.lr,
        config.num_warmup_steps,
        num_training_steps,
    )
    chain = []
    if config.clip:
        chain.append(optax.clip_by_global_norm(config.clip))
    chain.append(_make_adamw(config, schedule))
    chain.append(clamp_logit_scale_flat(flat_mask))
    return flat0, unravel, optax.chain(*chain)


def _flat_step_body(
    model, tx, schedule, unravel, state, batch, dropout_seed=0, n_accum=1
):
    scal, gflat = _accum_grads(
        model,
        unravel,
        state["flat"],
        batch,
        state["step"],
        dropout_seed,
        n_accum,
    )
    updates, opt_state = tx.update(
        gflat, state["opt_state"], state["flat"]
    )
    flat = optax.apply_updates(state["flat"], updates)
    new_state = {
        "flat": flat,
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    metrics = {
        "param_norm": jnp.linalg.norm(flat),
        "grad_norm": jnp.linalg.norm(gflat),
        "lr": schedule(state["step"]),
        **scal,
    }
    return new_state, metrics


def make_flat_train_step_scan(
    model,
    tx,
    schedule,
    unravel,
    metric_names,
    dropout_seed=0,
    out_shardings=None,
    n_accum=1,
):
    @partial(jax.jit, donate_argnums=0, out_shardings=out_shardings)
    def train_steps(state, batches):
        def body(st, batch):
            ns, metrics = _flat_step_body(
                model, tx, schedule, unravel, st, batch,
                dropout_seed, n_accum,
            )
            packed = jnp.stack(
                [metrics[k].astype(jnp.float32) for k in metric_names]
            )
            return ns, packed

        return jax.lax.scan(body, state, batches)

    return train_steps


def make_eval_step(model, emb_names, mask_names, loss_names):
    """Single-batch eval with the same PACKED outputs as the scan path
    (4 buffers instead of ~80 — remote-attached chips pay per output
    handle, PERF.md)."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch)
        emb = jnp.stack([out[k] for k in emb_names])
        msk = jnp.stack(
            [out["modality_sample_mask"][k] for k in mask_names]
        )
        lv = jnp.stack(
            [out["losses"][k].astype(jnp.float32) for k in loss_names]
        )
        return emb, msk, out["loss"], lv

    return eval_step


def make_eval_step_scan(model, emb_names, mask_names, loss_names):
    """Evaluate K batches per launch with PACKED outputs.

    Returns (emb [K,E,B,D], masks [K,M,B], loss [K], pair_losses [K,L])
    — a handful of buffers instead of ~80 per launch (remote-attached
    chips pay per output handle, PERF.md).
    """

    @jax.jit
    def eval_steps(params, batches):
        def body(carry, batch):
            out = model.apply(params, batch)
            emb = jnp.stack([out[k] for k in emb_names])
            msk = jnp.stack(
                [out["modality_sample_mask"][k] for k in mask_names]
            )
            lv = jnp.stack(
                [
                    out["losses"][k].astype(jnp.float32)
                    for k in loss_names
                ]
            )
            return carry, (emb, msk, out["loss"], lv)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return eval_steps


def eval_output_names(model, model_config, params, batch):
    """Static name layout of the packed eval outputs."""
    shapes = jax.eval_shape(
        lambda p, b: model.apply(p, b), params, batch
    )
    mask_names = tuple(sorted(shapes["modality_sample_mask"]))
    loss_names = tuple(sorted(shapes["losses"]))
    emb_names = list(mask_names)
    if not model_config["eao"]:
        emb_names.append("fusion")
    return tuple(emb_names), mask_names, loss_names


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------


class DivergenceError(RuntimeError):
    """Raised by the ``halt_on_nan`` guard when the total loss goes
    non-finite: a NaN loss makes every subsequent gradient, parameter
    and checkpoint NaN, so the run is dead from that step on — halting
    with a forensic checkpoint beats silently burning the rest of the
    schedule (the reference would keep logging NaN rows,
    train_accel_gpu.py:127-135)."""


def make_wandb_config(config: Config):
    """wandb.init kwargs for this run, or None when wandb is off.

    Resume precedence: an explicit ``wandb_restart: <id>`` resumes
    that run with ``resume="must"`` (ref train_accel_gpu.py:60-62);
    otherwise, when ``restart:`` points at a preempted run's output
    dir, the ``preempted.json`` marker's recorded ``wandb_id`` is
    resumed with ``resume="allow"`` (forgiving: a marker copied to a
    machine without that wandb backend still starts cleanly) — the
    spot-reschedule loop reattaches to the SAME wandb run with no
    manual id copying."""
    if not config.wandb:
        return None
    wandb_cfg = {
        "project": config.wandb_name,
        "entity": config.wandb_account_name or None,
        "config": config.to_plain(),
    }
    if config.get("wandb_restart", ""):
        wandb_cfg["id"] = config.wandb_restart
        wandb_cfg["resume"] = "must"
    elif config.restart:
        marker = os.path.join(config.restart, "preempted.json")
        try:
            with open(marker) as f:
                wandb_id = json.load(f).get("wandb_id")
        except (OSError, ValueError):
            wandb_id = None
        if wandb_id:
            wandb_cfg["id"] = wandb_id
            wandb_cfg["resume"] = "allow"
    return wandb_cfg


class PreemptedError(RuntimeError):
    """Raised by the ``preempt_save`` guard after SIGTERM: training
    stopped at a launch boundary with a clean root checkpoint (the
    same layout ``n_step_checkpoint`` writes), so ``restart:
    <output_dir>`` continues the exact trajectory.  TPU VMs are
    routinely preempted (spot capacity, maintenance events) with a
    SIGTERM and a short grace window; the reference has no handler and
    loses everything since its last epoch checkpoint
    (train_accel_gpu.py restart_cfg restarts at epoch boundaries
    only)."""

    def __init__(self, step: int, path: str):
        super().__init__(
            f"preempted at step {step}; state saved to {path} "
            f"(resume with restart: {path})"
        )
        self.step = step
        self.path = path


def run_eval_epoch(
    config: Config,
    model_config: Dict[str, Any],
    eval_step,
    params,
    eval_dl,
    mesh,
    log: JSONLLogger,
    step: int,
    stage=None,
) -> None:
    """Eval loop with the reference's metric names
    (train_accel_gpu.py:137-184).

    All launches keep their outputs ON DEVICE; uniformity/alignment
    reduce in one jit call (:mod:`mca_tpu.eval_metrics`) and a single
    ``device_get`` fetches scalars + per-step losses — no per-chunk
    host syncs (VERDICT r1 item 8).
    """
    from mca_tpu.eval_metrics import epoch_metrics

    if stage is None:
        stage = lambda b, leading_scan_axis=False: shard_batch(  # noqa: E731
            b, mesh, leading_scan_axis
        )
    eval_step, eval_steps, names, k_per_call = eval_step
    emb_names, mask_names, loss_names = names
    emb_chunks, msk_chunks, loss_chunks, lv_chunks = [], [], [], []

    def keep(outs) -> None:
        e, m, lo, lv = outs
        emb_chunks.append(e)
        msk_chunks.append(m)
        loss_chunks.append(lo)
        lv_chunks.append(lv)

    def flush(chunk):
        if len(chunk) == 1 or eval_steps is None:
            for b in chunk:
                keep(eval_step(params, stage(b)))
        else:
            stacked = stage(
                stack_batches(chunk), leading_scan_axis=True
            )
            keep(eval_steps(params, stacked))

    chunk = []
    for batch in eval_dl:
        chunk.append(batch)
        if len(chunk) == k_per_call:
            flush(chunk)
            chunk = []
    if chunk:
        flush(chunk)
    if not emb_chunks:
        return

    fusion = not model_config["eao"]
    losses, lvs, unif, align, counts = jax.device_get(
        epoch_metrics(
            tuple(emb_chunks),
            tuple(msk_chunks),
            tuple(loss_chunks),
            tuple(lv_chunks),
            emb_names=emb_names,
            mask_names=mask_names,
            fusion=fusion,
        )
    )

    plain_loss = [
        (j, k) for j, k in enumerate(loss_names) if "|" not in k
    ]
    for i in range(len(losses)):
        step_log = {"val_step_total_loss": float(losses[i])}
        for j, k in plain_loss:
            step_log["val_step_" + k] = float(lvs[i, j])
        log.log(step_log, step=step)

    epoch_log = {"val_epoch_total_loss": float(losses.mean())}
    for j, k in plain_loss:
        epoch_log["val_epoch_" + k] = float(lvs[:, j].mean())
    for variant, prefix in (("raw", ""), ("norm", "norm_")):
        u = {
            f"val_epoch_{prefix}uniformity_{k}": float(v[variant])
            for k, v in unif.items()
            if counts[k] > 0
        }
        epoch_log.update(u)
        if u:
            # 'unformity' typo preserved from the reference's log keys
            epoch_log[f"val_epoch_{prefix}unformity_avg"] = float(
                np.mean(list(u.values()))
            )
        a = {
            f"val_epoch_{prefix}alignment_{k}": float(v[variant])
            for k, v in align.items()
            if counts[k] > 0
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
        pipe=int(config.get("mesh_pipe", 1) or 1),
    )
    model_config = get_model_config(config)
    if model_config.get("pipeline_stages", 0):
        # the model's shard_map needs the live mesh (not JSON-dumped:
        # dump_model_configs re-derives from the yaml config)
        model_config = dict(model_config, pipeline_mesh=mesh)
    if model_config.get("seq_shard") and mesh.shape["model"] > 1:
        model_config = dict(model_config, seq_shard_mesh=mesh)
    else:
        model_config = dict(model_config, seq_shard=False)
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
    steps_per_call = int(config.get("steps_per_call", 0))
    if steps_per_call <= 0:
        # remote-attached TPUs pay seconds of dispatch per launch;
        # amortise with multi-step scan calls there, stay single-step
        # on CPU (test) backends to keep compiles cheap
        steps_per_call = 1 if jax.default_backend() == "cpu" else 32
    n_accum = int(config.get("grad_accum", 1))
    if n_accum > 1 and config.batch_size % n_accum:
        raise ValueError(
            f"grad_accum={n_accum} must divide batch_size="
            f"{config.batch_size}"
        )

    preload = bool(config.get("preload_dataset", True))
    # background collation ahead of the device (one K-step launch's
    # worth + slack); disabled on single-step CPU runs
    prefetch = int(
        config.get(
            "prefetch_batches",
            0 if steps_per_call == 1 else 2 * steps_per_call,
        )
    )
    train_dl = BatchedLoader(
        datasets["train"],
        collator,
        config.batch_size,
        shuffle=True,
        seed=config.seed,
        preload=preload,
        prefetch=prefetch,
    )
    eval_dl = BatchedLoader(
        datasets["test"],
        collator,
        config.batch_size,
        preload=preload,
        prefetch=prefetch,
    )
    num_training_steps = config.epochs * len(train_dl)
    schedule = hf_lr_schedule(
        config.lr_scheduler_type,
        config.lr,
        config.num_warmup_steps,
        num_training_steps,
    )
    tx = make_optimizer(config, num_training_steps)

    first_batch = shard_batch(train_dl.first_batch(), mesh)
    state = init_state(model, tx, first_batch, config.seed)
    # fsdp: ZeRO-style param/optimizer sharding over the 'data' axis
    # (forward all-gathers + backward reduce-scatters inserted by the
    # XLA partitioner; shard-local AdamW).  Off by default — at the
    # reference's 16M parameters replication is faster.
    use_fsdp = bool(config.get("fsdp", False)) and mesh.shape["data"] > 1
    from mca_tpu.parallel.sharding import FSDP_MIN_SIZE

    fsdp_min = int(config.get("fsdp_min_size", FSDP_MIN_SIZE))
    state["params"] = shard_params(
        state["params"], mesh, fsdp=use_fsdp, fsdp_min_size=fsdp_min
    )
    if use_fsdp:
        from mca_tpu.parallel.mesh import replicated
        from mca_tpu.parallel.sharding import shard_opt_state

        state["opt_state"] = shard_opt_state(
            tx.init(state["params"]),
            mesh,
            fsdp=True,
            fsdp_min_size=fsdp_min,
        )
        state["step"] = jax.device_put(state["step"], replicated(mesh))

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

    # multi-host: every process runs this same loop over the same
    # deterministic loader; each stages only ITS rows of every global
    # batch (parallel.multihost) and rank 0 owns the JSONL/wandb
    # stream.  Orbax checkpoint calls stay on ALL processes (they
    # coordinate internally).  jax.distributed must have been
    # initialized before backend init (main() calls init_multihost).
    from mca_tpu.parallel.multihost import make_stager

    n_proc = jax.process_count()
    _stage = make_stager(mesh, int(config.batch_size))

    wandb_cfg = make_wandb_config(config)
    from mca_tpu.parallel.multihost import is_primary

    if is_primary():
        log = JSONLLogger(config.output_dir, wandb_config=wandb_cfg)
    else:
        from mca_tpu.utils.logging import NullLogger

        log = NullLogger()
    tokens_per_step = config.batch_size * int(
        sum(
            e["max_tokens"] for e in config.encoder_configs.values()
        )
        + config.num_fusion_tokens
    )
    meter = ThroughputMeter(tokens_per_step)

    # flat single-vector state: fastest path, pure-DP only (tensor
    # parallelism needs the parameter tree structure)
    flat_mode = (
        steps_per_call > 1
        and bool(config.get("flat_state", True))
        and int(config.mesh_model) <= 1
    )
    step_out_shardings = None
    if use_fsdp and not flat_mode:
        from mca_tpu.parallel.mesh import replicated
        from mca_tpu.parallel.sharding import state_shardings

        step_out_shardings = (
            state_shardings(state),
            replicated(mesh),  # prefix: every metric replicated
        )
    train_step = make_train_step(
        model,
        tx,
        schedule,
        dropout_seed=config.seed,
        out_shardings=step_out_shardings,
        n_accum=n_accum,
    )
    metric_names = step_metric_names(
        model, tx, schedule, state, first_batch
    )
    # eval-name layout needs the parameter TREE; capture before any
    # flat-state conversion
    eval_names = eval_output_names(
        model, model_config, state["params"], first_batch
    )
    unravel = None
    if flat_mode:
        flat0, unravel, flat_tx = make_flat_apparatus(
            config,
            num_training_steps,
            state["params"],
            pad_to_multiple=mesh.shape["data"] if use_fsdp else 1,
        )
        if use_fsdp:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from mca_tpu.parallel.mesh import replicated
            from mca_tpu.parallel.sharding import (
                shard_opt_state,
                state_shardings,
            )

            flat0 = jax.device_put(flat0, NamedSharding(mesh, P("data")))
            opt0 = shard_opt_state(
                flat_tx.init(flat0),
                mesh,
                fsdp=True,
                fsdp_min_size=min(fsdp_min, int(flat0.size)),
            )
        else:
            opt0 = flat_tx.init(flat0)
        state = {
            "flat": flat0,
            "opt_state": opt0,
            "step": state["step"],
        }
        if use_fsdp:
            step_out_shardings = (
                state_shardings(state),
                replicated(mesh),
            )
        train_steps = make_flat_train_step_scan(
            model,
            flat_tx,
            schedule,
            unravel,
            metric_names,
            dropout_seed=config.seed,
            out_shardings=step_out_shardings,
            n_accum=n_accum,
        )
        unravel_jit = jax.jit(unravel)
    elif steps_per_call > 1:
        train_steps = make_train_step_scan(
            model,
            tx,
            schedule,
            metric_names,
            dropout_seed=config.seed,
            out_shardings=step_out_shardings,
            n_accum=n_accum,
        )
    else:
        train_steps = None
    eval_step = (
        make_eval_step(model, *eval_names),
        make_eval_step_scan(model, *eval_names)
        if steps_per_call > 1
        else None,
        eval_names,
        steps_per_call,
    )

    def current_params(state):
        return (
            unravel_jit(state["flat"]) if flat_mode else state["params"]
        )

    def state_for_checkpoint(state):
        """Checkpoint layout always carries the parameter TREE under
        'params' so inference/restart work across modes."""
        if not flat_mode:
            return state
        return {
            "params": current_params(state),
            "opt_state": state["opt_state"],
            "step": state["step"],
        }

    def _coerce_opt_state(raw_opt, target_opt):
        """Coerce a restored (target-less, dict-form) optimizer state
        onto the runtime structure, zero-padding 1-D moment tails.

        Checkpoints written with an unpadded flat state (e.g.
        ``tools/import_checkpoint.py --with-optimizer``, which builds
        with pad_to_multiple=1) must restore into an FSDP run whose
        flat vector is padded to ``mesh.shape['data']``.  The pad tail
        is numerically inert (same argument as the params pad in
        :func:`make_flat_apparatus`), so zero-padding the restored
        mu/nu tails is exact.  Leaf order: orbax restores tuples /
        namedtuples as dicts keyed '0'..'n' / by field name; jax
        flattens dicts in sorted-key order, which matches positional /
        namedtuple field order for the small optax chain states used
        here.  Any mismatch raises and the caller falls back to a
        params-only restore."""
        t_leaves, treedef = jax.tree.flatten(target_opt)
        r_leaves = jax.tree.leaves(raw_opt)
        if len(r_leaves) != len(t_leaves):
            raise ValueError(
                f"opt_state leaf count {len(r_leaves)} != "
                f"{len(t_leaves)}"
            )
        out, padded = [], False
        for t, r in zip(t_leaves, r_leaves):
            t_shape = tuple(np.shape(t))
            r = np.asarray(r)
            if len(t_shape) == 1 and r.ndim == 1 and r.shape[0] < t_shape[0]:
                r = np.concatenate(
                    [r, np.zeros(t_shape[0] - r.shape[0], r.dtype)]
                )
                padded = True
            if r.shape != t_shape:
                raise ValueError(
                    f"opt_state leaf shape {r.shape} not coercible "
                    f"to {t_shape}"
                )
            # Re-place ONLY mesh-aware (NamedSharding) leaves — the
            # FSDP flat layout the pad exists for.  Committing plain
            # single-device leaves here would pin them to device 0 and
            # clash with sharded batches at the next jit (restored
            # leaves stay numpy/uncommitted so jit places them freely,
            # as the pre-coercion restore did).
            if isinstance(
                getattr(t, "sharding", None),
                jax.sharding.NamedSharding,
            ):
                r = jax.device_put(r, t.sharding)
            out.append(r)
        if padded:
            logger.info(
                "optimizer state restored with zero-padded 1-D "
                "moment tails (unpadded checkpoint into a padded "
                "FSDP run)"
            )
        return jax.tree.unflatten(treedef, out)

    def restore_state(state, restart_dir):
        """Restart from a checkpoint saved in either state mode:
        params (always a tree) + step always restore; the optimiser
        state restores when its structure matches — including a
        shorter unpadded flat state restored into a padded FSDP run
        (moment tails zero-padded) — else restarts fresh with a
        warning (e.g. flat <-> tree mode switch)."""
        target = state_for_checkpoint(state)
        try:
            restored = ckpt.load_state(restart_dir, target=target)
            # orbax returns the SAVED leaf shapes even under a target,
            # so an unpadded flat checkpoint restores short 1-D moments
            # into a padded FSDP run — coerce unconditionally (an exact
            # match is an identity pass)
            restored["opt_state"] = _coerce_opt_state(
                restored["opt_state"], target["opt_state"]
            )
        except Exception:
            raw = ckpt.load_state(restart_dir)
            restored = dict(target)
            restored["params"] = jax.tree.map(
                lambda t, r: np.asarray(r),
                target["params"],
                raw["params"],
            )
            restored["step"] = jnp.asarray(raw.get("step", 0))
            try:
                restored["opt_state"] = _coerce_opt_state(
                    raw["opt_state"], target["opt_state"]
                )
            except Exception as e:
                logger.warning(
                    "optimizer state in %s does not match the current "
                    "training mode (%s); restoring parameters only",
                    restart_dir,
                    e,
                )
        if flat_mode:
            from jax.flatten_util import ravel_pytree

            flat = ravel_pytree(restored["params"])[0]
            step_v = jnp.asarray(restored["step"])
            if use_fsdp:
                # back to the padded, 'data'-sharded layout the scan
                # executable was compiled for
                from jax.sharding import NamedSharding, PartitionSpec as P
                from mca_tpu.parallel.mesh import replicated

                pad = int(state["flat"].shape[0]) - int(flat.shape[0])
                if pad:
                    flat = jnp.concatenate(
                        [flat, jnp.zeros((pad,), flat.dtype)]
                    )
                flat = jax.device_put(flat, NamedSharding(mesh, P("data")))
                step_v = jax.device_put(step_v, replicated(mesh))
            return {
                "flat": flat,
                "opt_state": restored["opt_state"],
                "step": step_v,
            }
        return restored

    if config.restart:
        logger.info("Loading saved state from %s", config.restart)
        state = restore_state(state, config.restart)
    # metrics of the in-flight launch: (packed_device, k, base_step,
    # epoch).  Draining one launch late lets the host stack/H2D-stage
    # the next chunk while the device computes (JAX dispatch is
    # async; the old immediate device_get serialised host and device).
    pending_metrics = []
    host_step = int(state["step"])

    # mid-epoch resume: a restart from an n_step_checkpoint restores a
    # step count INSIDE an epoch; fast-forward the deterministic
    # loader past the already-trained batches instead of replaying
    # them (the reference only restarts at epoch boundaries,
    # train_accel_gpu.py restart_cfg).  Applies when the restored step
    # places us inside config.start_epoch; epoch-boundary restarts
    # have step % steps_per_epoch == 0 and skip nothing.
    steps_per_epoch = len(train_dl)
    start_epoch = int(config.start_epoch)
    _resume_skip = [0]
    if config.restart and steps_per_epoch and host_step:
        full_epochs, into_epoch = divmod(host_step, steps_per_epoch)
        if start_epoch == 0 and full_epochs > 0:
            # default start_epoch with a restored step deep in the
            # schedule: derive the epoch instead of silently
            # re-training epochs 0..full_epochs on the restored state
            logger.info(
                "restored step %d implies start_epoch %d — resuming "
                "there (set start_epoch explicitly to override)",
                host_step,
                full_epochs,
            )
            start_epoch = full_epochs
        if into_epoch:
            if full_epochs == start_epoch:
                _resume_skip[0] = into_epoch
                logger.info(
                    "mid-epoch resume: skipping %d already-trained "
                    "batches of epoch %d",
                    into_epoch,
                    full_epochs,
                )
            else:
                logger.warning(
                    "restored step %d sits inside epoch %d but "
                    "start_epoch=%d — NOT fast-forwarding; batches "
                    "of this epoch will be replayed on the restored "
                    "state",
                    host_step,
                    full_epochs,
                    start_epoch,
                )

    halt_on_nan = bool(config.get("halt_on_nan", True))
    # grad_norm is the robust death signal: with NaN parameters the
    # NaN-safe pair averaging in the loss masks every pair and reports
    # total_loss == 0.0, but the gradient norm goes NaN at the exact
    # step training dies
    _guard_cols = tuple(
        (name, metric_names.index(name))
        for name in ("total_loss", "grad_norm")
        if name in metric_names
    )

    def _check_finite(pairs, step):
        if not halt_on_nan:
            return
        for name, val in pairs:
            val = float(val)
            if not np.isfinite(val):
                raise DivergenceError(
                    f"{name} is {val} at step {step} — diverged "
                    "(halt_on_nan: false to disable this guard)"
                )

    def _forensic_save(st):
        """On divergence: the post-divergence state (NaN params and
        moments included) in the usual layout for offline autopsy; the
        JSONL already holds the NaN step rows.  Called at the raise
        site because the lagged metrics drain means the loop-level
        state variable may reference donated buffers."""
        try:
            ckpt.wait_for_saves()
            ckpt.save_state(
                state_for_checkpoint(st),
                os.path.join(config.output_dir, "diverged"),
            )
            logger.error(
                "training diverged — state saved to %s/diverged",
                config.output_dir,
            )
        except Exception:
            logger.exception("forensic checkpoint failed")

    def drain_pending():
        if not pending_metrics:
            return
        packed, k, base_step, epoch_ = pending_metrics.pop()
        host = np.asarray(jax.device_get(packed))  # [K, M]
        meter.step(k)  # one stamp per launch (burst-exact rate)
        for i in range(k):
            _log_metrics(
                dict(zip(metric_names, host[i])),
                None,
                epoch_,
                base_step + i + 1,
            )
        for i in range(k):
            _check_finite(
                ((n, host[i, c]) for n, c in _guard_cols),
                base_step + i + 1,
            )

    scan_mode = train_steps is not None
    stage_dtype = config.get("stage_dtype", "fp32")
    sentinels = staging_sentinels(config)

    def _prep_chunk(chunk):
        """Producer-side chunk assembly: narrowing + stacking happen in
        the prefetch thread so the main thread only device_puts and
        dispatches (host work off the critical path)."""
        chunk = [
            narrow_for_staging(b, stage_dtype, sentinels)
            for b in chunk
        ]
        if scan_mode:
            return stack_batches(chunk), len(chunk)
        return list(chunk), len(chunk)

    def _chunk_stream():
        chunk = []
        if _resume_skip[0]:
            # index-level fast-forward: skipped batches are never
            # fetched or collated (batch content is a pure function
            # of index under the deterministic per-epoch shuffle)
            train_dl.skip_batches(_resume_skip[0])
            _resume_skip[0] = 0  # only the first resumed epoch skips
        for b in train_dl:
            chunk.append(b)
            if len(chunk) == steps_per_call:
                yield _prep_chunk(chunk)
                chunk = []
        # a remainder chunk of any length scans fine, it just compiles
        # once per distinct length
        if chunk:
            yield _prep_chunk(chunk)

    def flush_payload(state, payload, k, epoch):
        """Run one prepared chunk through one launch."""
        nonlocal host_step
        if not scan_mode:
            for b in payload:
                state, metrics = train_step(state, _stage(b))
                meter.step()
                _log_metrics(metrics, state, epoch, None)
                try:
                    _check_finite(
                        (
                            (n, metrics[n])
                            for n, _ in _guard_cols
                        ),
                        int(state["step"]),
                    )
                except DivergenceError:
                    _forensic_save(state)
                    raise
            return state
        stacked = _stage(payload, leading_scan_axis=True)
        state, packed = train_steps(state, stacked)
        try:
            drain_pending()
        except DivergenceError:
            _forensic_save(state)
            raise
        pending_metrics.append((packed, k, host_step, epoch))
        host_step += k
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

    # Preemption guard (``preempt_save``, default on): TPU VMs get a
    # SIGTERM with a short grace window on spot preemption/maintenance.
    # The handler only flips a flag; the loop acts on it at the next
    # launch boundary, so the in-flight executable finishes and
    # ``state`` is a consistent post-update snapshot.  Installable from
    # the main thread only (CPython signal restriction) — library
    # callers on worker threads simply run unguarded.
    preempt_flag = [False]
    _old_sigterm = None
    if bool(config.get("preempt_save", True)):
        import signal as _signal
        import threading as _threading

        if _threading.current_thread() is _threading.main_thread():

            def _on_sigterm(signum, frame):
                preempt_flag[0] = True
                logger.warning(
                    "SIGTERM received — checkpointing and exiting at "
                    "the next launch boundary"
                )

            _old_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)

    def _restore_sigterm():
        nonlocal _old_sigterm
        if _old_sigterm is not None:
            import signal as _signal

            _signal.signal(_signal.SIGTERM, _old_sigterm)
            _old_sigterm = None

    def _preempt_shutdown(st, epoch_):
        """Clean stop: flush in-flight metrics, write the root-layout
        state checkpoint that mid-epoch resume understands
        (:func:`restore_state` + the loader fast-forward), drop a
        ``preempted.json`` marker, raise :class:`PreemptedError`."""
        try:
            drain_pending()
        except DivergenceError:
            _forensic_save(st)
            raise
        ckpt.wait_for_saves()
        ckpt.save_state(state_for_checkpoint(st), config.output_dir)
        step = int(jax.device_get(st["step"]))
        from mca_tpu.parallel.multihost import is_primary

        if is_primary():
            with open(
                os.path.join(config.output_dir, "preempted.json"), "w"
            ) as f:
                json.dump(
                    {
                        "step": step,
                        "epoch": epoch_,
                        "signal": "SIGTERM",
                        # the rescheduled run reattaches to this wandb
                        # run automatically (make_wandb_config)
                        "wandb_id": getattr(log, "wandb_id", None),
                    },
                    f,
                )
        logger.warning(
            "preempted at step %d — state saved; resume with "
            "restart: %s",
            step,
            config.output_dir,
        )
        log.close()
        raise PreemptedError(step, config.output_dir)

    try:
        for epoch in range(start_epoch, config.epochs):
            train_dl.set_epoch(epoch)
            nb_done = _resume_skip[0]  # keep n_step buckets aligned
            last_ckpt_bucket = (
                nb_done // config.n_step_checkpoint
                if config.n_step_checkpoint
                else 0
            )
            if scan_mode and getattr(train_dl, "prefetch", 0) > 0:
                # chunk-level producer thread: collation (loader thread)
                # feeds stacking (this thread) feeds device_put (main)
                from mca_tpu.data.dataset import _PrefetchIterator

                stream = _PrefetchIterator(_chunk_stream, 1)
            else:
                stream = _chunk_stream()
            try:
                for payload, k in stream:
                    # only full-size chunks count toward the traced
                    # "post-warmup" launch: a remainder chunk compiles a
                    # fresh K-length graph, which would dominate the trace
                    if k == steps_per_call:
                        launches += 1
                    if trace_dir and launches == 2 and k == steps_per_call:
                        from mca_tpu.utils.logging import trace_context

                        with trace_context(trace_dir):
                            state = flush_payload(state, payload, k, epoch)
                    else:
                        state = flush_payload(state, payload, k, epoch)
                    nb_done += k
                    if preempt_flag[0]:
                        _preempt_shutdown(state, epoch)
                    if config.n_step_checkpoint:
                        bucket = nb_done // config.n_step_checkpoint
                        if bucket != last_ckpt_bucket:
                            last_ckpt_bucket = bucket
                            ckpt.save_state(
                                state_for_checkpoint(state),
                                config.output_dir,
                                asynchronous=True,
                            )
            finally:
                close = getattr(stream, "close", None)
                if close is not None:  # stop the producer on error paths
                    close()
            try:
                drain_pending()  # epoch boundary: flush in-flight metrics
            except DivergenceError:
                _forensic_save(state)
                raise
            # async: the disk write overlaps the next epoch's launches (the
            # device->host copy completes before return, so donation-safe)
            ckpt.save_state(
                state_for_checkpoint(state),
                os.path.join(config.output_dir, str(epoch)),
                asynchronous=True,
            )
            if config.get("checkpoint_keep", 0):
                ckpt.wait_for_saves()  # don't prune a dir mid-write
                _prune_checkpoints(
                    config.output_dir, epoch, config.checkpoint_keep
                )
            if config.run_eval_loop:
                run_eval_epoch(
                    config,
                    model_config,
                    eval_step,
                    current_params(state),
                    eval_dl,
                    mesh,
                    log,
                    int(state["step"]),
                    stage=_stage,
                )
    finally:
        # all exits (normal, preempt, divergence, unexpected)
        # hand SIGTERM back — a leaked handler would flip a dead
        # flag on the next train() in this process
        _restore_sigterm()
    drain_pending()
    ckpt.wait_for_saves()
    final_params = current_params(state)
    ckpt.save_params(final_params, config.output_dir)
    from mca_tpu.parallel.multihost import is_primary as _is_primary

    if config.get("export_safetensors", True) and _is_primary():
        # also emit the reference's save_model format (ref
        # train_accel_gpu.py:187): a reference-named model.safetensors
        # the torch scripts can load directly (mca_tpu.interop)
        try:
            from safetensors.numpy import save_file

            from mca_tpu.interop import export_state_dict

            sd = {
                key: np.ascontiguousarray(np.asarray(v))
                for key, v in export_state_dict(
                    jax.device_get(final_params)
                ).items()
            }
            save_file(
                sd, os.path.join(config.output_dir, "model.safetensors")
            )
        except Exception:
            logger.exception("safetensors export failed (non-fatal)")
    if _is_primary():
        # the marker means "preempted and unfinished": clear a stale
        # one from an earlier SIGTERM so a future restart of this
        # (now completed) dir does not re-attach to the old wandb run
        try:
            os.remove(os.path.join(config.output_dir, "preempted.json"))
        except OSError:
            pass
    log.close()
    return config.output_dir


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    # must precede the first backend touch (jax.devices in make_mesh);
    # env-gated no-op for single-host runs.  Multi-host runs should
    # set an explicit output_dir (the auto-timestamped dedup could
    # race across hosts).
    from mca_tpu.parallel.multihost import init_multihost

    init_multihost()
    argv = argv if argv is not None else sys.argv[1:]
    if jax.process_count() > 1:
        # every process derives its own auto-timestamped output dir —
        # a 1s skew would point Orbax's coordinated saves at different
        # paths, so multi-host runs must pin the dir explicitly
        import yaml as _yaml

        with open(argv[0]) as f:
            raw = _yaml.safe_load(f) or {}
        if not raw.get("output_dir"):
            raise ValueError(
                "multi-host runs must set an explicit output_dir "
                "(auto-timestamped dirs race across hosts)"
            )
    config = training_config(argv[0])
    try:
        train(config)
    except PreemptedError as e:
        # EX_TEMPFAIL: the orchestrator should reschedule with
        # ``restart: <output_dir>`` (or just re-run — the marker +
        # root checkpoint carry the step)
        logger.warning("%s", e)
        sys.exit(75)


if __name__ == "__main__":
    main()
