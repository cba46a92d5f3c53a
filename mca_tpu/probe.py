"""Linear/MLP probe evaluation: ``python -m mca_tpu.probe <eval.yaml>``.

TPU rebuild of ``/root/reference/lp_accel_gpu.py``: loads the six
embedding/mask/label files produced by :mod:`mca_tpu.infer` (or by the
reference's own inference script — the ``.pt`` format is shared),
optionally computes retrieval rank metrics and uniformity/alignment per
modality, then trains a linear or MLP head on the fusion embeddings.

- ``task`` selects the label column; ``-1`` keeps all columns
  (ref lp_accel_gpu.py:22-35),
- ``loss_type`` ∈ {L1, MSE, BCE, CE} with the matching metric suite
  (PCC for regression; precision/recall/accuracy/F1/specificity/
  AUROC/AUPRC/confusion matrix for classification, ref :121-157),
- AdamW + HF LR schedule + gradient clipping, per-epoch train/eval
  metric logs (ref :182-231).

The reference's rank-metric path crashed as-committed (mismatched
callsite, ref :72-76); here it is implemented correctly: each
modality's embeddings retrieve their own sample's fusion embedding
within the split.
"""

from __future__ import annotations

import logging
import sys
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from mca_tpu.config import Config, embedding_eval_config
from mca_tpu.encoders import torch_linear_init
from mca_tpu.infer import load_embedding_file, load_label_file
from mca_tpu.metrics import (
    alignment,
    binary_metrics,
    multiclass_metrics,
    pearson_r,
    rank_metrics,
    uniformity,
)
from mca_tpu.train import hf_lr_schedule
from mca_tpu.utils.logging import JSONLLogger
from mca_tpu.utils.trees import global_norm

logger = logging.getLogger(__name__)


class ProbeHead(nn.Module):
    """Linear head or 2-layer MLP (ref lp_accel_gpu.py:109-117)."""

    num_labels: int
    model_type: str = "linear"
    hidden_size: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.model_type == "linear":
            return nn.Dense(
                self.num_labels, kernel_init=torch_linear_init
            )(x)
        h = nn.Dense(
            self.hidden_size, kernel_init=torch_linear_init
        )(x)
        if not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = nn.relu(h)
        return nn.Dense(
            self.num_labels, kernel_init=torch_linear_init
        )(h)


def make_loss_fn(loss_type: str):
    if loss_type == "L1":
        return lambda pred, y: jnp.abs(
            pred.squeeze() - y
        ).mean()
    if loss_type == "MSE":
        return lambda pred, y: jnp.square(
            pred.squeeze() - y
        ).mean()
    if loss_type == "BCE":
        return lambda pred, y: optax.sigmoid_binary_cross_entropy(
            pred.squeeze(), y
        ).mean()
    if loss_type == "CE":
        return lambda pred, y: optax.softmax_cross_entropy_with_integer_labels(
            pred, y.astype(jnp.int32)
        ).mean()
    raise ValueError(f"unknown loss_type {loss_type!r}")


def compute_suite(
    loss_type: str, logits: np.ndarray, labels: np.ndarray
) -> Dict[str, Any]:
    if loss_type in ("L1", "MSE"):
        return {"PCC": pearson_r(logits.squeeze(), labels)}
    if loss_type == "BCE":
        return binary_metrics(logits, labels)
    if loss_type == "CE":
        return multiclass_metrics(
            logits, labels, num_classes=logits.shape[-1]
        )
    raise ValueError(loss_type)


def select_task(labels: np.ndarray, task: int) -> np.ndarray:
    labels = np.asarray(labels).squeeze()
    if task == -1 or labels.ndim == 1:
        return labels
    return labels[:, task]


def resolve_embedding_key(config, embeddings):
    """The embedding the probe reads: ``'fusion'`` (default, ref
    lp_accel_gpu.py:23) or ``embedding_key: "combo:i,j,..."`` — a
    modality-combo readout for families without a fusion stream.
    The reference itself aliases ``outputs['fusion'] =
    outputs[fcl_root]`` when a fusion stream exists (ref
    model.py:189-190); with ``no_fusion`` (EAO) no 'fusion' key is
    ever emitted and the reference's own EAO eval configs crash at
    lp_accel_gpu.py:72 — selecting the fcl_root combo explicitly is
    the working equivalent."""
    spec = str(config.get("embedding_key", "fusion"))
    if spec.startswith("combo:"):
        key = frozenset(
            int(i) for i in spec.split(":", 1)[1].split(",")
        )
    else:
        key = spec
    if key not in embeddings:
        raise KeyError(
            f"embedding_key {spec!r} not in the embedding file "
            f"(keys: {sorted(embeddings, key=str)})"
        )
    return key


def log_rank_metrics(
    e_train, m_train, e_test, m_test, log: JSONLLogger,
    target_key="fusion",
) -> None:
    """Retrieval + embedding-space metrics per modality
    (ref lp_accel_gpu.py:70-97, fixed)."""
    modality_keys = [
        k
        for k in e_train.keys()
        if isinstance(k, str) and k != "fusion" and k != target_key
    ]
    for k in modality_keys:
        metrics = {}
        for split, e, m in (
            ("train", e_train, m_train),
            ("test", e_test, m_test),
        ):
            mask = np.asarray(m[k]).astype(bool)
            rm = rank_metrics(e[k], e[target_key], mask=mask)
            metrics.update(
                {f"{split}_{name}": v for name, v in rm.items()}
            )
            metrics[f"{split}_uniformity"] = uniformity(
                np.asarray(e[k])[mask]
            )
            metrics[f"{split}_alignment"] = alignment(
                np.asarray(e[k])[mask],
                np.asarray(e[target_key])[mask],
            )
        log.log({f"{k}_{n}": v for n, v in metrics.items()})
    log.log(
        {
            "train_uniformity_fusion": uniformity(
                np.asarray(e_train[target_key])
            ),
            "test_uniformity_fusion": uniformity(
                np.asarray(e_test[target_key])
            ),
        }
    )


def ridge_probe(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_test: np.ndarray,
    lam: float = 1e-3,
) -> tuple:
    """Closed-form regularised least-squares linear probe.

    Extension over the reference (which only has SGD linear/MLP heads):
    contrastive embeddings concentrate class signal in low-variance
    directions that SGD-CE reaches slowly; the normal-equations solve
    finds them directly and deterministically.
    """
    y2d = y_train if y_train.ndim > 1 else y_train[:, None]
    # float64 throughout: the normal equations square the condition
    # number and fp32 loses the low-variance discriminative directions
    xb = np.concatenate(
        [x_train, np.ones((len(x_train), 1))], axis=1
    ).astype(np.float64)
    w = np.linalg.solve(
        xb.T @ xb + lam * np.eye(xb.shape[1]),
        xb.T @ y2d.astype(np.float64),
    )

    def predict(x):
        xb = np.concatenate(
            [x, np.ones((len(x), 1))], axis=1
        ).astype(np.float64)
        return (xb @ w).astype(np.float32)

    return predict(x_train), predict(x_test)


def _per_sample_loss(loss_type: str):
    """Per-sample (batch-dim-preserving) variant of make_loss_fn —
    required by the scanned loop's masked remainder batch (the host
    loop's remainder is a smaller batch; the scan pads it and weights
    pad rows to zero, giving the same masked-mean loss value)."""

    def _tail_mean(x):
        return x.reshape(x.shape[0], -1).mean(axis=1)

    def _sq(pred, y):
        # the host path's pred.squeeze(): with batch >= 2 only the
        # label dim can be size-1 (scalar-regression / binary heads)
        if pred.shape[-1] == 1 and y.ndim == pred.ndim - 1:
            return pred[..., 0]
        return pred

    if loss_type == "L1":
        return lambda pred, y: _tail_mean(jnp.abs(_sq(pred, y) - y))
    if loss_type == "MSE":
        return lambda pred, y: _tail_mean(jnp.square(_sq(pred, y) - y))
    if loss_type == "BCE":
        return lambda pred, y: _tail_mean(
            optax.sigmoid_binary_cross_entropy(_sq(pred, y), y)
        )
    if loss_type == "CE":
        return lambda pred, y: (
            optax.softmax_cross_entropy_with_integer_labels(
                pred, y.astype(jnp.int32)
            )
        )
    raise ValueError(f"unknown loss_type {loss_type!r}")


def _scanned_probe_loop(
    config, head, loss_fn, tx, schedule,
    x_train, y_train, x_test, y_test,
    params, opt_state, steps_per_epoch, log,
):
    """The probe epoch loop as chunked ``lax.scan`` launches.

    Each chunk launch scans ``chunk`` epochs; an inner scan runs the
    per-epoch shuffled batches (remainder batch padded with
    zero-weighted rows).  Per-epoch training logits, eval logits and
    the loss/grad-norm/param-norm telemetry come back stacked, so the
    host computes the SAME metric suite and JSONL rows as the host
    loop with zero device launches per epoch."""
    n_train = len(x_train)
    B = min(int(config.batch_size), n_train)
    S = max(-(-n_train // B), 1)
    pad = S * B - n_train
    epochs = int(config.epochs)
    chunk = max(1, int(config.get("scan_epochs_chunk", 256)))
    per_sample = _per_sample_loss(config.loss_type)

    xt = jnp.asarray(x_train)
    yt = jnp.asarray(y_train)
    xe = jnp.asarray(x_test)

    def epoch_body(carry, key):
        params, opt_state = carry
        perm = jax.random.permutation(key, n_train)
        if pad:
            perm = jnp.concatenate(
                [perm, jnp.full((pad,), -1, perm.dtype)]
            )
        idx = perm.reshape(S, B)

        def step_body(c, ib):
            params, opt_state = c
            valid = (ib >= 0).astype(jnp.float32)
            safe = jnp.maximum(ib, 0)
            xi, yi = xt[safe], yt[safe]

            def lf(p):
                logits = head.apply(p, xi)
                ps = per_sample(logits, yi).astype(jnp.float32)
                return (ps * valid).sum() / jnp.maximum(
                    valid.sum(), 1.0
                ), logits

            (loss, logits), grads = jax.value_and_grad(
                lf, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (
                loss, logits, global_norm(grads)
            )

        (params, opt_state), (losses, logits, gns) = jax.lax.scan(
            step_body, (params, opt_state), idx
        )
        ev = head.apply(params, xe)
        out = (
            losses, logits, gns, ev, idx, global_norm(params)
        )
        return (params, opt_state), out

    @jax.jit
    def run_chunk(params, opt_state, keys):
        return jax.lax.scan(epoch_body, (params, opt_state), keys)

    keys = jax.random.split(jax.random.key(config.seed + 1), epochs)
    # position-based validity is identical every epoch (pads at the
    # permutation tail)
    valid_pos = (np.arange(S * B) < n_train)
    loss_fn_host = loss_fn
    # the host-side metric suite (AUROC sort etc.) costs ~0.2 s/epoch
    # — at the reference's canonical 10001 epochs it would dominate
    # the scanned loop; metrics_every thins the full rows (losses are
    # free, the LAST epoch always gets the full suite)
    metrics_every = max(1, int(config.get("metrics_every", 1)))
    final_metrics: Dict[str, Any] = {}
    done = 0
    while done < epochs:
        k = min(chunk, epochs - done)
        (params, opt_state), outs = run_chunk(
            params, opt_state, keys[done : done + k]
        )
        losses, logits, gns, evs, idxs, pnorms = jax.device_get(outs)
        for e in range(k):
            epoch = done + e
            if (
                (epoch + 1) % metrics_every != 0
                and epoch != epochs - 1
            ):
                continue
            lg = logits[e].reshape(S * B, -1)[valid_pos]
            yy = np.asarray(y_train)[
                idxs[e].reshape(S * B)[valid_pos]
            ]
            train_met = compute_suite(config.loss_type, lg, yy)
            eval_loss = float(
                loss_fn_host(jnp.asarray(evs[e]), jnp.asarray(y_test))
            )
            eval_met = compute_suite(
                config.loss_type, evs[e], np.asarray(y_test)
            )
            record = {
                "train_loss": float(losses[e].mean()),
                "eval_loss": eval_loss,
                "lr": float(schedule(epoch * steps_per_epoch)),
                "param_norm": float(pnorms[e]),
                "grad_norm": float(gns[e][-1]),
            }
            record.update(
                {
                    f"train_{k2}": v
                    for k2, v in train_met.items()
                    if k2 != "cm"
                }
            )
            record.update(
                {
                    f"eval_{k2}": v
                    for k2, v in eval_met.items()
                    if k2 != "cm"
                }
            )
            log.log(record, step=epoch)
            final_metrics = record
        done += k
    return final_metrics


def probe(config: Config) -> Dict[str, Any]:
    """Train the probe head; returns the final epoch's metrics."""
    d = config.embedding_dir
    e_train = load_embedding_file(f"{d}/train_embeddings")
    m_train = load_embedding_file(f"{d}/train_masks")
    s_train = select_task(
        load_label_file(f"{d}/train_labels"), config.task
    )
    e_test = load_embedding_file(f"{d}/eval_embeddings")
    m_test = load_embedding_file(f"{d}/eval_masks")
    s_test = select_task(
        load_label_file(f"{d}/eval_labels"), config.task
    )
    log = JSONLLogger(config.output_dir)
    emb_key = resolve_embedding_key(config, e_train)

    if config.rank_metrics:
        log_rank_metrics(
            e_train, m_train, e_test, m_test, log,
            target_key=emb_key,
        )

    x_train = np.asarray(e_train[emb_key], np.float32)
    x_test = np.asarray(e_test[emb_key], np.float32)
    y_train = np.asarray(s_train, np.float32)
    y_test = np.asarray(s_test, np.float32)
    num_labels = 1 if y_train.ndim == 1 else y_train.shape[1]
    if config.loss_type == "CE":
        # integer class labels (one-hot labels -> argmax)
        if y_train.ndim > 1:
            y_train = y_train.argmax(-1).astype(np.float32)
            y_test = y_test.argmax(-1).astype(np.float32)
        # CE implies integer class ids: size the head from the data
        # even for a 1-D label column (a binary column probed with CE
        # is a 2-class head).  The reference sizes the head 1 here and
        # torch CE crashes (lp_accel_gpu.py:104-107) — out-of-corpus
        # combination, handled rather than replicated.
        num_labels = max(
            int(max(y_train.max(), y_test.max())) + 1, 2
        )

    if config.model_type == "ridge":
        y_fit = (
            np.eye(num_labels, dtype=np.float32)[
                y_train.astype(np.int64)
            ]
            if config.loss_type == "CE"
            else y_train
        )
        tr_logits, te_logits = ridge_probe(
            x_train, y_fit, x_test,
            lam=float(config.get("ridge_lambda", 1e-3)),
        )
        record = {
            "train_loss": float(
                make_loss_fn(config.loss_type)(
                    jnp.asarray(tr_logits), jnp.asarray(y_train)
                )
            ),
            "eval_loss": float(
                make_loss_fn(config.loss_type)(
                    jnp.asarray(te_logits), jnp.asarray(y_test)
                )
            ),
        }
        for split, lg, y in (
            ("train", tr_logits, y_train),
            ("eval", te_logits, y_test),
        ):
            met = compute_suite(config.loss_type, lg, y)
            record.update(
                {
                    f"{split}_{k}": v
                    for k, v in met.items()
                    if k != "cm"
                }
            )
        log.log(record, step=0)
        log.close()
        return record

    head = ProbeHead(
        num_labels=num_labels,
        model_type=config.model_type,
        hidden_size=config.hidden_size,
        dropout=config.dropout,
    )
    loss_fn = make_loss_fn(config.loss_type)
    n_train = len(x_train)
    # ceil: the reference's DataLoader keeps the remainder batch
    # (lp_accel_gpu.py:100, no drop_last)
    steps_per_epoch = max(-(-n_train // config.batch_size), 1)
    num_training_steps = config.epochs * steps_per_epoch
    schedule = hf_lr_schedule(
        config.lr_scheduler_type,
        config.lr,
        config.num_warmup_steps,
        num_training_steps,
    )
    chain = []
    if config.clip:
        chain.append(optax.clip_by_global_norm(config.clip))
    chain.append(optax.adamw(schedule, weight_decay=0.01))
    tx = optax.chain(*chain)

    params = head.init(
        jax.random.key(config.seed), jnp.asarray(x_train[:2])
    )
    opt_state = tx.init(params)

    if bool(config.get("scan_epochs", False)):
        # relay-scale fast path: ALL epochs inside a few lax.scan
        # launches instead of 2+ launches (+ device gets) per epoch.
        # On the remote-attached TPU each launch costs ~90 ms of
        # dispatch (PERF.md), so the reference's canonical
        # 10001-epoch probe (ref TCGA_60i_eval.yaml) pays ~30 min of
        # pure dispatch on the host loop; the scanned loop runs it in
        # a handful of launches.  Shuffling uses jax.random instead
        # of the host numpy rng — statistically identical, not
        # bit-identical to the host loop (full-batch probes, where
        # order cannot matter, ARE pinned equal in tests).
        final_metrics = _scanned_probe_loop(
            config, head, loss_fn, tx, schedule,
            x_train, y_train, x_test, y_test,
            params, opt_state, steps_per_epoch, log,
        )
        log.close()
        return final_metrics

    @jax.jit
    def train_step(params, opt_state, x, y):
        def lf(p):
            logits = head.apply(p, x)
            return loss_fn(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            lf, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits, global_norm(grads)

    @jax.jit
    def eval_logits(params, x):
        return head.apply(params, x)

    rng = np.random.default_rng(config.seed)
    final_metrics: Dict[str, Any] = {}
    for epoch in range(config.epochs):
        order = rng.permutation(n_train)
        epoch_loss = 0.0
        preds, targs = [], []
        grad_norm = 0.0
        for s in range(steps_per_epoch):
            idx = order[
                s * config.batch_size : (s + 1) * config.batch_size
            ]
            params, opt_state, loss, logits, gn = train_step(
                params,
                opt_state,
                jnp.asarray(x_train[idx]),
                jnp.asarray(y_train[idx]),
            )
            epoch_loss += float(loss)
            grad_norm = float(gn)
            preds.append(np.asarray(logits))
            targs.append(y_train[idx])
        train_met = compute_suite(
            config.loss_type,
            np.concatenate(preds),
            np.concatenate(targs),
        )
        test_logits = np.asarray(eval_logits(params, jnp.asarray(x_test)))
        eval_loss = float(
            loss_fn(jnp.asarray(test_logits), jnp.asarray(y_test))
        )
        eval_met = compute_suite(config.loss_type, test_logits, y_test)
        record = {
            "train_loss": epoch_loss / steps_per_epoch,
            "eval_loss": eval_loss,
            "lr": float(schedule(epoch * steps_per_epoch)),
            "param_norm": float(global_norm(params)),
            "grad_norm": grad_norm,
        }
        record.update(
            {
                f"train_{k}": v
                for k, v in train_met.items()
                if k != "cm"
            }
        )
        record.update(
            {
                f"eval_{k}": v
                for k, v in eval_met.items()
                if k != "cm"
            }
        )
        log.log(record, step=epoch)
        final_metrics = record
    log.close()
    return final_metrics


def main(argv=None) -> None:
    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    config = embedding_eval_config(argv[0])
    probe(config)


if __name__ == "__main__":
    main()
