"""Contrastive pretraining loss stack.

- :func:`clip_contrastive_loss` — CLIP-style symmetric cross-entropy
  with a learnable clamped temperature (ref
  ``utils/contrastive_loss_with_temperature.py:40-107``): logits are raw
  dot products (NO L2 normalisation, faithful to the reference) scaled
  by ``exp(logit_scale)``; an optional per-sample bool mask selects
  which *rows* contribute (columns — the negatives — always span the
  full batch); an empty mask yields NaN, which the aggregation below
  masks out (the reference's semantics for all-missing batches).
- :class:`MCAPretrainingLoss` — the pair/FCL loss graph
  (ref model.py:126-233): modality/fusion pair selection, per-sample
  presence masking, fusion-channel losses against the root combo, and
  NaN-safe averaging.  One SHARED temperature parameter across all
  pairs by default (ref model.py:152-153).

Distribution: under ``jit`` over a batch-sharded input the loss is
written on the global batch and XLA inserts ICI collectives (GLOBAL
backprop mode by construction).  Pass ``axis_name`` only inside
``shard_map``, where an explicit differentiable all-gather builds the
global batch (``mca_tpu.parallel.collectives``).
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Dict, FrozenSet, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mca_tpu.parallel.collectives import (
    BackpropType,
    gather_tensor,
    global_labels,
)

Array = jax.Array

LOGIT_SCALE_INIT = math.log(1.0 / 0.07)
LOGIT_SCALE_MIN = math.log(1.0)
LOGIT_SCALE_MAX = math.log(100.0)


def combo_key(combo: FrozenSet[int]) -> str:
    """Stable string key for a modality combo (jit-friendly dict key)."""
    return "combo:" + ",".join(str(i) for i in sorted(combo))


def combo_log_name(
    combo: FrozenSet[int], modality_names: Sequence[str]
) -> str:
    return "_".join(sorted(modality_names[i] for i in combo))


def _masked_row_ce(
    logits: Array,
    labels: Array,
    mask: Optional[Array],
    axis_name: Optional[str] = None,
) -> Array:
    """Mean cross-entropy over (optionally masked) rows; NaN if empty.

    With ``axis_name`` the mean weights ROWS of the global batch, not
    shards: per-shard loss sums and mask counts are ``psum``-ed before
    dividing, reproducing the reference's row-masked mean over the
    all-gathered batch exactly even when presence is unbalanced across
    shards (ref utils/contrastive_loss_with_temperature.py:89-100).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    row_loss = -jnp.take_along_axis(
        logp, labels[:, None], axis=-1
    ).squeeze(-1)
    m = (
        jnp.ones_like(row_loss)
        if mask is None
        else mask.astype(row_loss.dtype)
    )
    s = (row_loss * m).sum()
    cnt = m.sum()
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.nan)


def clip_contrastive_loss(
    emb_a: Array,
    emb_b: Array,
    logit_scale: Array,
    mask: Optional[Array] = None,
    axis_name: Optional[str] = None,
    backprop_type: BackpropType = BackpropType.GLOBAL,
) -> Array:
    """Symmetric CLIP loss with learnable clamped temperature.

    ``emb_a``/``emb_b``: [B, D] (local rows).  With ``axis_name`` the
    negatives span the all-gathered global batch; without it, ``emb``
    is already the global batch (the jit-over-sharded-batch path).
    """
    temperature = jnp.exp(
        jnp.clip(logit_scale, LOGIT_SCALE_MIN, LOGIT_SCALE_MAX)
    )
    if axis_name is not None:
        a_all = gather_tensor(emb_a, axis_name, backprop_type)
        b_all = gather_tensor(emb_b, axis_name, backprop_type)
        labels = global_labels(emb_a.shape[0], axis_name)
    else:
        a_all, b_all = emb_a, emb_b
        labels = jnp.arange(emb_a.shape[0])
    emb_a32 = emb_a.astype(jnp.float32)
    emb_b32 = emb_b.astype(jnp.float32)
    logits_a = (emb_a32 @ b_all.astype(jnp.float32).T) * temperature
    logits_b = (emb_b32 @ a_all.astype(jnp.float32).T) * temperature
    loss_a = _masked_row_ce(logits_a, labels, mask, axis_name)
    loss_b = _masked_row_ce(logits_b, labels, mask, axis_name)
    return (loss_a + loss_b) / 2


class MCAPretrainingLoss(nn.Module):
    """Pairwise contrastive loss graph (ref model.py:126-233).

    Forward takes the pooled return tokens ``[B, R, D]`` and the
    per-modality presence mask, slices out named embeddings, computes
    every configured pair loss under its presence mask and returns the
    reference's output dict (embeddings + per-pair losses + aggregates).
    """

    modality_names: Tuple[str, ...]
    bimodal_contrastive: bool = False
    no_fusion: bool = False
    non_fusion_fcl: bool = False
    do_fcl: bool = False
    fusion_combos: Tuple[FrozenSet[int], ...] = ()
    masking: bool = True
    separate_modal_loss_fns: bool = False
    axis_name: Optional[str] = None

    def _make_scale_getter(self):
        """Shared temperature by default (ref model.py:152-153); one per
        pair/combo with ``separate_modal_loss_fns``.  Caches params so a
        name is only declared once per trace."""
        created: Dict[str, Array] = {}

        def scale(name: str) -> Array:
            pname = (
                f"logit_scale_{name}"
                if self.separate_modal_loss_fns
                else "logit_scale"
            )
            if pname not in created:
                created[pname] = self.param(
                    pname,
                    lambda key, shape: jnp.full(
                        shape, LOGIT_SCALE_INIT
                    ),
                    (),
                )
            return created[pname]

        return scale

    def _pair_list(self) -> list:
        if self.no_fusion:
            return list(combinations(self.modality_names, r=2))
        if self.bimodal_contrastive:
            return list(
                combinations(list(self.modality_names) + ["fusion"], r=2)
            )
        return [(m, "fusion") for m in self.modality_names]

    @nn.compact
    def __call__(
        self,
        pooled_tokens: Array,
        sample_mask: Dict[str, Array],
        no_loss: bool = False,
    ) -> Dict[str, Array]:
        names = list(self.modality_names)
        outputs: Dict[str, Array] = {
            m: pooled_tokens[:, i, :] for i, m in enumerate(names)
        }
        mlen = len(names)
        if self.do_fcl:
            for i, combo in enumerate(self.fusion_combos):
                assert i + mlen < pooled_tokens.shape[1]
                outputs[combo_key(combo)] = pooled_tokens[:, i + mlen, :]
            if not self.no_fusion:
                # FCL root combo is fusion_combos[0] (ref model.py:151)
                outputs["fusion"] = outputs[
                    combo_key(self.fusion_combos[0])
                ]
        elif not self.no_fusion:
            outputs["fusion"] = pooled_tokens[:, mlen, :]

        if no_loss:
            return outputs

        def pair_mask(a: str, b: str) -> Optional[Array]:
            if not self.masking:
                return None
            if a == "fusion":
                return sample_mask[b].astype(bool)
            if b == "fusion":
                return sample_mask[a].astype(bool)
            return (
                sample_mask[a].astype(bool) & sample_mask[b].astype(bool)
            )

        scale = self._make_scale_getter()
        losses: Dict[str, Array] = {}
        for a, b in self._pair_list():
            log_name = "_".join(sorted((a, b)))
            losses[log_name] = clip_contrastive_loss(
                outputs[a],
                outputs[b],
                scale(log_name),
                mask=pair_mask(a, b),
                axis_name=self.axis_name,
            )
        if self.do_fcl:
            root = self.fusion_combos[0]
            for combo in self.fusion_combos:
                if combo == root:
                    continue
                cname = combo_log_name(combo, names)
                or_mask = None
                if self.masking:
                    stacked = jnp.stack(
                        [sample_mask[names[i]] for i in combo]
                    )
                    or_mask = stacked.sum(axis=0).astype(bool)
                if not self.no_fusion:
                    losses[f"fcl_fusion|{cname}"] = clip_contrastive_loss(
                        outputs["fusion"],
                        outputs[combo_key(combo)],
                        scale(f"fcl|{cname}"),
                        mask=or_mask,
                        axis_name=self.axis_name,
                    )
                if self.non_fusion_fcl:
                    for mod in names:
                        mod_mask = (
                            (sample_mask[mod].astype(bool) & or_mask)
                            if self.masking
                            else None
                        )
                        losses[f"fcl_{mod}|{cname}"] = (
                            clip_contrastive_loss(
                                outputs[mod],
                                outputs[combo_key(combo)],
                                scale(f"fcl|{cname}"),
                                mask=mod_mask,
                                axis_name=self.axis_name,
                            )
                        )

        outputs["losses"] = losses
        values = list(losses.values())
        if self.do_fcl:
            fcl_vals = [
                v for k, v in losses.items() if "fcl" in k
            ]
            nofcl_vals = [
                v for k, v in losses.items() if "fcl" not in k
            ]
            if fcl_vals:
                outputs["fcl_loss"] = jnp.stack(
                    [jnp.nan_to_num(v) for v in fcl_vals]
                ).mean()
            if nofcl_vals:
                outputs["no-fcl_loss"] = jnp.stack(
                    [jnp.nan_to_num(v) for v in nofcl_vals]
                ).mean()
        stacked = jnp.stack(values)
        finite = jnp.isfinite(stacked)
        nl = finite.sum().astype(jnp.float32)
        total = jnp.nan_to_num(stacked).sum()
        # NaN pairs excluded; all-NaN batch -> plain (zero) sum,
        # matching ref model.py:224-232.
        outputs["loss"] = total / jnp.maximum(nl, 1.0)
        return outputs
