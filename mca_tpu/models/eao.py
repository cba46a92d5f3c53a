"""Everything-At-Once baseline (ref model.py:481-596).

No fusion tokens and no attention masks: the shared transformer stack
is re-run once per unimodal channel and once per modality combo
(4 + 11 = 15 passes for the canonical configs), each mean-pooled into a
single vector; the pooled vectors feed the same pretraining loss.

The reference's attentive-pooling branch referenced an attribute that
is never created (``self.pool_mask``, ref model.py:565) and would crash
— EAO is mean-pool-only here, asserted with a clear error.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from mca_tpu import masks as masks_lib
from mca_tpu.encoders import build_encoder
from mca_tpu.losses import MCAPretrainingLoss
from mca_tpu.models.layers import LayerNorm, MCALayer
from mca_tpu.models.mca import _dtype_of
from mca_tpu.models.pool import MeanTokenProjectionPool

Array = jax.Array


class EAO(nn.Module):
    encoder_configs: FrozenDict[str, Any]
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4
    num_fusion_tokens: int = 0
    bimodal_contrastive: bool = False
    non_fusion_fcl: bool = False
    fcl: bool = False
    fcl_root: Tuple[int, ...] = (1, 2, 3, 4, 5)
    fusion_combos: Tuple[int, ...] = (4, 5)
    zorro: bool = False
    no_fusion: bool = True
    mean_pool: bool = True
    precision: str = "fp32"
    attention_impl: str = "dense"
    # int8 serving quantization (mca_tpu.ops.quant; inference-only)
    quant: str = "none"
    remat: bool = False
    loss_axis_name: Optional[str] = None
    #: batch equal-packed-length channels into one transformer pass
    #: (stacked on the batch axis) — identical per-sample math, the
    #: canonical TCGA-EAO's 10 channels collapse to 7 passes.  Measured
    #: NEGATIVE at canonical scale (220.3 vs 207.6 ms/step sequential,
    #: PERF.md round 3): inside one jitted step there are no launches
    #: to save, batch 8 x 8 heads already fills the MXU, and the
    #: batch-axis concat/slice copies cost real HBM traffic.  Kept as
    #: an opt-in A/B knob (`eao_group_channels: true`).
    group_channels: bool = False
    # mixture-of-experts FF (extension, mca_tpu.models.moe): 0 = dense
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    def setup(self) -> None:
        assert self.mean_pool, (
            "EAO supports mean pooling only (the reference's attentive "
            "branch was non-functional, ref model.py:565)"
        )
        enc_cfgs = dict(self.encoder_configs)
        self.modality_types = tuple(enc_cfgs.keys())
        self.combos = tuple(
            masks_lib.adjusted_powerset(
                range(len(self.modality_types)), list(self.fusion_combos)
            )
        )
        self.encoders = {
            name: build_encoder(name, cfg, self.dim)
            for name, cfg in enc_cfgs.items()
        }
        dtype = _dtype_of(self.precision)
        self.layers = [
            MCALayer(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                ff_mult=self.ff_mult,
                dtype=dtype,
                # unmasked, but the flash kernel still wins on TPU:
                # O(T) memory in the backward across the 15 passes
                attn_impl=self.attention_impl,
                quant=self.quant,
                moe_experts=int(self.moe_experts),
                moe_capacity_factor=float(self.moe_capacity_factor),
                name=f"layer_{i}",
            )
            for i in range(self.depth)
        ]
        self.final_norm = LayerNorm(name="final_norm")
        self.attn_pool = MeanTokenProjectionPool(
            token_types=None,
            in_dim=self.dim,
            out_dim=self.dim,
            projection=False,
            name="attn_pool",
        )
        self.loss = MCAPretrainingLoss(
            modality_names=self.modality_types,
            do_fcl=self.fcl and not self.zorro,
            fusion_combos=self.combos,
            bimodal_contrastive=self.bimodal_contrastive,
            no_fusion=self.no_fusion,
            non_fusion_fcl=self.non_fusion_fcl,
            axis_name=self.loss_axis_name,
            name="loss",
        )

    def single_pass(self, tokens: Array, padding: Array) -> Array:
        """depth x MCALayer + masked mean pool (ref model.py:556-569)."""
        x = tokens.astype(_dtype_of(self.precision))

        def apply_layer(layer, x, padding):
            return layer(x, None, padding)

        if self.remat:
            apply_layer = nn.remat(apply_layer)
        for layer in self.layers:
            x = apply_layer(layer, x, padding)
        x = self.final_norm(x.astype(jnp.float32))
        return self.attn_pool(x, padding)  # [B, 1, D]

    def __call__(
        self,
        batch: Dict[str, Dict[str, Array]],
        no_loss: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        all_tokens, all_masks, sample_mask = [], [], {}
        for m in self.modality_types:
            t, a = self.encoders[m](
                batch[m], deterministic=deterministic
            )
            all_tokens.append(t)
            all_masks.append(a.astype(bool))
            sample_mask[m] = (a == 0).sum(axis=1) != 0

        channels = [
            (i,) for i in range(len(self.modality_types))
        ] + [tuple(sorted(c)) for c in self.combos]

        def channel_inputs(channel):
            tokens = jnp.concatenate(
                [all_tokens[i] for i in channel], axis=1
            )
            padding = jnp.concatenate(
                [all_masks[i] for i in channel], axis=1
            )
            return tokens, padding

        if not self.group_channels:
            per_channel = [
                self.single_pass(*channel_inputs(c)) for c in channels
            ]
        else:
            # channels with EQUAL packed length run as ONE pass stacked
            # on the batch axis (per-sample math is unchanged: attention
            # and pooling never mix samples).  The reference runs all 15
            # passes strictly sequentially (ref model.py:585-589).
            from collections import defaultdict

            by_len = defaultdict(list)
            for ci, channel in enumerate(channels):
                tlen = sum(all_tokens[i].shape[1] for i in channel)
                by_len[tlen].append(ci)
            bsz = all_tokens[0].shape[0]
            per_channel = [None] * len(channels)
            for tlen in sorted(by_len):
                idxs = by_len[tlen]
                toks, pads = zip(
                    *(channel_inputs(channels[ci]) for ci in idxs)
                )
                pooled_g = self.single_pass(
                    jnp.concatenate(toks, axis=0),
                    jnp.concatenate(pads, axis=0),
                )  # [G*B, 1, D]
                for j, ci in enumerate(idxs):
                    per_channel[ci] = pooled_g[j * bsz : (j + 1) * bsz]
        pooled = jnp.concatenate(per_channel, axis=1)  # [B, n_ch, D]

        outputs = self.loss(pooled, sample_mask, no_loss=no_loss)
        outputs["modality_sample_mask"] = sample_mask
        return outputs
