"""The MCA fusion transformer (ref model.py:282-478), TPU-native.

One packed forward pass: per-modality encoders -> learnable fusion
tokens appended -> ``depth`` masked transformer blocks under the static
zorro/MCA mask + the dynamic per-sample padding mask -> attentive (or
mean) pooling into return tokens -> the pairwise contrastive loss.

TPU-first design points (deliberate departures from the reference):

- masks are pure numpy constants built once (``mca_tpu.masks``) and
  closed over by the jit trace — no buffers, no device copies per step;
- the batch size comes from the batch (static per trace), not from the
  constructor (the reference baked ``batch_size`` in, ref model.py:307);
- attention dispatches to a Pallas block-sparse flash kernel
  (``attention_impl='pallas'``) that exploits the modality-block
  structure; ``'dense'`` is the numeric oracle;
- compute dtype is configurable (``precision='bf16'`` puts the matmuls
  on the MXU in bf16 with fp32 softmax/layernorm statistics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from mca_tpu import masks as masks_lib
from mca_tpu.encoders import build_encoder
from mca_tpu.losses import MCAPretrainingLoss
from mca_tpu.models.layers import Attention, LayerNorm, MCALayer
from mca_tpu.models.pool import MeanTokenProjectionPool

Array = jax.Array


def _dtype_of(precision: str) -> jnp.dtype:
    return jnp.bfloat16 if precision == "bf16" else jnp.float32


class MCA(nn.Module):
    """Multimodal-contrastive-alignment fusion transformer.

    ``zorro=True`` gives the MMA/Zorro variant (no fusion channels);
    ``no_fusion=True`` drops fusion tokens entirely.
    """

    encoder_configs: FrozenDict[str, Any]
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4
    num_fusion_tokens: int = 16
    bimodal_contrastive: bool = False
    non_fusion_fcl: bool = False
    fcl: bool = False
    fcl_root: Tuple[int, ...] = (1, 2, 3, 4, 5)
    fusion_combos: Tuple[int, ...] = (4, 5)
    zorro: bool = False
    no_fusion: bool = False
    mean_pool: bool = False
    precision: str = "fp32"
    attention_impl: str = "dense"
    # int8 serving quantization of the transformer projections
    # (mca_tpu.ops.quant) — inference-only, params from
    # quantize_params on a trained tree
    quant: str = "none"
    remat: bool = False
    loss_axis_name: Optional[str] = None
    # GPipe pipeline parallelism over the layer stack (scaling
    # headroom beyond the reference's depth regime — see
    # mca_tpu.parallel.pipeline).  ``pipeline_stages > 1`` requires
    # ``pipeline_mesh`` with a matching 'pipe' axis and
    # depth % stages == 0; 0/None disables (sequential stack).
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    pipeline_mesh: Optional[Any] = None
    # Megatron-style sequence parallelism: between blocks the packed
    # [B, T, D] activations are constrained to shard T over the TP
    # ('model') axis, so the LayerNorm/residual segments compute on
    # T/tp tokens per device and the partitioner places the
    # all-gather at the QKV/FF projections and the reduce-scatter
    # after them.  Numerically identical; activation-memory headroom
    # when TP is on.  Requires ``seq_shard_mesh``.
    seq_shard: bool = False
    seq_shard_mesh: Optional[Any] = None
    # Mixture-of-experts FF (extension — mca_tpu.models.moe): 0 keeps
    # the reference's dense GEGLU; E > 0 builds E expert-choice GEGLU
    # experts per block, expert dim sharded over the 'model' mesh axis
    # (expert parallelism) by the partition rules.
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    def setup(self) -> None:
        # mean pooling collapses ALL fusion tokens into one vector, so
        # per-combo FCL pooled tokens don't exist; the reference's
        # MCA(mean_pool=True) crashed outright (ref model.py:262) — here
        # the supported combinations are explicit
        assert not (self.mean_pool and self.fcl and not self.zorro), (
            "mean_pool is incompatible with fusion-channel pooling "
            "(fcl); use zorro or attentive pooling"
        )
        enc_cfgs = dict(self.encoder_configs)
        self.modality_types = tuple(enc_cfgs.keys())
        token_dims = [
            int(enc_cfgs[m]["max_tokens"]) for m in self.modality_types
        ]
        self.mask_set = masks_lib.build_masks(
            token_dims,
            self.num_fusion_tokens,
            list(self.fusion_combos),
            zorro=self.zorro,
            fcl=self.fcl,
            no_fusion=self.no_fusion,
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
                attn_impl=self.attention_impl,
                quant=self.quant,
                moe_experts=int(self.moe_experts),
                moe_capacity_factor=float(self.moe_capacity_factor),
                name=f"layer_{i}",
            )
            for i in range(self.depth)
        ]
        self.final_norm = LayerNorm(name="final_norm")
        if not self.no_fusion:
            self.fusion_tokens = self.param(
                "fusion_tokens",
                jax.nn.initializers.normal(1.0),
                (self.mask_set.num_fusion_tokens, self.dim),
            )
        if self.mean_pool:
            self.attn_pool = MeanTokenProjectionPool(
                token_types=tuple(
                    int(t) for t in self.mask_set.token_types
                ),
                in_dim=self.dim,
                out_dim=self.dim,
                projection=False,
                name="attn_pool",
            )
        else:
            self.return_tokens = self.param(
                "return_tokens",
                jax.nn.initializers.normal(1.0),
                (self.mask_set.num_return_tokens, self.dim),
            )
            self.attn_pool = Attention(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                dtype=jnp.float32,
                impl="dense",
                name="attn_pool",
            )
        self.loss = MCAPretrainingLoss(
            modality_names=self.modality_types,
            do_fcl=self.fcl and not self.zorro,
            fusion_combos=self.mask_set.fusion_combos,
            bimodal_contrastive=self.bimodal_contrastive,
            no_fusion=self.no_fusion,
            non_fusion_fcl=self.non_fusion_fcl,
            axis_name=self.loss_axis_name,
            name="loss",
        )

    def encode_modalities(
        self,
        batch: Dict[str, Dict[str, Array]],
        deterministic: bool = True,
    ):
        """Run every modality encoder; also derive the per-sample
        presence mask (``(attn_mask == 0).any(axis=1)``, ref model.py:458)."""
        tokens, pad_masks, sample_mask = [], [], {}
        for m in self.modality_types:
            t, a = self.encoders[m](
                batch[m], deterministic=deterministic
            )
            tokens.append(t)
            pad_masks.append(a.astype(bool))
            sample_mask[m] = (a == 0).sum(axis=1) != 0
        return tokens, pad_masks, sample_mask

    def _pack_sequence(
        self,
        batch: Dict[str, Dict[str, Array]],
        deterministic: bool = True,
    ):
        """Encode + pack into ONE ``[B, T, D]`` sequence: append the
        broadcast learnable fusion tokens (never padded) and
        concatenate along T (ref model.py:459-466's einops ``pack``),
        cast to the compute precision.  Shared by ``__call__`` and
        ``attention_maps`` so introspection can never diverge from the
        trained forward pass.  Returns ``(x, padding, sample_mask)``.
        """
        tokens, pad_masks, sample_mask = self.encode_modalities(
            batch, deterministic
        )
        bsz = tokens[0].shape[0]
        if not self.no_fusion:
            fusion = jnp.broadcast_to(
                self.fusion_tokens[None],
                (bsz,) + self.fusion_tokens.shape,
            )
            tokens.append(fusion.astype(tokens[0].dtype))
            pad_masks.append(
                jnp.zeros(
                    (bsz, self.mask_set.num_fusion_tokens), dtype=bool
                )
            )
        x = jnp.concatenate(tokens, axis=1)
        padding = jnp.concatenate(pad_masks, axis=1)
        x = x.astype(_dtype_of(self.precision))
        return x, padding, sample_mask

    def attention_maps(
        self,
        batch: Dict[str, Dict[str, Array]],
        deterministic: bool = True,
    ) -> Dict[str, Array]:
        """Post-softmax attention probabilities for introspection.

        The TPU-native counterpart of the reference's
        ``Attention(return_attn=True)`` hook (ref model.py:79,
        102-105): returns ``{"layers": [depth, B, H, T, T]}`` plus
        ``"pool": [B, H, R, T]`` for attentive pooling.  Always uses
        the dense attention path (the flash kernel never materialises
        probabilities).  Use via
        ``model.apply(params, batch, method="attention_maps")`` or
        :mod:`mca_tpu.tools.attention_maps`.
        """
        x, padding, _ = self._pack_sequence(batch, deterministic)
        bsz = x.shape[0]
        attn_mask = self.mask_set.attn_mask
        maps = []
        for layer in self.layers:
            x, attn = layer(x, attn_mask, padding, return_attn=True)
            maps.append(attn)
        out = {"layers": jnp.stack(maps)}
        if not self.mean_pool:
            x = self.final_norm(x.astype(jnp.float32))
            ret = jnp.broadcast_to(
                self.return_tokens[None],
                (bsz,) + self.return_tokens.shape,
            )
            _, pool_attn = self.attn_pool(
                ret,
                context=x,
                attn_mask=jnp.asarray(self.mask_set.pool_mask),
                key_padding_mask=padding,
                return_attn=True,
            )
            out["pool"] = pool_attn
        return out

    def _pipelined_layers(
        self, x: Array, attn_mask, padding: Array
    ) -> Array:
        """The layer stack as a GPipe pipeline over the mesh's 'pipe'
        axis (``mca_tpu.parallel.pipeline``).

        The parameter TREE is unchanged — each ``layer_i``'s params
        are stacked to a ``[depth, ...]`` pytree at trace time (the
        stack is differentiable, so gradients land back on the
        original leaves), and one layer's ``apply`` runs as a pure
        function of the per-stage slice.  Init always takes the
        sequential path, so checkpoints/interop are layout-identical
        across pipelined and sequential runs.
        """
        from mca_tpu.parallel.pipeline import pipeline_layers

        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                self.layers[i].variables["params"]
                for i in range(self.depth)
            ],
        )

        def one_layer(p, x_, pad_):
            return self.layers[0].apply(
                {"params": p}, x_, attn_mask, pad_
            )

        # the scan carry needs one stable dtype; MCALayer's shared
        # LayerNorm returns fp32, so every layer after the first sees
        # fp32 inputs in the sequential loop too.  Widening the (bf16)
        # first input to that dtype is value-exact — the values were
        # already rounded by _pack_sequence's precision cast.
        p0 = jax.tree.map(lambda a: a[0], stacked)
        out_dtype = jax.eval_shape(
            one_layer, p0, x, padding
        ).dtype
        x = x.astype(out_dtype)

        if self.remat:
            one_layer = jax.checkpoint(one_layer)
        return pipeline_layers(
            one_layer,
            stacked,
            x,
            padding,
            mesh=self.pipeline_mesh,
            n_stages=int(self.pipeline_stages),
            n_micro=int(self.pipeline_microbatches or 0),
        )

    def __call__(
        self,
        batch: Dict[str, Dict[str, Array]],
        no_loss: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        x, padding, sample_mask = self._pack_sequence(
            batch, deterministic
        )
        bsz = x.shape[0]

        # keep the mask as STATIC numpy: the Pallas path derives its
        # block-sparse tile schedule from it at trace time; the dense
        # path converts it to a jit constant internally.  It rides in a
        # closure so rematerialisation never traces it.
        attn_mask = self.mask_set.attn_mask
        # pipeline/seq-shard are EXECUTION strategies, engaged only
        # when the caller provided the live mesh (train() injects it).
        # Consumers that never see a mesh — infer, serve, AOT export,
        # attention_maps — fall back to the numerically identical
        # sequential stack instead of crashing on a train-oriented
        # config key.
        if (
            int(self.pipeline_stages or 0) > 1
            and self.pipeline_mesh is not None
            and not self.is_initializing()
        ):
            assert not self.seq_shard, (
                "seq_shard and pipeline_stages are mutually exclusive"
            )
            x = self._pipelined_layers(x, attn_mask, padding)
        else:
            seq_constraint = None
            if (
                self.seq_shard
                and self.seq_shard_mesh is not None
                and not self.is_initializing()
            ):
                from jax.sharding import (
                    NamedSharding,
                    PartitionSpec as P,
                )

                seq_constraint = NamedSharding(
                    self.seq_shard_mesh, P("data", "model", None)
                )

            def apply_layer(layer, x, padding):
                return layer(x, attn_mask, padding)

            if self.remat:
                apply_layer = nn.remat(apply_layer)
            if seq_constraint is not None:
                x = jax.lax.with_sharding_constraint(x, seq_constraint)
            for layer in self.layers:
                x = apply_layer(layer, x, padding)
                if seq_constraint is not None:
                    x = jax.lax.with_sharding_constraint(
                        x, seq_constraint
                    )
        x = self.final_norm(x.astype(jnp.float32))

        if self.mean_pool:
            pooled = self.attn_pool(x, padding)
        else:
            ret = jnp.broadcast_to(
                self.return_tokens[None],
                (bsz,) + self.return_tokens.shape,
            )
            pooled = (
                self.attn_pool(
                    ret,
                    context=x,
                    attn_mask=jnp.asarray(self.mask_set.pool_mask),
                    key_padding_mask=padding,
                )
                + ret
            )
        outputs = self.loss(pooled, sample_mask, no_loss=no_loss)
        outputs["modality_sample_mask"] = sample_mask
        return outputs
