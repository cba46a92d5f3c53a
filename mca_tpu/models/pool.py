"""Masked mean pooling over token types (ref model.py:235-280).

Vectorised re-design of the reference's per-sample Python loop: one
masked segment-mean per token type, computed with einsum over the whole
batch.  Empty selections (a type fully padded for a sample) yield a
zero vector — the reference's explicit ``x.shape[0] == 0`` branch.

The reference's tensor-truthiness bug (``if self.token_types`` raising
on multi-element tensors, ref model.py:262) is NOT replicated: per-type
pooling works.  Type output order follows
:func:`mca_tpu.masks.pooling_token_type_order` (modalities ascending,
then fusion/global), matching the attentive-pooling return layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mca_tpu.encoders import torch_linear_init
from mca_tpu.masks import pooling_token_type_order

Array = jax.Array


class MeanTokenProjectionPool(nn.Module):
    """Masked per-token-type mean pooling with optional projection.

    ``token_types = None`` pools everything into a single vector
    (the EAO configuration, ref model.py:535).
    """

    token_types: Optional[Tuple[int, ...]] = None  # static layout
    in_dim: int = 512
    out_dim: int = 512
    projection: bool = True

    @nn.compact
    def __call__(
        self, batch: Array, key_padding_mask: Array
    ) -> Array:
        valid = ~key_padding_mask.astype(bool)  # [B, T]

        def masked_mean(sel: Array) -> Array:
            # sel: [B, T] bool
            cnt = sel.sum(axis=1).astype(batch.dtype)  # [B]
            total = jnp.einsum(
                "bt,btd->bd", sel.astype(batch.dtype), batch
            )
            return jnp.where(
                (cnt > 0)[:, None],
                total / jnp.maximum(cnt, 1.0)[:, None],
                0.0,
            )

        if self.token_types is None:
            pooled = [masked_mean(valid)]
            n_types = 1
        else:
            tt = np.asarray(self.token_types)
            order = pooling_token_type_order(tt)
            pooled = [
                masked_mean(jnp.asarray(tt == t)[None, :] & valid)
                for t in order
            ]
            n_types = len(order)
        if self.projection:
            pooled = [
                nn.Dense(
                    self.out_dim,
                    kernel_init=torch_linear_init,
                    name=f"proj_{i}",
                )(p)
                for i, p in enumerate(pooled)
            ]
        return jnp.stack(pooled, axis=1)  # [B, n_types, D]
