"""Differentiable cross-device gathers for the contrastive loss.

The reference's only explicit collective is a differentiable all-gather
used to build the global contrastive batch
(``/root/reference/utils/distributed.py:23-56``), with three gradient
modes.  The TPU-native equivalents over a named mesh axis:

- ``GLOBAL``: ``jax.lax.all_gather`` — differentiable by construction
  (its transpose is ``psum_scatter``), gradients flow to every device's
  contribution.
- ``NONE``: all-gather of ``stop_gradient``-ed values.
- ``LOCAL``: gather without gradients, then re-insert the local shard
  with gradients at this device's offset, so each device only
  backpropagates through its own rows.

Note: under plain ``jit`` over a sharded batch (the default training
path, see ``mca_tpu.train``), the loss is written on the global batch
and XLA inserts the collectives itself — that is exactly GLOBAL mode.
These explicit functions serve ``shard_map`` code paths and the
multi-device == single-device equivalence tests.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

Array = jax.Array


class BackpropType(enum.Enum):
    GLOBAL = 0
    LOCAL = 1
    NONE = 2


def gather_tensor(
    tensor: Array,
    axis_name: str,
    backprop_type: BackpropType = BackpropType.GLOBAL,
) -> Array:
    """All-gather ``tensor`` along ``axis_name``, concatenated on axis 0.

    Must be called inside ``shard_map``/``pmap`` with ``axis_name``
    bound.  Returns shape ``[world * B, ...]``.
    """
    if backprop_type == BackpropType.GLOBAL:
        return jax.lax.all_gather(tensor, axis_name, tiled=True)
    gathered = jax.lax.all_gather(
        jax.lax.stop_gradient(tensor), axis_name, tiled=True
    )
    if backprop_type == BackpropType.LOCAL:
        rank = jax.lax.axis_index(axis_name)
        local_bs = tensor.shape[0]
        return jax.lax.dynamic_update_slice_in_dim(
            gathered, tensor, rank * local_bs, axis=0
        )
    return gathered


def global_labels(local_batch_size: int, axis_name: str) -> Array:
    """Row labels into the gathered batch: ``rank * B + arange(B)``.

    TPU-native form of ref utils/contrastive_loss_with_temperature.py:29-31.
    """
    rank = jax.lax.axis_index(axis_name)
    return rank * local_batch_size + jnp.arange(local_batch_size)
