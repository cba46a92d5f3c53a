"""Device mesh + sharding helpers.

The training step is ``jit``-ed over a 2-D ``('data', 'model')`` mesh:

- the batch pytree is sharded along ``data`` (data parallelism — the
  reference's only parallelism, via DDP, ref train_accel_gpu.py:93-95);
- selected parameter matrices are sharded along ``model`` (tensor
  parallelism over attention heads / FF inner dim — a capability the
  16M-param reference never needed but the TPU design supports, see
  ``mca_tpu.parallel.sharding``).

Gradient averaging over ``data`` and the contrastive loss's global
batch both fall out of XLA's partitioner: the loss is written on the
global batch, so no hand-written collectives appear in the model code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 0,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    batch_size: Optional[int] = None,
    pipe: int = 1,
) -> Mesh:
    """('data', 'model'[, 'pipe']) mesh; ``data=0`` = as many as fit.

    With ``batch_size`` given, the auto data axis is clamped to the
    largest divisor of the batch so small runs shard cleanly.
    ``pipe > 1`` appends a pipeline axis (GPipe stages over the layer
    stack, see ``mca_tpu.parallel.pipeline``); the 2-axis shape is
    kept otherwise so existing specs/tests see an identical mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    pipe = max(int(pipe), 1)
    if pipe > 1:
        data_ = data if data not in (0, None) else max(
            len(devices) // (model * pipe), 1
        )
        if batch_size is not None and data in (0, None):
            while batch_size % data_:
                data_ -= 1
        n = data_ * model * pipe
        assert n <= len(devices), (
            f"mesh {data_}x{model}x{pipe} > {len(devices)} devices"
        )
        if n < len(devices):
            import logging

            logging.getLogger(__name__).warning(
                "mesh %dx%dx%d on %d devices — %d devices idle "
                "(devices not divisible by model*pipe, or batch %s "
                "not divisible by the full data axis)",
                data_, model, pipe, len(devices), len(devices) - n,
                batch_size,
            )
        grid = np.asarray(devices[:n]).reshape(data_, model, pipe)
        return Mesh(grid, ("data", "model", "pipe"))
    if data in (0, None):
        full_data = max(len(devices) // model, 1)
        data = full_data
        if batch_size is not None:
            while batch_size % data:
                data -= 1
        if data * model < len(devices):
            import logging

            if data < full_data:
                reason = (
                    f"batch {batch_size} not divisible by the full "
                    f"data axis {full_data} — pick a batch divisible "
                    f"by {full_data} to use them"
                )
            else:
                reason = (
                    f"{len(devices)} devices not divisible by the "
                    f"model axis {model}"
                )
            logging.getLogger(__name__).warning(
                "auto mesh clamped to %dx%d on %d devices (%s) — %d "
                "devices idle",
                data, model, len(devices), reason,
                len(devices) - data * model,
            )
    assert data * model <= len(devices), (
        f"mesh {data}x{model} > {len(devices)} devices"
    )
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis 'data' sharding for every leaf of a batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, leading_scan_axis: bool = False):
    """Device-put a (nested dict) numpy batch, sharded along 'data'.

    ``leading_scan_axis=True`` for stacked multi-step batches
    ``[K, B, ...]``: the scan axis stays unsharded, the batch axis
    shards over 'data'.
    """
    spec = P(None, "data") if leading_scan_axis else P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )
