"""Parameter partition rules for the ('data', 'model') mesh.

Megatron-style tensor parallelism over the ``model`` axis: attention
QKV projections and the first FF matmul are sharded on their output
(head / inner) dimension, the output projections on their input
dimension, so each layer needs exactly one reduce (inserted by the XLA
partitioner).  Everything else — embeddings, layernorms, fusion/return
tokens, the loss temperature — is replicated.

The 16M-parameter reference never shards weights (DDP only,
ref train_accel_gpu.py:93-95); this module is the TPU-native scaling
headroom on top of that capability surface.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: (path-suffix match, PartitionSpec) rules, first match wins.
_RULES = [
    (("attn", "to_q", "kernel"), P(None, "model")),
    (("attn", "to_kv", "kernel"), P(None, "model")),
    (("attn", "to_out", "kernel"), P("model", None)),
    (("ff", "w_in", "kernel"), P(None, "model")),
    (("ff", "w_out", "kernel"), P("model", None)),
]


def _spec_for_path(path, shape, mesh: Mesh) -> P:
    parts = tuple(
        getattr(k, "key", getattr(k, "name", str(k))) for k in path
    )
    for suffix, spec in _RULES:
        for i in range(len(parts) - len(suffix) + 1):
            if parts[i : i + len(suffix)] == suffix:
                # shard only if every named axis divides its dimension
                # (e.g. the GEGLU inner dim int(dim*mult*2/3) is often
                # odd — those matrices stay replicated)
                ok = all(
                    axis is None
                    or shape[d] % mesh.shape[axis] == 0
                    for d, axis in enumerate(spec)
                )
                return spec if ok else P()
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params`` under the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for_path(path, leaf.shape, mesh)
        ),
        params,
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
