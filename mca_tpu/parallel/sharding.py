"""Parameter partition rules for the ('data', 'model') mesh.

Megatron-style tensor parallelism over the ``model`` axis: attention
QKV projections and the first FF matmul are sharded on their output
(head / inner) dimension, the output projections on their input
dimension, so each layer needs exactly one reduce (inserted by the XLA
partitioner).  Everything else — embeddings, layernorms, fusion/return
tokens, the loss temperature — is replicated.

``fsdp=True`` additionally shards parameters and optimiser moments
over the ``data`` axis (ZeRO-3 style): each large leaf splits its
largest still-unsharded divisible dimension, XLA's partitioner inserts
the forward all-gathers and backward reduce-scatters, and the AdamW
update runs shard-local.  On the flat-vector fast path the single
raveled fp32 vector (and its mu/nu moments) shard evenly on ``data``
with one all-gather per step.

The 16M-parameter reference never shards weights (DDP only,
ref train_accel_gpu.py:93-95); this module is the TPU-native scaling
headroom on top of that capability surface.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: leaves smaller than this stay replicated under fsdp — the per-step
#: all-gather latency outweighs the memory for tiny vectors/scalars
FSDP_MIN_SIZE = 2 ** 14

#: (path-suffix match, PartitionSpec) rules, first match wins.
_RULES = [
    (("attn", "to_q", "kernel"), P(None, "model")),
    (("attn", "to_kv", "kernel"), P(None, "model")),
    (("attn", "to_out", "kernel"), P("model", None)),
    (("ff", "w_in", "kernel"), P(None, "model")),
    (("ff", "w_out", "kernel"), P("model", None)),
    # mixture-of-experts FF (mca_tpu.models.moe): the stacked expert
    # matrices [E, ...] shard their EXPERT dim over 'model' — expert
    # parallelism: each device holds E/tp experts and the partitioner
    # places the token all-to-alls around the dispatch/combine
    # einsums.  (The dense-FF rules above carry a trailing 'kernel'
    # path component, so they match first and these never touch the
    # dense layout; the router matches nothing and stays replicated.)
    (("ff", "w_in"), P("model")),
    (("ff", "w_out"), P("model")),
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


def _fsdp_extend(spec: P, shape, mesh: Mesh, min_size: int) -> P:
    """Additionally shard ``shape``'s largest still-unsharded dimension
    over ``data`` (ZeRO-style), when the leaf is big enough and a
    divisible dimension exists.  Composes with the TP spec: a
    ``P(None, 'model')`` matrix becomes ``P('data', 'model')``."""
    n_data = mesh.shape.get("data", 1)
    if n_data <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return spec
    axes = list(spec) + [None] * (len(shape) - len(spec))
    for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if axes[d] is None and shape[d] % n_data == 0:
            axes[d] = "data"
            return P(*axes)
    return spec


def param_shardings(
    params: Any,
    mesh: Mesh,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> Any:
    """NamedSharding pytree matching ``params``: TP rules, plus
    ZeRO-style ``data``-axis sharding of large leaves when ``fsdp``."""

    def spec(path, leaf):
        s = _spec_for_path(path, leaf.shape, mesh)
        if fsdp:
            s = _fsdp_extend(s, leaf.shape, mesh, fsdp_min_size)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def opt_state_shardings(
    opt_state: Any,
    mesh: Mesh,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> Any:
    """Shardings for an optax state pytree.

    Covers both optimiser layouts: under ``optax.flatten`` (the
    default ``fuse_optimizer`` path) the AdamW moments are single
    raveled vectors — sharded flat on ``data`` under fsdp; without
    flattening the mu/nu trees mirror the parameter tree, so their
    paths carry the parameter path suffixes and the TP rules (plus the
    fsdp extension) apply leaf-by-leaf.  Scalars (step counts, the
    clip state) stay replicated.
    """

    def spec(path, leaf):
        shape = np.shape(leaf)
        s = _spec_for_path(path, shape, mesh)
        if fsdp:
            s = _fsdp_extend(s, shape, mesh, fsdp_min_size)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, opt_state)


def shard_params(
    params: Any,
    mesh: Mesh,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> Any:
    shardings = param_shardings(
        params, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min_size
    )
    return jax.tree.map(jax.device_put, params, shardings)


def shard_opt_state(
    opt_state: Any,
    mesh: Mesh,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> Any:
    shardings = opt_state_shardings(
        opt_state, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min_size
    )
    return jax.tree.map(jax.device_put, opt_state, shardings)


def state_shardings(state: Any) -> Any:
    """The ACTUAL shardings of an already-placed state pytree — used
    as jit ``out_shardings`` so each step returns the donated state in
    the same layout it came in (XLA would otherwise be free to
    re-shard the outputs)."""
    return jax.tree.map(lambda x: x.sharding, state)
