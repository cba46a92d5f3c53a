"""GPipe-style pipeline parallelism over a uniform layer stack.

TPU-native collective pipelining (the scaling-book recipe): the mesh
gains a ``pipe`` axis; each stage holds ``depth / n_stages``
consecutive layers and the batch is split into microbatches that flow
stage-to-stage over ICI via ``lax.ppermute``, inside a single
``lax.scan`` schedule under ``shard_map`` — one compiled SPMD program,
no host round-trips.  Composes with the existing data/model axes:
``shard_map`` is manual ONLY over ``pipe`` (``axis_names={'pipe'}``),
so batch data-parallelism and megatron tensor-parallelism stay with
the XLA partitioner.

Schedule (forward): ``n_ticks = n_micro + n_stages - 1``.  At tick
``t`` stage ``s`` processes microbatch ``m = t - s`` (stage 0 reads it
from the replicated input, later stages consume the activation
received from stage ``s-1`` at the end of the previous tick); the last
stage accumulates outputs.  Bubble ticks compute on clamped indices
and their results are masked out — the standard GPipe bubble of
``(S-1)/(M+S-1)``, shrinking as ``n_micro`` grows.  The backward pass
is ordinary AD through the scan + ppermute (reverse schedule,
transposed permutes), so gradients are exact.

The reference never pipelines (its 2–7 layer 16M-param models fit one
GPU many times over, ref train_accel_gpu.py); this is scaling headroom
for depth regimes where a stage no longer fits one chip — exactness is
pinned against the sequential stack in ``tests/test_pipeline.py``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def pipeline_layers(
    layer_apply: Callable[[Any, Array, Array], Array],
    stacked_params: Any,
    x: Array,
    padding: Array,
    mesh: Mesh,
    n_stages: int,
    n_micro: int = 0,
    axis_name: str = "pipe",
) -> Array:
    """Run ``depth`` stacked layers over ``x`` pipelined on ``mesh``.

    - ``layer_apply(params_i, x, padding) -> x``: ONE layer, pure in
      its (unstacked) params; every layer must share one param
      structure.
    - ``stacked_params``: layer params stacked on a leading ``[depth]``
      axis (replicated over ``pipe`` — memory reduction comes from
      composing with FSDP, compute pipelining from here).
    - ``x``: ``[B, T, D]`` activations; ``padding``: ``[B, T]``
      per-sample mask.  Both replicated over ``pipe`` (their ``data``
      sharding, if any, stays with the partitioner).
    - Returns ``[B, T, D]``, bit-comparable to applying the layers
      sequentially (fp reduction-order noise only).
    """
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    n_micro = int(n_micro) or int(n_stages)
    assert depth % n_stages == 0, (
        f"depth {depth} not divisible by pipeline_stages {n_stages}"
    )
    assert x.shape[0] % n_micro == 0, (
        f"batch {x.shape[0]} not divisible by microbatches {n_micro}"
    )
    assert mesh.shape.get(axis_name, 1) == n_stages, (
        f"mesh axis '{axis_name}' is {mesh.shape.get(axis_name)} but "
        f"pipeline_stages={n_stages}"
    )
    layers_per_stage = depth // n_stages
    mb = x.shape[0] // n_micro
    xm = x.reshape((n_micro, mb) + x.shape[1:])
    pm = padding.reshape((n_micro, mb) + padding.shape[1:])

    def body(xm, pm, params):
        s = jax.lax.axis_index(axis_name)
        my_params = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, s * layers_per_stage, layers_per_stage, 0
            ),
            params,
        )

        def stage(x_, pad_):
            def one(c, p):
                return layer_apply(p, c, pad_), None

            return jax.lax.scan(one, x_, my_params)[0]

        n_ticks = n_micro + n_stages - 1
        buf = jnp.zeros_like(xm)
        recv = jnp.zeros_like(xm[0])

        def tick(carry, t):
            recv, buf = carry
            m = t - s
            valid = (m >= 0) & (m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            x_in = jnp.where(s == 0, xm[mc], recv)
            y = stage(x_in, pm[mc])
            write = valid & (s == n_stages - 1)
            buf = buf.at[mc].set(jnp.where(write, y, buf[mc]))
            send = jax.lax.ppermute(
                y,
                axis_name,
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return (send, buf), None

        (recv, buf), _ = jax.lax.scan(
            tick, (recv, buf), jnp.arange(n_ticks)
        )
        # only the last stage holds real outputs; broadcast to every
        # stage (pool/loss run replicated over 'pipe' downstream)
        out = jnp.where(s == n_stages - 1, buf, 0.0)
        return jax.lax.psum(out, axis_name)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        axis_names={axis_name},
        check_vma=False,
    )
    return fn(xm, pm, stacked_params).reshape(x.shape)
