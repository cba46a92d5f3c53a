"""Fused GEGLU feed-forward Pallas kernel (forward path).

The reference FF (ref model.py:35-54) is ``out = (gelu(g) * u) @ W2``
with ``[u | g] = x @ W1`` — at canonical scale the [N, 2*inner] inner
activation is ~111 MB bf16 per layer, and XLA's fusion boundaries
stream it to HBM and back (plus the gated [N, inner] once more).  Both
weight matrices are small (W1 2.8 MB + W2 1.4 MB bf16), so a single
Pallas kernel can keep them VMEM-resident and tile over ROWS: per
[bm, D] row tile the whole chain (two half-GEMMs, erf-GELU gate,
contraction back to D) runs without the inner activation ever leaving
VMEM.  HBM traffic per layer drops from ~x + 2*inner + inner + out to
x + out.

Layout note: ``inner = int(D * mult * 2/3)`` is 1365 at D=512 — not a
multiple of the 128-lane tile, so the u/g split point is unaligned.
The wrapper instead passes W1 as TWO operands (u-half and gate-half),
each zero-padded to the next 128 multiple, and zero-pads W2's
contraction rows to match: the junk lanes multiply zero W2 rows, so
the output is exact.

The backward is NOT a Pallas kernel: accumulating dW1/dW2 across row
tiles needs ~9 MB of f32 scratch on top of the forward's working set
(> VMEM with the tiles), and the measured XLA backward stack already
sits at 0.96x of the platform-serial bound (PERF.md round 4) — there
is nothing to win there.  ``fused_geglu_ff`` is a custom_vjp whose
backward recomputes the inner activations with plain XLA ops from the
saved input (one extra GEMM ~0.32 ms/layer MXU, cancelled by not
reading the ~111 MB of saved activations back from HBM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_geglu_ff", "geglu_ff_reference"]


def _pad_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def geglu_ff_reference(x, w1, w2):
    """The unfused semantics (exactly models.layers.FeedForward's
    body): ``[u | g] = x @ w1; out = (gelu_erf(g) * u) @ w2``."""
    h = x @ w1
    u, g = jnp.split(h, 2, axis=-1)
    return (jax.nn.gelu(g, approximate=False) * u) @ w2


def _erf(z):
    """erf for the Pallas body — Mosaic has no erf primitive
    (lowering error: "Unimplemented primitive ... erf"), so use the
    Abramowitz-Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — below bf16/f32 kernel noise; XLA's own erf is a similar
    rational approximation)."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return s * (1.0 - poly * jnp.exp(-z * z))


def _ff_kernel(x_ref, w1u_ref, w1g_ref, w2_ref, o_ref):
    x = x_ref[:]
    u = jax.lax.dot_general(
        x, w1u_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = jax.lax.dot_general(
        x, w1g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # exact (erf) GELU, matching torch F.gelu / jax.nn.gelu exact
    a = 0.5 * g * (1.0 + _erf(g * (1.0 / math.sqrt(2.0)))) * u
    o_ref[:] = jax.lax.dot_general(
        a.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _ff_local(x2d, w1u, w1g, w2p, block_m: int, interpret: bool):
    """Per-shard pallas dispatch: pad rows to a block multiple, run
    the row-tiled kernel, slice the pad back off."""
    n, d = x2d.shape
    ip = w1u.shape[1]
    np_ = _pad_to(n, block_m)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        _ff_kernel,
        grid=(np_ // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((d, ip), lambda i: (0, 0)),
            pl.BlockSpec((d, ip), lambda i: (0, 0)),
            pl.BlockSpec((ip, w2p.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_m, w2p.shape[1]), lambda i: (i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((np_, w2p.shape[1]), x2d.dtype),
        interpret=interpret,
    )(xp, w1u, w1g, w2p)
    return out[:n]


def _make_partitioned(block_m: int, interpret: bool):
    """Row-parallel SPMD rule: without it the partitioner must treat
    the pallas call as opaque and gather the whole (data-sharded)
    batch onto every device.  Rows keep their sharding; the (small)
    weights replicate; the output shards like the rows — composes
    with DP/FSDP, where the unraveled weights are replicated values
    inside the step."""
    from jax.experimental.custom_partitioning import (
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = custom_partitioning(
        lambda x, a, b, c: _ff_local(x, a, b, c, block_m, interpret)
    )

    def _row_spec(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        return spec[0] if spec else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_row_spec(arg_shapes), None))

    def partition(mesh, arg_shapes, result_shape):
        rows = _row_spec(arg_shapes)
        arg_sh = (NamedSharding(mesh, P(rows, None)),) + (
            NamedSharding(mesh, P()),
        ) * 3
        return (
            mesh,
            lambda x, a, b, c: _ff_local(
                x, a, b, c, block_m, interpret
            ),
            NamedSharding(mesh, P(rows, None)),
            arg_sh,
        )

    fn.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # Shardy factor rule (required on this jax version): rows are
        # the only dim the partition callback actually shards; the
        # weight dims share factors so propagation stays consistent,
        # and partition() forces the weights replicated either way.
        sharding_rule="m d, d i, d i, i o -> m o",
    )
    return fn


def _fused_fwd(x2d, w1, w2, block_m: int, interpret: bool):
    d = x2d.shape[1]
    inner = w2.shape[0]
    ip = _pad_to(inner, 128)
    w1u = jnp.zeros((d, ip), w1.dtype).at[:, :inner].set(w1[:, :inner])
    w1g = jnp.zeros((d, ip), w1.dtype).at[:, :inner].set(w1[:, inner:])
    w2p = jnp.zeros((ip, w2.shape[1]), w2.dtype).at[:inner].set(w2)
    return _make_partitioned(block_m, interpret)(x2d, w1u, w1g, w2p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_geglu_ff(
    x, w1, w2, block_m: int = 256, interpret: bool = False
):
    """GEGLU FF with a fused Pallas forward and an XLA-recompute
    backward.  ``x`` is [..., D]; ``w1`` [D, 2*inner]; ``w2``
    [inner, D_out].  Numerics: inner activations accumulate f32 and
    the gated product casts to ``x.dtype`` before the second dot —
    identical to the unfused bf16 path's dtype chain."""
    lead = x.shape[:-1]
    out = _fused_fwd(
        x.reshape(-1, x.shape[-1]), w1, w2, block_m, interpret
    )
    return out.reshape(*lead, w2.shape[1])


def _vjp_fwd(x, w1, w2, block_m, interpret):
    return fused_geglu_ff(x, w1, w2, block_m, interpret), (x, w1, w2)


def _vjp_bwd(block_m, interpret, res, dout):
    x, w1, w2 = res
    _, vjp = jax.vjp(geglu_ff_reference, x, w1, w2)
    return vjp(dout)


fused_geglu_ff.defvjp(_vjp_fwd, _vjp_bwd)
