"""Mixture-of-experts feedforward with expert-choice routing.

A TPU-native capability EXTENSION (the reference's FF is always dense,
ref model.py:35-54): ``moe_experts: E`` in a train config replaces
every transformer block's GEGLU :class:`~mca_tpu.models.layers.FeedForward`
with ``E`` GEGLU experts routed per token, giving the sparse-FF scaling
axis (more parameters at near-constant per-token FLOPs) plus **expert
parallelism** — the stacked expert parameters shard over the mesh's
``model`` axis (``mca_tpu.parallel.sharding``), so a fleet holds E/tp
experts per device and the XLA partitioner places the token
all-to-alls.

Design: **expert choice** routing (Zhou et al. 2022, "Mixture-of-
Experts with Expert Choice Routing") rather than token-choice top-k:

- each expert selects its top-``C`` tokens by router score, with
  ``C = capacity_factor * T / E`` — perfect load balance by
  construction, so NO auxiliary balancing loss is needed (the train
  loop, loss graph, and logging are untouched);
- every shape is static: the dispatch/combine are one-hot einsums —
  O(cf*T^2*D) matmul FLOPs, but they ride the MXU and MEASURE FASTER
  on the real chip than the O(cf*T*D) gather/scatter alternative
  (E=2 full train step 84.9 ms one-hot vs 93.8 ms gather; TPU
  scatter-add is the slow path, not the extra matmul FLOPs — PERF.md
  round 3).  The gather/scatter arm is kept behind
  ``MCA_MOE_IMPL=gather`` (pinned == one-hot for values and grads,
  tests/test_moe.py) for much longer sequences, where the T^2 term
  must eventually win; nothing is data-dependent but the gather
  indices;
- routing is PER SAMPLE (experts pick tokens within each row of the
  batch), so a sample's embedding never depends on what else shared
  its batch — required for the deterministic inference/serving
  contract (`mca_tpu.infer` / `mca_tpu.serve`).

A token may be picked by several experts (outputs sum, weighted by the
router score) or by none (the FF contribution is zero and the block's
residual carries the token — the expert-choice analogue of dropping).
Padded tokens route with score zero, so experts prefer real tokens and
a padded token that is still picked contributes nothing.

Exactness anchors (tests/test_moe.py): with ``E=1, capacity_factor=1``
the module reproduces the dense GEGLU FeedForward on unpadded input
up to fp32 einsum association; the einsum dispatch/combine is pinned
against a per-token python-loop oracle for values AND gradients; the
expert-parallel sharded step is pinned against the replicated step on
the virtual mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mca_tpu.encoders import torch_linear_init

Array = jax.Array

#: per-expert kaiming-uniform matching ``torch_linear_init`` — the
#: leading expert dim is a batch axis, so fan_in stays the matrix's
#: own input width (same scale as the dense FF it replaces).
stacked_linear_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform", in_axis=-2, out_axis=-1,
    batch_axis=(0,),
)


def expert_capacity(
    seq_len: int, num_experts: int, capacity_factor: float
) -> int:
    """Tokens each expert processes: ``cf * T / E``, clamped to
    ``[1, T]`` (static — part of the jit signature)."""
    cap = int(round(capacity_factor * seq_len / num_experts))
    return max(1, min(seq_len, cap))


class MoEFeedForward(nn.Module):
    """Expert-choice GEGLU MoE, drop-in for ``FeedForward``.

    Parameters live under the SAME ``ff`` module name as the dense
    feedforward they replace: ``router`` ``[dim, E]``, ``w_in``
    ``[E, dim, 2*inner]``, ``w_out`` ``[E, inner, dim]`` — the
    partition rules shard the expert dim over ``model``
    (:mod:`mca_tpu.parallel.sharding`).
    """

    dim: int
    num_experts: int
    mult: float = 4
    capacity_factor: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, padding_mask: Optional[Array] = None
    ) -> Array:
        assert self.num_experts >= 1
        B, T, D = x.shape
        E = self.num_experts
        C = expert_capacity(T, E, self.capacity_factor)
        inner = int(self.dim * self.mult * 2 / 3)

        router = self.param("router", torch_linear_init, (D, E))
        w_in = self.param(
            "w_in", stacked_linear_init, (E, D, inner * 2)
        )
        w_out = self.param(
            "w_out", stacked_linear_init, (E, inner, D)
        )

        # --- routing: fp32 scores, softmax over experts per token
        logits = jnp.einsum(
            "btd,de->bte", x.astype(jnp.float32), router
        )
        scores = jax.nn.softmax(logits, axis=-1)
        if padding_mask is not None:
            # padded tokens score 0 — sorted after every real token
            # (softmax scores are strictly positive), and a padded
            # token picked only because C exceeds the real-token count
            # combines with weight 0.
            scores = jnp.where(
                padding_mask[..., None].astype(bool), 0.0, scores
            )
        # each expert picks its top-C tokens of the sample
        gates, token_idx = jax.lax.top_k(
            scores.transpose(0, 2, 1), C
        )  # [B, E, C]

        # introspection hooks (mca_tpu.tools.moe_stats): no-ops unless
        # apply() is called with mutable=["intermediates"], so the
        # training/inference hot paths trace nothing extra
        self.sow("intermediates", "router_scores", scores)
        self.sow("intermediates", "token_idx", token_idx)
        self.sow("intermediates", "gates", gates)

        compute = self.dtype
        impl = os.environ.get("MCA_MOE_IMPL", "onehot")
        if impl == "onehot":
            # one-hot matmul dispatch/combine: O(E*C*T*D) =
            # O(cf*T^2*D) FLOPs, but pure MXU work — measured FASTER
            # at the canonical packed T=2548 than the gather/scatter
            # arm below (E=2 step 84.9 vs 93.8 ms; TPU scatter-add
            # serialises, matmuls don't — PERF.md round 3).
            dispatch = jax.nn.one_hot(
                token_idx, T, dtype=compute
            )  # [B, E, C, T]
            xe = jnp.einsum(
                "bect,btd->becd", dispatch, x.astype(compute)
            )
        else:
            # gather dispatch / scatter-add combine: O(cf*T*D) data
            # movement, no T^2 term — the asymptotic win for much
            # longer sequences, measured slower at T=2548 (above)
            xe = jnp.take_along_axis(
                x.astype(compute)[:, None],  # [B, 1, T, D]
                token_idx[..., None],  # [B, E, C, 1]
                axis=2,
            )  # [B, E, C, D]
        h = jnp.einsum("becd,edf->becf", xe, w_in.astype(compute))
        h, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(gate, approximate=False) * h
        out = jnp.einsum("becf,efd->becd", h, w_out.astype(compute))
        if impl == "onehot":
            return jnp.einsum(
                "bect,bec,becd->btd",
                dispatch,
                gates.astype(compute),
                out,
            )
        weighted = gates.astype(compute)[..., None] * out  # [B, E, C, D]
        combined = jnp.zeros((B, T, D), compute)
        b_idx = jnp.arange(B)[:, None, None]
        # duplicate token indices (a token picked by several experts)
        # accumulate, matching the one-hot combine's sum
        return combined.at[b_idx, token_idx].add(weighted)
