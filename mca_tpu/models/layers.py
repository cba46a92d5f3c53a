"""Fusion-transformer primitives (ref model.py:24-122).

- :class:`LayerNorm` — bias-less (learnable scale, zero offset).
- :class:`FeedForward` — GEGLU MLP, ``inner = int(dim * mult * 2/3)``,
  all projections bias-free, exact (erf) GELU like torch ``F.gelu``.
- :class:`Attention` — MHA with fused KV projection and support for
  cross-attention (used by attentive pooling) and the static/dynamic
  mask pair; the score computation is delegated to
  :func:`mca_tpu.ops.masked_attention`.
- :class:`MCALayer` — pre-norm block that (faithfully to ref
  model.py:117-122) reuses ONE LayerNorm instance for both sub-layers
  and residuals around the *normed* activations:
  ``x = attn(norm(x)) + norm(x); x = ff(norm(x)) + norm(x)``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mca_tpu.encoders import torch_linear_init
from mca_tpu.ops.attention import masked_attention

Array = jax.Array


def _make_dense(features: int, dtype, name: str, quant: str = "none"):
    """Projection factory: the fp Dense used for training, or the
    int8 ``QuantDense`` (``mca_tpu.ops.quant``) when the model is
    built with ``quant='int8'`` — a serving-only transform whose
    parameters come from ``quantize_params`` on a trained tree."""
    if quant == "int8":
        from mca_tpu.ops.quant import QuantDense

        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(
        features,
        use_bias=False,
        kernel_init=torch_linear_init,
        dtype=dtype,
        name=name,
    )


class _ProjKernel(nn.Module):
    """Parameter-only stand-in for a bias-free ``nn.Dense`` child.

    Owns the identical ``<name>/kernel`` parameter (same path, shape,
    and init as the Dense it replaces) but returns the kernel itself,
    so the caller can concatenate several projections into one GEMM.
    Checkpoints, interop, and weight-transplant parity are unaffected
    because the parameter tree is byte-identical either way.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> Array:
        return self.param(
            "kernel", torch_linear_init, (in_features, self.features)
        )


def _fused_qkv_enabled() -> bool:
    """Trace-time A/B knob: fuse the self-attention q and kv
    projections into a single ``[dim, 3*inner]`` GEMM
    (``MCA_FUSED_QKV=1``; kernels concatenated at trace time, param
    tree unchanged).  MEASURED NEGATIVE at canonical scale: 392.5k vs
    396.6k tok/s (-1%, interleaved x2 on the v5e, PERF.md round 3) —
    the per-step weight concat (fwd and again in the bwd dW split)
    costs more than the wider GEMM saves.  Default off; kept as a
    pinned regression oracle (tests/test_model.py)."""
    return os.environ.get("MCA_FUSED_QKV", "0") == "1"


class LayerNorm(nn.Module):
    """Bias-less layernorm (ref model.py:24-31)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(
            use_bias=False, use_scale=True, dtype=jnp.float32
        )(x)


def _fused_ff_mode() -> str:
    """``MCA_FUSED_FF``: ``0`` (default — XLA FF) | ``1`` (fused
    Pallas FF; interpret mode off-TPU) | ``auto`` (fused on TPU).

    The fused kernel keeps the [N, 2*inner] GEGLU activation
    VMEM-resident (the weights are small enough to pin), cutting
    ~166 MB of HBM round-trips per layer: measured FORWARD 0.811 ->
    0.611 ms/layer at canonical scale (baselines/ab_fused_ff.py).
    Its backward must recompute the inner activations from the saved
    input (mca_tpu.ops.fused_ff), and that recompute measured NET
    NEGATIVE for training end-to-end (bench A/B: 447.8k vs 466.0k
    tok/s, PERF.md round 4) — so TRAINING defaults to the XLA path,
    and the forward-only entry points (infer / serve / AOT export)
    default the env to the fused kernel instead."""
    return os.environ.get("MCA_FUSED_FF", "0")


class FeedForward(nn.Module):
    """GEGLU feedforward (ref model.py:35-54)."""

    dim: int
    mult: float = 4
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = int(self.dim * self.mult * 2 / 3)
        x = x.astype(self.dtype)
        mode = _fused_ff_mode()
        fused = self.quant == "none" and (
            mode == "1"
            or (mode == "auto" and jax.default_backend() == "tpu")
        )
        if fused:
            from mca_tpu.ops.fused_ff import fused_geglu_ff

            # identical param tree to the Dense path (w_in/kernel,
            # w_out/kernel — see _ProjKernel)
            w1 = _ProjKernel(inner * 2, name="w_in")(x.shape[-1])
            w2 = _ProjKernel(self.dim, name="w_out")(inner)
            return fused_geglu_ff(
                x,
                w1.astype(self.dtype),
                w2.astype(self.dtype),
                256,
                jax.default_backend() != "tpu",
            )
        h = _make_dense(inner * 2, self.dtype, "w_in", self.quant)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(gate, approximate=False) * h
        return _make_dense(self.dim, self.dtype, "w_out", self.quant)(h)


class Attention(nn.Module):
    """Multi-head attention (ref model.py:57-105).

    ``attn_mask`` is a static [Tq, Tk] bool (True = blocked);
    ``key_padding_mask`` a dynamic [B, Tk] bool (True = padded).
    ``context`` switches to cross-attention (attentive pooling,
    ref model.py:471-473).
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    impl: str = "dense"
    quant: str = "none"

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        attn_mask: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
        return_attn: bool = False,
    ):
        inner = self.dim_head * self.heads
        kv_x = x if context is None else context
        x = x.astype(self.dtype)
        kv_x = kv_x.astype(self.dtype)
        if (
            context is None
            and self.quant == "none"
            and _fused_qkv_enabled()
        ):
            # Self-attention fast path: one [dim, 3*inner] GEMM for
            # q+k+v (kernels concatenated at trace time; param tree
            # unchanged — see _ProjKernel).
            d_in = x.shape[-1]
            w_q = _ProjKernel(inner, name="to_q")(d_in)
            w_kv = _ProjKernel(inner * 2, name="to_kv")(d_in)
            w = jnp.concatenate([w_q, w_kv], axis=1).astype(self.dtype)
            qkv = x @ w
            q, kv = qkv[..., :inner], qkv[..., inner:]
        else:
            q = _make_dense(inner, self.dtype, "to_q", self.quant)(x)
            kv = _make_dense(
                inner * 2, self.dtype, "to_kv", self.quant
            )(kv_x)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t: Array) -> Array:
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        attn_weights = None
        if return_attn:
            # introspection hook (ref model.py:79, 102-105): the
            # probabilities only exist materialised on the dense path
            from mca_tpu.ops.attention import dense_masked_attention

            out, attn_weights = dense_masked_attention(
                split_heads(q),
                split_heads(k),
                split_heads(v),
                scale=self.dim_head**-0.5,
                attn_mask=jnp.asarray(attn_mask)
                if attn_mask is not None
                else None,
                key_padding_mask=key_padding_mask,
                return_attn=True,
            )
        else:
            out = masked_attention(
                split_heads(q),
                split_heads(k),
                split_heads(v),
                scale=self.dim_head**-0.5,
                attn_mask=attn_mask,
                key_padding_mask=key_padding_mask,
                impl=self.impl,
            )
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = _make_dense(
            self.dim, self.dtype, "to_out", self.quant
        )(out)
        if return_attn:
            return out, attn_weights
        return out


class MCALayer(nn.Module):
    """Transformer block with a shared LayerNorm (ref model.py:109-122)."""

    dim: int
    dim_head: int
    heads: int
    ff_mult: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "dense"
    quant: str = "none"
    # mixture-of-experts FF (extension — see mca_tpu.models.moe):
    # 0 = the reference's dense GEGLU; E > 0 = E expert-choice GEGLU
    # experts, expert dim sharded over the 'model' mesh axis (EP)
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    def setup(self) -> None:
        self.attn = Attention(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            dtype=self.dtype,
            impl=self.attn_impl,
            quant=self.quant,
            name="attn",
        )
        if int(self.moe_experts) > 0:
            assert self.quant == "none", (
                "int8 serving quantization covers the dense "
                "projections only; moe_experts requires quant='none'"
            )
            from mca_tpu.models.moe import MoEFeedForward

            self.ff = MoEFeedForward(
                dim=self.dim,
                num_experts=int(self.moe_experts),
                mult=self.ff_mult,
                capacity_factor=float(self.moe_capacity_factor),
                dtype=self.dtype,
                name="ff",
            )
        else:
            self.ff = FeedForward(
                dim=self.dim,
                mult=self.ff_mult,
                dtype=self.dtype,
                quant=self.quant,
                name="ff",
            )
        # ONE norm instance, applied before both sub-layers — parameter
        # sharing faithful to the reference.
        self.norm = LayerNorm(name="norm")

    def __call__(
        self,
        x: Array,
        attn_mask: Optional[Array] = None,
        padding_mask: Optional[Array] = None,
        return_attn: bool = False,
    ):
        x = self.norm(x)
        attn_out = self.attn(
            x,
            attn_mask=attn_mask,
            key_padding_mask=padding_mask,
            return_attn=return_attn,
        )
        attn_weights = None
        if return_attn:
            attn_out, attn_weights = attn_out
        x = attn_out.astype(x.dtype) + x
        x = self.norm(x)
        if int(self.moe_experts) > 0:
            # the router sees the padding mask so experts spend their
            # capacity on real tokens (mca_tpu.models.moe)
            ff_out = self.ff(x, padding_mask)
        else:
            ff_out = self.ff(x)
        x = ff_out.astype(x.dtype) + x
        if return_attn:
            return x, attn_weights
        return x
