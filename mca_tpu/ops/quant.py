"""Int8 weight quantization for the serving forward (TPU MXU int8).

The v5e MXU executes s8 x s8 -> s32 matmuls at twice the bf16 rate,
and int8 weights are a quarter of the fp32 checkpoint bytes — for the
ONLINE serving path (``mca_tpu.serve``), where a fixed-shape embedding
forward runs at small batch, this is the standard post-training
quantization recipe:

- **weights**: symmetric per-output-channel int8
  (``scale[o] = max_i |W[i, o]| / 127``) — computed ONCE offline from
  the trained fp32 checkpoint (:func:`quantize_params`);
- **activations**: symmetric per-row dynamic int8
  (``s[r] = max_c |x[r, c]| / 127``), quantized on the fly inside the
  jitted forward — no calibration set needed;
- the matmul runs ``s8 x s8 -> s32`` on the MXU
  (``preferred_element_type=int32``), then one fused rescale
  ``y = yq * s_row * scale_col`` restores the compute dtype.

Only the fusion-transformer projections (``to_q/to_kv/to_out`` and the
GEGLU ``w_in/w_out`` — the same five matrices the tensor-parallel
rules shard, ``mca_tpu.parallel.sharding._RULES``) are quantized; the
encoders, LayerNorms, attentive pool and loss head stay in fp32/bf16.
Training is untouched — this is an inference-only transform, selected
per-service (``python -m mca_tpu.serve ... --quantize int8``).

Reference counterpart: none (the reference serves nothing and
quantizes nothing); the parity bar is self-imposed:
``tests/test_quant.py`` pins quantized-vs-fp32 embedding cosine
similarity on every output key.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

#: transformer-block projection module names whose single "kernel" is
#: replaced by ("kernel_q", "scale") — keep in sync with
#: mca_tpu.models.layers and the TP rules in mca_tpu.parallel.sharding
QUANT_DENSE_NAMES = ("to_q", "to_kv", "to_out", "w_in", "w_out")

_EPS = 1e-8


def quantize_weight(w) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 of a ``[in, out]`` kernel."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), _EPS) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def int8_dot(x, kernel_q, scale):
    """``x @ dequant(kernel_q)`` with dynamic per-row activation
    quantization: one s8 x s8 -> s32 MXU dot plus a fused rescale.

    ``x``: ``[..., in]`` float; ``kernel_q``: ``[in, out]`` int8;
    ``scale``: ``[out]`` fp32.  Returns ``[..., out]`` in ``x.dtype``.
    """
    xf = x.astype(jnp.float32)
    s_row = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS
    ) / 127.0
    xq = jnp.clip(jnp.round(xf / s_row), -127, 127).astype(jnp.int8)
    yq = jax.lax.dot_general(
        xq,
        kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yq.astype(jnp.float32) * s_row * scale
    return y.astype(x.dtype)


class QuantDense(nn.Module):
    """Bias-free Dense over an int8 kernel + per-channel scale.

    Drop-in for the transformer blocks' ``nn.Dense`` at serving time;
    parameters come from :func:`quantize_params` applied to a trained
    fp32 tree (init produces a quantized random kernel only so the
    module is self-standing in tests).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]

        def init_q(key, shape):
            # traced under jit(init): jnp throughout (the numpy
            # quantize_weight is for offline tree conversion)
            from mca_tpu.encoders import torch_linear_init

            w = torch_linear_init(key, shape)
            s = jnp.maximum(jnp.abs(w).max(axis=0), _EPS) / 127.0
            return jnp.clip(jnp.round(w / s), -127, 127).astype(
                jnp.int8
            )

        kernel_q = self.param(
            "kernel_q", init_q, (in_dim, self.features)
        )
        # init scale matches torch_linear_init's uniform bound /127 —
        # only converted trees are meant to be served
        bound = 1.0 / np.sqrt(in_dim)
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, bound / 127.0),
            (self.features,),
        )
        return int8_dot(x.astype(self.dtype), kernel_q, scale)


def quantize_params(
    variables: Any, skip_substr: Tuple[str, ...] = ("attn_pool",)
) -> Dict[str, Any]:
    """Convert a trained fp32/bf16 parameter tree for the quantized
    model: every ``{to_q,to_kv,to_out,w_in,w_out}: {kernel}`` subtree
    inside the transformer blocks becomes ``{kernel_q, scale}``.

    Subtrees whose path contains any of ``skip_substr`` stay float
    (the attentive pool's projections run fp32 in the quantized model
    too — its Attention module is built with ``quant='none'``).
    """
    try:
        from flax.core import unfreeze

        variables = unfreeze(variables)
    except Exception:
        pass

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            sub = path + (k,)
            if (
                isinstance(v, dict)
                and k in QUANT_DENSE_NAMES
                and set(v.keys()) == {"kernel"}
                and not any(
                    s in p for s in skip_substr for p in sub
                )
            ):
                q, s = quantize_weight(v["kernel"])
                out[k] = {
                    "kernel_q": jnp.asarray(q),
                    "scale": jnp.asarray(s),
                }
            else:
                out[k] = walk(v, sub)
        return out

    return walk(dict(variables), ())
