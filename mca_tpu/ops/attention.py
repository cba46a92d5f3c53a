"""Masked multi-head attention ops.

Two implementations of the same contract:

- ``dense``: reference-semantics einsum attention (the numeric oracle).
  Mirrors ref model.py:73-105 — scores are computed at full [B, H, Tq, Tk],
  blocked/padded positions are *set* to the dtype's most-negative finite
  value before softmax (so a fully-masked row softmaxes to uniform, like
  torch ``masked_fill`` + softmax; such rows only occur at padded query
  positions whose outputs are discarded downstream).
- ``pallas``: block-sparse flash attention exploiting the static
  modality-block structure of the zorro/MCA masks (see
  ``mca_tpu.ops.flash_attention``); O(T) memory, skips fully-blocked
  tiles.

Masks: ``attn_mask`` is a static ``[Tq, Tk]`` bool (True = blocked)
shared across the batch; ``key_padding_mask`` is a dynamic ``[B, Tk]``
bool (True = padded key).  Softmax statistics accumulate in fp32
regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG = float(jnp.finfo(jnp.float32).min)


def dense_masked_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float,
    attn_mask: Optional[Array] = None,
    key_padding_mask: Optional[Array] = None,
    return_attn: bool = False,
):
    """[B, H, Tq, Dh] x [B, H, Tk, Dh] -> [B, H, Tq, Dh].

    ``return_attn=True`` also returns the post-softmax probabilities
    ``[B, H, Tq, Tk]`` (ref model.py:79, 102-105 — an introspection
    hook; only the dense path materialises them).
    """
    out_dtype = q.dtype
    sim = jnp.einsum(
        "bhid,bhjd->bhij",
        q * scale,
        k,
        preferred_element_type=jnp.float32,
    )
    if attn_mask is not None:
        sim = jnp.where(attn_mask[None, None, :, :], _NEG, sim)
    if key_padding_mask is not None:
        sim = jnp.where(
            key_padding_mask[:, None, None, :], _NEG, sim
        )
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum(
        "bhij,bhjd->bhid",
        attn.astype(out_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    if return_attn:
        return out.astype(out_dtype), attn
    return out.astype(out_dtype)


def masked_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float,
    attn_mask: Optional[Array] = None,
    key_padding_mask: Optional[Array] = None,
    impl: str = "dense",
) -> Array:
    """Dispatch between the dense oracle, the monolithic Pallas flash
    kernel, and the segment-decomposed path.

    ``impl='auto'`` picks the monolithic Pallas kernel on TPU backends
    when the mask is static (a numpy array — required to derive the
    tile schedule at trace time), the dense path otherwise.
    ``impl='segmented'`` decomposes by the mask's query-row structure
    (per-modality unmasked flash + one dense cross call); measured
    SLOWER at canonical scale — 308k vs 366k tok/s, the extra
    launches/slices cost more than the skipped score area saves — but
    kept for much longer sequences where O(T^2) tile quantisation
    dominates (see PERF.md round 2).
    """
    import numpy as np

    if impl == "auto":
        static_mask = attn_mask is None or isinstance(
            attn_mask, np.ndarray
        )
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = "pallas" if (static_mask and on_tpu) else "dense"
    if impl == "segmented":
        if attn_mask is not None and not isinstance(
            attn_mask, np.ndarray
        ):
            raise ValueError(
                "attention_impl='segmented' needs a STATIC numpy "
                "attn_mask (the row decomposition is derived at trace "
                "time); got a traced array"
            )
        from mca_tpu.ops.segmented_attention import (
            segmented_masked_attention,
        )

        return segmented_masked_attention(
            q,
            k,
            v,
            scale=scale,
            attn_mask=attn_mask,
            key_padding_mask=key_padding_mask,
            # Pallas TPU kernels only lower on TPU backends; interpret
            # mode keeps the config value runnable everywhere else
            # (CPU tests, GPU hosts)
            interpret=jax.default_backend() != "tpu",
        )
    if impl == "pallas":
        from mca_tpu.ops.flash_attention import flash_masked_attention

        return flash_masked_attention(
            q,
            k,
            v,
            scale=scale,
            attn_mask=attn_mask,
            key_padding_mask=key_padding_mask,
            interpret=jax.default_backend() != "tpu",
        )
    if attn_mask is not None:
        attn_mask = jnp.asarray(attn_mask)
    return dense_masked_attention(
        q,
        k,
        v,
        scale=scale,
        attn_mask=attn_mask,
        key_padding_mask=key_padding_mask,
    )
