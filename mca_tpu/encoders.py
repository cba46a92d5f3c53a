"""Modality encoders (flax): config-driven ``name -> module`` registry.

Re-implements the reference encoder zoo (``/root/reference/encoders.py``)
as functional flax modules.  Every encoder maps a collated batch dict to
``(tokens [B, T, D], attention_mask [B, T])`` with the reference's mask
convention: **1/True = padded**.

Registry (ref encoders.py:277-283): SequenceEncoder, TabularEncoder,
SparseTabularEncoder, PatchEncoder, EmbeddedSequenceEncoder.

Deviations by design (reference quirks not replicated, SURVEY.md §7):
- ``ContinuousValueEncoder``'s dropout was a no-op in the reference
  (result discarded, ref :69) — omitted here.
- ``PatchEncoder`` computes its patch mask for all modes, not just
  ``matrix`` (the reference referenced an attribute defined only in
  matrix mode, ref :251 vs :273).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# torch nn.Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _dense(features: int, use_bias: bool = True, name: Optional[str] = None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_init,
        name=name,
    )


class TokenEncoder(nn.Module):
    """Embedding lookup with max-norm row renormalisation.

    Mirrors ref encoders.py:17-37 (``nn.Embedding(max_norm=1.0)``): rows
    whose L2 norm exceeds ``max_norm`` are scaled down to it at lookup
    time; ``padding_idx`` (negative wraps, torch-style) yields a zero
    vector.
    """

    num_embeddings: int
    embedding_dim: int
    padding_idx: Optional[int] = None
    max_norm: Optional[float] = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        table = self.param(
            "embedding",
            jax.nn.initializers.normal(1.0),
            (self.num_embeddings, self.embedding_dim),
        )
        emb = jnp.take(table, x, axis=0)
        if self.max_norm is not None:
            # max(||row||, max_norm) via squared norms: keeps the
            # gradient finite at exactly-zero rows (d||x||/dx is NaN at
            # 0; the padding_idx row is all-zero)
            norm_sq = jnp.sum(
                jnp.square(emb), axis=-1, keepdims=True
            )
            safe = jnp.sqrt(
                jnp.maximum(norm_sq, self.max_norm**2)
            )
            emb = emb * (self.max_norm / safe)
        if self.padding_idx is not None:
            pad = self.padding_idx % self.num_embeddings
            emb = jnp.where((x == pad)[..., None], 0.0, emb)
        return emb


class ContinuousValueEncoder(nn.Module):
    """Scalar -> vector MLP (ref encoders.py:40-72).

    ``Linear(1,d) -> ReLU -> Linear(d,d) -> LayerNorm``; input clamped to
    ``max_value`` from above; positions equal to ``padding_value`` are
    zeroed in the output.
    """

    d_model: int
    max_value: float = 512.0
    padding_value: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x[..., None]
        pad_mask = x == self.padding_value
        x = jnp.minimum(x, self.max_value)
        x = nn.relu(_dense(self.d_model, name="linear1")(x))
        x = _dense(self.d_model, name="linear2")(x)
        x = nn.LayerNorm(name="norm")(x)
        return jnp.where(pad_mask, 0.0, x)


class PositionalEncoder(nn.Module):
    """Fixed sinusoidal PE table (ref encoders.py:123-142).

    Returns the PE slice broadcast over the batch — the caller adds it.
    """

    d_model: int
    dropout: float = 0.1
    max_len: int = 2048

    def setup(self) -> None:
        position = np.arange(self.max_len)[:, None]
        div = np.exp(
            np.arange(0, self.d_model, 2)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = np.zeros((self.max_len, self.d_model), dtype=np.float32)
        pe[:, 0::2] = np.sin(position * div)
        pe[:, 1::2] = np.cos(position * div)
        self.pe = jnp.asarray(pe)
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        seq_len: int,
        deterministic: bool = True,
        batch: int = 1,
    ) -> Array:
        """Returns [batch, seq_len, d].  In train mode the dropout mask
        is drawn independently PER SAMPLE, matching the reference's
        ``self.dropout(pe.repeat(B, 1, 1))`` (ref encoders.py:142)."""
        pe = jnp.broadcast_to(
            self.pe[:seq_len], (batch, seq_len, self.d_model)
        )
        if self.dropout > 0.0 and not deterministic:
            pe = self.drop(pe, deterministic=False)
        return pe


class TabularEncoder(nn.Module):
    """Dense table -> tokens (ref encoders.py:75-96): column-identity
    embeddings + encoded values, summed.  TCGA's encoder."""

    num_embeddings: int = 128
    embedding_dim: int = 512
    padding_idx: int = -1
    max_value: float = 10000.0

    @nn.compact
    def __call__(
        self, batch: Dict[str, Array], deterministic: bool = True
    ) -> Tuple[Array, Array]:
        index = jnp.arange(self.num_embeddings)
        x_t = TokenEncoder(
            self.num_embeddings,
            self.embedding_dim,
            self.padding_idx,
            name="token_encoder",
        )(index)
        x_v = ContinuousValueEncoder(
            self.embedding_dim,
            max_value=self.max_value,
            padding_value=float(self.padding_idx),
            name="value_encoder",
        )(batch["values"])
        assert x_v.shape[1] == self.num_embeddings, (
            f"{x_v.shape[1]} - {self.num_embeddings}"
        )
        return x_t[None, :, :] + x_v, batch["attention_mask"]


class SparseTabularEncoder(nn.Module):
    """Sparse table -> tokens (ref encoders.py:100-120): embedded column
    indices + encoded values, summed."""

    num_embeddings: int = 36602
    embedding_dim: int = 512
    padding_idx: int = 0
    max_value: float = 10000.0

    @nn.compact
    def __call__(
        self, batch: Dict[str, Array], deterministic: bool = True
    ) -> Tuple[Array, Array]:
        x_t = TokenEncoder(
            self.num_embeddings,
            self.embedding_dim,
            self.padding_idx,
            name="token_encoder",
        )(batch["indices"].astype(jnp.int32))
        x_v = ContinuousValueEncoder(
            self.embedding_dim,
            max_value=self.max_value,
            padding_value=float(self.padding_idx),
            name="value_encoder",
        )(batch["data"])
        return x_t + x_v, batch["attention_mask"]


class SequenceEncoder(nn.Module):
    """Token-id sequence encoder (ref encoders.py:145-166)."""

    num_embeddings: int = 36602
    embedding_dim: int = 512
    padding_idx: int = 0
    dropout: float = 0.0
    max_tokens: int = 1024

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, Array],
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        tokens = batch["tokens"].astype(jnp.int32)
        x_t = TokenEncoder(
            self.num_embeddings,
            self.embedding_dim,
            self.padding_idx,
            name="token_encoder",
        )(tokens)
        x_p = PositionalEncoder(
            self.embedding_dim,
            self.dropout,
            self.max_tokens,
            name="positional_encoder",
        )(tokens.shape[1], deterministic, batch=tokens.shape[0])
        return x_t + x_p, batch["attention_mask"]


class EmbeddedSequenceEncoder(nn.Module):
    """Pre-embedded variable-length sequences (ref encoders.py:169-214).

    Padded rows are zeroed before AND after the
    ``LayerNorm -> Linear -> LayerNorm`` projection, then sinusoidal PE
    is added (padded rows therefore carry pure PE, as in the reference).
    """

    input_size: int = 128
    embedding_dim: int = 512
    dropout: float = 0.0
    max_tokens: int = 1024

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, Array],
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        mask = batch["attention_mask"].astype(bool)
        x = jnp.where(mask[..., None], 0.0, batch["tokens"])
        x = nn.LayerNorm(name="pre_norm")(x)
        x = _dense(self.embedding_dim, name="proj")(x)
        x = nn.LayerNorm(name="post_norm")(x)
        x = jnp.where(mask[..., None], 0.0, x)
        x_p = PositionalEncoder(
            self.embedding_dim,
            self.dropout,
            self.max_tokens,
            name="positional_encoder",
        )(x.shape[1], deterministic, batch=x.shape[0])
        return x + x_p, batch["attention_mask"]


class PatchEncoder(nn.Module):
    """ViT-style patching for matrix / image / video (ref encoders.py:217-274).

    ``LayerNorm -> Linear -> LayerNorm`` over flattened patches plus a
    learnable positional embedding over ``max_tokens``; the attention
    mask marks patches entirely equal to ``pad_token``.
    """

    patch_size: Sequence[int] = (16, 16)
    mode: str = "matrix"
    num_channels: int = 0
    embedding_dim: int = 512
    max_tokens: int = 1024
    dropout: float = 0.1
    attn_mask: bool = True
    pad_token: float = -10000.0

    def _patchify(self, values: Array) -> Array:
        """Rearrange into [B, n_patches, patch_elems]."""
        from einops import rearrange

        p = tuple(self.patch_size)
        if self.mode == "matrix":
            assert len(p) == 2
            return rearrange(
                values,
                "b (h p1) (w p2) -> b (h w) (p1 p2)",
                p1=p[0],
                p2=p[1],
            )
        if self.mode == "image":
            assert len(p) == 2
            return rearrange(
                values,
                "b c (h p1) (w p2) -> b (h w) (c p1 p2)",
                p1=p[0],
                p2=p[1],
            )
        if self.mode == "video":
            assert len(p) == 3
            return rearrange(
                values,
                "b c (t p1) (h p2) (w p3) -> b (t h w) (c p1 p2 p3)",
                p1=p[0],
                p2=p[1],
                p3=p[2],
            )
        raise ValueError(self.mode)

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, Array],
        deterministic: bool = True,
    ) -> Tuple[Array, Optional[Array]]:
        patches = self._patchify(batch["values"])
        x = nn.LayerNorm(name="pre_norm")(patches)
        x = _dense(self.embedding_dim, name="proj")(x)
        x = nn.LayerNorm(name="post_norm")(x)
        assert x.shape[1] == self.max_tokens, (
            f"{x.shape[1]} - {self.max_tokens}"
        )
        pos = self.param(
            "pos_embedding",
            jax.nn.initializers.normal(1.0),
            (self.max_tokens, self.embedding_dim),
        )
        x = x + pos[None]
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        mask = (
            jnp.all(patches == self.pad_token, axis=-1).astype(jnp.int64)
            if self.attn_mask
            else None
        )
        return x, mask


encoders_dict = {
    "SequenceEncoder": SequenceEncoder,
    "TabularEncoder": TabularEncoder,
    "SparseTabularEncoder": SparseTabularEncoder,
    "PatchEncoder": PatchEncoder,
    "EmbeddedSequenceEncoder": EmbeddedSequenceEncoder,
}

#: encoder-config keys that are collator/bookkeeping-only and must not be
#: forwarded to the module constructors
_NON_MODULE_KEYS = {"type", "max_tokens", "dropout_collator"}


def build_encoder(
    name: str, encoder_config: Dict[str, Any], embedding_dim: int
) -> nn.Module:
    """Instantiate a registry encoder from a YAML ``encoder_configs`` entry."""
    cfg = dict(encoder_config)
    etype = cfg.pop("type")
    cls = encoders_dict[etype]
    field_names = {f.name for f in cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in cfg.items() if k in field_names}
    if "embedding_dim" in field_names:
        kwargs.setdefault("embedding_dim", embedding_dim)
    if etype in ("SequenceEncoder", "EmbeddedSequenceEncoder", "PatchEncoder"):
        kwargs["max_tokens"] = cfg.get("max_tokens", 1024)
    return cls(name=name, **kwargs)
