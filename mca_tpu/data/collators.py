"""Static-shape batch collation (numpy; the jit boundary is downstream).

Semantics match the reference collators (``/root/reference/encoders.py``):

- :class:`SequenceCollator` (ref :286-311) — right-pad 1-D data to
  ``pad_len`` with ``pad_token``; ``attention_mask = (x == pad_token)``
  (int, 1 = padded); optional second column padded with 0.  Used for
  token sequences AND dense/sparse tabular data (TCGA).
- :class:`EmbeddedSequenceCollator` (ref :314-343) — pre-embedded
  ``[T, input_size]`` float sequences (CMU): truncate to ``pad_len``,
  ``nan_to_num`` clean, 1-D attention mask from true length, rows padded
  with ``fill_value`` into key ``"tokens"``.
- :class:`MatrixCollator` (ref :346-364) — 2-D matrix (spectrogram)
  row-padding with ``pad_token``; mask derived later by PatchEncoder.
- :class:`MultimodalCollator` (ref :374-403) — re-group a list of
  per-sample dicts into per-modality column dicts, apply each modality's
  collator, optionally stack a label column.

A missing modality (value ``None``, produced by dataset-level modality
dropout) collates to a fully-padded row, which downstream becomes an
absent-sample mask.  All outputs are fixed-shape numpy arrays, so the
whole batch can be shipped to device in one transfer and every jit
trace sees static shapes.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def _to_numpy(x: Any) -> Optional[np.ndarray]:
    if x is None:
        return None
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "numpy"):  # torch tensor interop
        return x.numpy()
    return np.asarray(x)


class SequenceCollator:
    """Pad 1-D sequences / tabular rows to ``pad_len`` (ref encoders.py:286-311)."""

    def __init__(
        self,
        pad_token: float = 0,
        pad_len: int = 2048,
        data_col_name: str = "indices",
        other_col: str = "data",
        attn_mask: bool = True,
        **kwargs: Any,
    ):
        self.pad_token = pad_token
        self.pad_len = pad_len
        self.attn_mask = attn_mask
        self.data_col_name = data_col_name
        self.other_col = other_col

    def __call__(
        self, data: Dict[str, List[Any]]
    ) -> Dict[str, np.ndarray]:
        from mca_tpu import native

        rows = [_to_numpy(x) for x in data[self.data_col_name]]
        if native.available():
            out, mask = native.pad_rows(
                rows,
                self.pad_len,
                self.pad_token,
                with_mask=self.attn_mask,
            )
            collated: Dict[str, np.ndarray] = {
                self.data_col_name: out
            }
            if self.attn_mask:
                collated["attention_mask"] = mask
        else:
            rows = [
                r if r is not None else np.zeros((0,), np.float32)
                for r in rows
            ]
            b = len(rows)
            out = np.full(
                (b, self.pad_len), self.pad_token, dtype=np.float32
            )
            for i, r in enumerate(rows):
                r = r.reshape(-1)[: self.pad_len]
                out[i, : r.shape[0]] = r
            collated = {self.data_col_name: out}
            if self.attn_mask:
                collated["attention_mask"] = (
                    out == self.pad_token
                ).astype(np.int64)
        if self.other_col in data:
            other_rows = [_to_numpy(x) for x in data[self.other_col]]
            if native.available():
                collated[self.other_col] = native.pad_rows_fill(
                    other_rows, self.pad_len, 0.0
                )
            else:
                b = len(other_rows)
                other = np.zeros((b, self.pad_len), dtype=np.float32)
                for i, r in enumerate(other_rows):
                    if r is None:
                        continue
                    r = r.reshape(-1)[: self.pad_len]
                    other[i, : r.shape[0]] = r
                collated[self.other_col] = other
        return collated


class EmbeddedSequenceCollator:
    """Pad pre-embedded ``[T, D]`` sequences (ref encoders.py:314-343)."""

    def __init__(
        self,
        pad_token: float = -1,
        fill_value: float = 0.0,
        pad_len: int = 2048,
        embedding_size: int = 512,
        data_col_name: str = "values",
        attn_mask: bool = True,
        truncate: bool = True,
        clean: bool = True,
        **kwargs: Any,
    ):
        self.pad_token = pad_token
        self.fill_value = fill_value
        self.pad_len = pad_len
        self.attn_mask = attn_mask
        self.data_col_name = data_col_name
        self.truncate = truncate
        self.clean = clean
        self.embedding_size = embedding_size

    def __call__(
        self, data: Dict[str, List[Any]]
    ) -> Dict[str, np.ndarray]:
        from mca_tpu import native

        rows = [
            _to_numpy(x)
            if x is not None
            else np.zeros((0, self.embedding_size), np.float32)
            for x in data[self.data_col_name]
        ]
        if self.truncate:
            rows = [r[: self.pad_len] for r in rows]
        emb = next(
            (r.shape[-1] for r in rows if r.size), self.embedding_size
        )
        if native.available():
            tokens, mask = native.pad_seq2d(
                rows, self.pad_len, emb, self.fill_value,
                clean=self.clean,
            )
        else:
            if self.clean:
                rows = [np.nan_to_num(r) for r in rows]
            b = len(rows)
            tokens = np.full(
                (b, self.pad_len, emb),
                self.fill_value,
                dtype=np.float32,
            )
            mask = np.ones((b, self.pad_len), dtype=bool)
            for i, r in enumerate(rows):
                t = r.shape[0]
                tokens[i, :t] = r
                mask[i, :t] = False
        out: Dict[str, np.ndarray] = {"tokens": tokens}
        if self.attn_mask:
            out["attention_mask"] = mask
        return out


class MatrixCollator:
    """Row-pad 2-D matrices (ref encoders.py:346-364)."""

    def __init__(
        self,
        pad_token: float = -10000,
        pad_len: int = 2048,
        attn_mask: bool = True,
        max_channels: int = 0,
        **kwargs: Any,
    ):
        self.pad_token = pad_token
        self.pad_len = pad_len
        self.max_channels = max_channels

    def __call__(
        self, data: Dict[str, List[Any]]
    ) -> Dict[str, np.ndarray]:
        rows = [_to_numpy(x) for x in data["values"]]
        width = next(
            (r.shape[1] for r in rows if r is not None),
            self.max_channels,
        )
        b = len(rows)
        out = np.full(
            (b, self.pad_len, width), self.pad_token, dtype=np.float32
        )
        for i, r in enumerate(rows):
            if r is None:
                continue
            t = min(r.shape[0], self.pad_len)
            out[i, :t] = r[:t]
        if self.max_channels:
            out = out[:, :, : self.max_channels]
        return {"values": out}


collators = {
    "matrix": MatrixCollator,
    "sequence": SequenceCollator,
    "embedded_sequence": EmbeddedSequenceCollator,
}


class MultimodalCollator:
    """Top-level collate_fn (ref encoders.py:374-403).

    Takes a list of per-sample dicts ``{modality: {field: array-or-None}}``
    and returns ``{modality: {field: np.ndarray[B, ...]}}`` plus,
    optionally, the stacked label column.
    """

    def __init__(
        self,
        modality_config: Dict[str, Dict[str, Any]],
        labels: Optional[str] = None,
        **kwargs: Any,
    ):
        self.modality_collators = {
            name: collators[cfg["type"]](**cfg)
            for name, cfg in modality_config.items()
        }
        self.labels = labels

    def __call__(
        self, batch: Sequence[Dict[str, Any]]
    ) -> Dict[str, Dict[str, np.ndarray]]:
        assert set(self.modality_collators) <= set(batch[0].keys()), (
            f"{set(self.modality_collators)} - {set(batch[0].keys())}"
        )
        out = {
            modality: coll(self._group_fields(modality, batch))
            for modality, coll in self.modality_collators.items()
        }
        if self.labels:
            label_fields: Dict[str, list] = defaultdict(list)
            for sample in batch:
                for field, fv in sample[self.labels].items():
                    label_fields[field].append(_to_numpy(fv))
            out[self.labels] = {
                k: np.stack(v) for k, v in label_fields.items()
            }
        return out

    def _group_fields(
        self, modality: str, batch: Sequence[Dict[str, Any]]
    ) -> Dict[str, list]:
        """Per-field lists over the batch; a sample whose modality was
        deleted (``None`` or all-None fields) contributes ``None``
        placeholders at its position."""
        coll = self.modality_collators[modality]
        primary = getattr(coll, "data_col_name", "values")
        field_names = {primary}
        for sample in batch:
            if sample[modality] is not None:
                field_names.update(sample[modality].keys())
        grouped: Dict[str, list] = {f: [] for f in field_names}
        for sample in batch:
            value = sample[modality]
            for f in field_names:
                grouped[f].append(
                    None if value is None else value.get(f)
                )
        # Keep the primary column plus any field some sample provided
        return {
            f: v
            for f, v in grouped.items()
            if f == primary or any(x is not None for x in v)
        }
