"""Native collation kernels vs the numpy fallback (exact parity)."""

import numpy as np
import pytest

from mca_tpu import native
from mca_tpu.data.collators import (
    EmbeddedSequenceCollator,
    SequenceCollator,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_pad_rows_matches_numpy(rng):
    rows = [
        rng.normal(size=(5,)).astype(np.float32),
        None,
        rng.normal(size=(12,)).astype(np.float32),  # truncation
        np.zeros((0,), np.float32),
    ]
    out, mask = native.pad_rows(rows, 8, -10000.0)
    expected = np.full((4, 8), -10000.0, np.float32)
    expected[0, :5] = rows[0]
    expected[2] = rows[2][:8]
    np.testing.assert_array_equal(out, expected)
    np.testing.assert_array_equal(mask, expected == -10000.0)


def test_pad_seq2d_matches_numpy(rng):
    rows = [
        rng.normal(size=(3, 4)).astype(np.float32),
        None,
        np.full((2, 4), np.nan, np.float32),
        rng.normal(size=(9, 4)).astype(np.float32),
    ]
    rows2 = [
        r if r is not None else np.zeros((0, 4), np.float32)
        for r in rows
    ]
    out, mask = native.pad_seq2d(
        [r[:6] if r is not None else None for r in rows], 6, 4, 0.0
    )
    assert out.shape == (4, 6, 4)
    np.testing.assert_array_equal(
        mask,
        [
            [0, 0, 0, 1, 1, 1],
            [1, 1, 1, 1, 1, 1],
            [0, 0, 1, 1, 1, 1],
            [0, 0, 0, 0, 0, 0],
        ],
    )
    assert (out[2, :2] == 0).all()  # NaN cleaned
    np.testing.assert_array_equal(out[3], rows[3][:6])


def test_collators_native_equals_fallback(rng, monkeypatch):
    rows = [
        rng.normal(size=(5,)).astype(np.float32),
        None,
        rng.normal(size=(3,)).astype(np.float32),
    ]
    c = SequenceCollator(
        pad_token=-10000, pad_len=6, data_col_name="values"
    )
    with_native = c({"values": list(rows)})
    monkeypatch.setattr(native, "available", lambda: False)
    without = c({"values": list(rows)})
    np.testing.assert_array_equal(
        with_native["values"], without["values"]
    )
    np.testing.assert_array_equal(
        with_native["attention_mask"], without["attention_mask"]
    )


def test_embedded_collator_native_equals_fallback(rng, monkeypatch):
    rows = [
        rng.normal(size=(3, 5)).astype(np.float32),
        None,
        rng.normal(size=(9, 5)).astype(np.float32),
    ]
    rows[0][1, 2] = np.nan
    c = EmbeddedSequenceCollator(
        pad_len=6, embedding_size=5, data_col_name="data"
    )
    with_native = c({"data": [None if r is None else r.copy() for r in rows]})
    monkeypatch.setattr(native, "available", lambda: False)
    without = c({"data": [None if r is None else r.copy() for r in rows]})
    np.testing.assert_array_equal(
        with_native["tokens"], without["tokens"]
    )
    np.testing.assert_array_equal(
        with_native["attention_mask"], without["attention_mask"]
    )
