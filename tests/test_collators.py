"""Collator unit tests + oracle parity against the reference collators."""

import numpy as np
import pytest

from mca_tpu.data.collators import (
    EmbeddedSequenceCollator,
    MatrixCollator,
    MultimodalCollator,
    SequenceCollator,
)
from mca_tpu.data.dataset import BatchPreDropout
from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like, tiny_config


def test_sequence_collator_pad_and_mask():
    c = SequenceCollator(
        pad_token=-10000, pad_len=6, data_col_name="values"
    )
    out = c(
        {
            "values": [
                np.array([1.0, 2.0, 3.0]),
                None,
                np.array([5.0] * 6),
            ]
        }
    )
    assert out["values"].shape == (3, 6)
    np.testing.assert_array_equal(
        out["values"][0], [1, 2, 3, -10000, -10000, -10000]
    )
    np.testing.assert_array_equal(
        out["attention_mask"][0], [0, 0, 0, 1, 1, 1]
    )
    # None modality -> fully padded -> fully masked
    assert out["attention_mask"][1].all()
    assert not out["attention_mask"][2].any()


def test_sequence_collator_other_col():
    c = SequenceCollator(pad_token=0, pad_len=4, data_col_name="indices")
    out = c(
        {
            "indices": [np.array([3, 1])],
            "data": [np.array([0.5, 0.7])],
        }
    )
    np.testing.assert_array_equal(out["indices"][0], [3, 1, 0, 0])
    np.testing.assert_allclose(
        out["data"][0], np.array([0.5, 0.7, 0.0, 0.0], np.float32)
    )


def test_embedded_sequence_collator():
    c = EmbeddedSequenceCollator(
        pad_len=4, embedding_size=3, data_col_name="data"
    )
    out = c(
        {
            "data": [
                np.arange(6, dtype=np.float32).reshape(2, 3),
                None,
                np.full((9, 3), np.nan, dtype=np.float32),
            ]
        }
    )
    assert out["tokens"].shape == (3, 4, 3)
    np.testing.assert_array_equal(
        out["attention_mask"][0], [False, False, True, True]
    )
    assert out["attention_mask"][1].all()  # None -> fully masked
    # truncation to pad_len + nan cleaning
    assert out["tokens"][2].shape == (4, 3)
    assert np.isfinite(out["tokens"]).all()


def test_matrix_collator():
    c = MatrixCollator(pad_token=-10000, pad_len=4)
    out = c(
        {
            "values": [
                np.ones((2, 5), dtype=np.float32),
                None,
            ]
        }
    )
    assert out["values"].shape == (2, 4, 5)
    assert (out["values"][0, 2:] == -10000).all()
    assert (out["values"][1] == -10000).all()


def test_multimodal_collator_tcga_shapes():
    cfg = tiny_config("tcga")
    samples = make_tcga_like(
        4,
        widths={m: c["pad_len"] for m, c in cfg["modality_config"].items()},
        p_missing=0.3,
        seed=1,
    )
    mc = MultimodalCollator(cfg["modality_config"], labels="Labels")
    batch = mc(samples)
    for m, c in cfg["modality_config"].items():
        assert batch[m]["values"].shape == (4, c["pad_len"])
        assert batch[m]["attention_mask"].shape == (4, c["pad_len"])
    assert batch["Labels"]["values"].shape == (4, 5)


def test_multimodal_collator_none_modality():
    cfg = tiny_config("cmu")
    mc = MultimodalCollator(cfg["modality_config"])
    samples = make_cmu_like(
        3,
        shapes={
            m: (e["input_size"], e["max_tokens"])
            for m, e in cfg["encoder_configs"].items()
        },
        p_missing=0.5,
        seed=3,
    )
    batch = mc(samples)
    for m, e in cfg["encoder_configs"].items():
        assert batch[m]["tokens"].shape == (
            3,
            e["max_tokens"],
            e["input_size"],
        )
        # every fully-masked row is all fill_value
        fully = batch[m]["attention_mask"].all(axis=1)
        for i in np.nonzero(fully)[0]:
            assert (batch[m]["tokens"][i] == 0.0).all()


def test_batch_predropout_deterministic():
    d1 = BatchPreDropout(dropout=0.5, random_seed=7)
    d2 = BatchPreDropout(dropout=0.5, random_seed=7)
    vals = [{"data": np.ones(3)} for _ in range(32)]
    out1 = [d1(dict(v)) for v in vals]
    out2 = [d2(dict(v)) for v in vals]
    dropped1 = [o["data"] is None for o in out1]
    dropped2 = [o["data"] is None for o in out2]
    assert dropped1 == dropped2
    assert 0 < sum(dropped1) < 32


def test_sequence_collator_matches_reference(reference_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, reference_path)
    try:
        import importlib

        ref_enc = importlib.import_module("encoders")
    finally:
        sys.path.remove(reference_path)

    rng = np.random.default_rng(0)
    rows = [
        rng.normal(size=(5,)).astype(np.float32),
        rng.normal(size=(8,)).astype(np.float32),
        None,
    ]
    ref_c = ref_enc.SequenceCollator(
        pad_token=-10000, pad_len=8, data_col_name="values"
    )
    ref_out = ref_c(
        {
            "values": [
                torch.from_numpy(r) if r is not None else None
                for r in rows
            ]
        }
    )
    ours = SequenceCollator(
        pad_token=-10000, pad_len=8, data_col_name="values"
    )({"values": rows})
    np.testing.assert_allclose(
        ours["values"], ref_out["values"].numpy()
    )
    np.testing.assert_array_equal(
        ours["attention_mask"], ref_out["attention_mask"].numpy()
    )


def test_embedded_collator_matches_reference(reference_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, reference_path)
    try:
        import importlib

        ref_enc = importlib.import_module("encoders")
    finally:
        sys.path.remove(reference_path)

    rng = np.random.default_rng(1)
    rows = [
        rng.normal(size=(3, 4)).astype(np.float32),
        rng.normal(size=(9, 4)).astype(np.float32),  # truncation case
        None,
    ]
    kw = dict(pad_len=6, embedding_size=4, data_col_name="data")
    ref_c = ref_enc.EmbeddedSequenceCollator(**kw)
    ref_out = ref_c(
        {
            "data": [
                torch.from_numpy(r) if r is not None else None
                for r in rows
            ]
        }
    )
    ours = EmbeddedSequenceCollator(**kw)({"data": rows})
    np.testing.assert_allclose(
        ours["tokens"], ref_out["tokens"].numpy()
    )
    np.testing.assert_array_equal(
        ours["attention_mask"], ref_out["attention_mask"].numpy()
    )


def test_clustered_synthetic_labels():
    from mca_tpu.data.synthetic import make_tcga_like

    samples = make_tcga_like(
        64, widths={"a": 6, "b": 4}, n_classes=3, clustered=True, seed=0
    )
    labels = np.stack([s["Labels"]["values"] for s in samples])
    assert labels.sum() == 64  # one-hot
    assert (labels.sum(axis=0) > 5).all()  # every class present
