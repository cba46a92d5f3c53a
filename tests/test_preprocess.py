"""Preprocessing-pipeline unit tests on synthetic frames/files."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from mca_tpu.data.dataset import BatchDropout
from mca_tpu.data import preprocess_tcga as T


def test_normalize_sample_id():
    assert (
        T.normalize_sample_id("TCGA-02-0001-01C-01D-0186-05")
        == "02_0001_01C"
    )


def test_top_variance_rows():
    df = pd.DataFrame(
        {
            "s1": [1.0, 1.0, 0.0, 5.0],
            "s2": [1.0, 2.0, 0.0, -5.0],
            "s3": [1.0, 3.0, 0.0, 5.0],
        },
        index=["flat", "mid", "zeros", "wild"],
    )
    top = T.top_variance_rows(df, 2)
    assert list(top.index) == ["mid", "wild"]
    # gene mode: zeros become NaN and the row drops
    top = T.top_variance_rows(df, 3, drop_zeros=True)
    assert "zeros" not in top.index


def test_intersect_and_zscore():
    a = pd.DataFrame(
        {"f1": [1.0, 2.0, 3.0]}, index=["s1", "s2", "s3"]
    )
    b = pd.DataFrame({"g1": [5.0, 7.0]}, index=["s2", "s3"])
    a.index.name = b.index.name = "index"
    tables = T.intersect_samples({"a": a, "b": b})
    assert list(tables["a"].index) == ["s2", "s3"]
    z = T.zscore(tables["a"])
    np.testing.assert_allclose(z["f1"].mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(z["f1"].std(), 1.0)


def test_one_hot_labels():
    cdr = pd.DataFrame(
        {"type": ["BRCA", "LUAD", "BRCA"]},
        index=["02_0001", "02_0002", "02_0003"],
    )
    labels, order = T.one_hot_labels(
        ["02_0001_01C", "02_0002_01A", "99_9999_01A"], cdr
    )
    assert order == ["BRCA", "LUAD"]
    np.testing.assert_array_equal(
        labels, [[1, 0], [0, 1], [0, 0]]
    )


def test_build_rows_schema():
    t = {
        "gene": pd.DataFrame(
            {"a": [1.0], "b": [2.0]}, index=["s1"]
        ),
        "protein": pd.DataFrame({"c": [3.0]}, index=["s1"]),
    }
    rows = T.build_rows(t, np.array([[1.0, 0.0]], np.float32))
    assert rows[0]["tcga_index"] == "s1"
    assert rows[0]["gene"]["values"] == [1.0, 2.0]
    assert rows[0]["Labels"]["data"] == [1.0, 0.0]


def test_cmu_iter_segments(tmp_path):
    h5py = pytest.importorskip("h5py")
    from mca_tpu.data.preprocess_cmu import iter_segments

    rng = np.random.default_rng(0)
    files = {"Labels": "labels.csd", "COVAREP": "cov.csd"}
    dims = {"Labels": 7, "COVAREP": 5}
    for name, fname in files.items():
        with h5py.File(tmp_path / fname, "w") as f:
            grp = f.create_group(name).create_group("data")
            for key in ["seg_a", "seg_b"]:
                g = grp.create_group(key)
                g.create_dataset(
                    "features",
                    data=rng.normal(size=(4, dims[name])).astype(
                        np.float32
                    ),
                )
    segs = list(iter_segments(str(tmp_path), files))
    assert len(segs) == 2
    assert np.asarray(segs[0]["COVAREP"]["data"]).shape == (4, 5)
    assert np.asarray(segs[0]["Labels"]["data"]).shape == (4, 7)


def test_batch_dropout_inbatch():
    bd = BatchDropout(
        kvs={"attention_mask": 1, "tokens": 0.0},
        dropout=0.5,
        random_seed=0,
    )
    batch = {
        "attention_mask": np.zeros((8, 4), np.int64),
        "tokens": np.ones((8, 4), np.float32),
    }
    out = bd(batch)
    dropped = (out["attention_mask"] == 1).all(axis=1)
    assert dropped.sum() == 4
    assert (out["tokens"][dropped] == 0).all()
    assert (out["tokens"][~dropped] == 1).all()
