"""CMU-family (EmbeddedSequence) e2e + modality predrop + zorro/EAO
training variants on tiny synthetic data."""

import os

import numpy as np
import pytest

from mca_tpu.config import training_config_from_dict
from mca_tpu.data.synthetic import make_cmu_like, tiny_config, to_hf_dataset


def _stage_cmu(tmp_path, n=32):
    shapes = {
        "COVAREP": (6, 20),
        "FACET": (4, 12),
        "OpenFace": (8, 12),
        "glove_vectors": (5, 8),
    }
    samples = make_cmu_like(n, shapes=shapes, p_missing=0.15, seed=0)
    ds = to_hf_dataset(samples)
    ds_path = str(tmp_path / "cmu_ds")
    ds.save_to_disk(ds_path)
    return shapes, ds_path


@pytest.mark.parametrize(
    "variant",
    [
        {},  # plain MCA (CMU_config1 flags)
        {"zorro": True},  # MMA
        {
            "eao": True,
            "no_fusion": True,
            "mean_pool": True,
            "num_fusion_tokens": 0,
            "fusion_combos": [2],
            "fcl_root": [0, 1],
        },
    ],
    ids=["mca", "zorro", "eao"],
)
@pytest.mark.slow
def test_cmu_train_variant(tmp_path, variant):
    from mca_tpu.train import train

    shapes, ds_path = _stage_cmu(tmp_path)
    kwargs = dict(
        num_fusion_tokens=22,
        bimodal_contrastive=False,
        non_fusion_fcl=False,
    )
    kwargs.update(variant)
    cfg = training_config_from_dict(
        tiny_config(
            "cmu", shapes=shapes, batch_size=4, epochs=1, **kwargs
        )
    )
    cfg.dataset = ds_path
    cfg.output_dir = str(tmp_path / f"out_{id(variant)}")
    cfg.split = 0.25
    train(cfg)
    metrics_path = os.path.join(cfg.output_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    import json

    records = [json.loads(l) for l in open(metrics_path)]
    step_recs = [r for r in records if "total_loss" in r]
    assert step_recs and all(
        np.isfinite(r["total_loss"]) for r in step_recs
    )


@pytest.mark.slow
def test_cmu_predrop_trains(tmp_path):
    """dN-config path: offline whole-modality dropout via dataset.map."""
    from mca_tpu.train import train

    shapes, ds_path = _stage_cmu(tmp_path)
    cfg = training_config_from_dict(
        tiny_config("cmu", shapes=shapes, batch_size=4, epochs=1)
    )
    # mirror the dNN configs: per-modality dropout + embedding_size
    for m, (d, t) in shapes.items():
        cfg.modality_config[m]["dropout"] = 0.4
        cfg.modality_config[m]["embedding_size"] = d
    cfg.predrop = True
    cfg.dataset = ds_path
    cfg.output_dir = str(tmp_path / "out_predrop")
    cfg.split = 0.25
    train(cfg)
    import json

    records = [
        json.loads(l)
        for l in open(os.path.join(cfg.output_dir, "metrics.jsonl"))
    ]
    assert any(
        "total_loss" in r and np.isfinite(r["total_loss"])
        for r in records
    )


def test_predrop_actually_drops(tmp_path):
    from mca_tpu.data.dataset import setup_data

    shapes, ds_path = _stage_cmu(tmp_path, n=64)
    mc = {
        m: {"dropout": 0.5, "pad_token": -10000} for m in shapes
    }
    ds = setup_data(
        ds_path, split=0, predrop=True, predrop_config=mc, ds_seed=1
    )
    dropped = sum(
        1 for s in ds if s["COVAREP"]["data"] is None
    )
    assert 10 < dropped < 54  # ~50% of 64
