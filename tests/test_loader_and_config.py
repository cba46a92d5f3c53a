"""Loader determinism, restart_cfg, checkpoint pruning."""

import os

import numpy as np

from mca_tpu.config import (
    dump_configs,
    restart_cfg,
    training_config_from_dict,
)
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.dataset import BatchedLoader
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset


def _loader(tmp_path, shuffle, seed=5, preload=True):
    widths = {"a": 4, "b": 3}
    ds = to_hf_dataset(
        make_tcga_like(16, widths=widths, seed=0)
    )
    cfg = tiny_config("tcga", widths=widths)
    coll = MultimodalCollator(cfg["modality_config"])
    return BatchedLoader(
        ds, coll, 4, shuffle=shuffle, seed=seed, preload=preload
    )


def test_loader_shuffle_deterministic(tmp_path):
    dl1 = _loader(tmp_path, shuffle=True)
    dl2 = _loader(tmp_path, shuffle=True)
    dl1.set_epoch(3)
    dl2.set_epoch(3)
    for b1, b2 in zip(dl1, dl2):
        np.testing.assert_array_equal(
            b1["a"]["values"], b2["a"]["values"]
        )


def test_loader_epoch_changes_order(tmp_path):
    dl = _loader(tmp_path, shuffle=True)
    dl.set_epoch(0)
    first = [b["a"]["values"].copy() for b in dl]
    dl.set_epoch(1)
    second = [b["a"]["values"].copy() for b in dl]
    assert any(
        not np.array_equal(x, y) for x, y in zip(first, second)
    )


def test_loader_preload_matches_live(tmp_path):
    a = _loader(tmp_path, shuffle=False, preload=True)
    b = _loader(tmp_path, shuffle=False, preload=False)
    for b1, b2 in zip(a, b):
        np.testing.assert_array_equal(
            b1["a"]["values"], b2["a"]["values"]
        )


def test_restart_cfg(tmp_path):
    cfg = training_config_from_dict(tiny_config("tcga", epochs=7))
    ckpt_dir = str(tmp_path / "ckpt")
    dump_configs(cfg, ckpt_dir)
    cfg2 = training_config_from_dict({"restart": ckpt_dir})
    os.chdir(tmp_path)  # auto output dir lands in tmp
    cfg2 = restart_cfg(cfg2)
    assert cfg2.epochs == 1  # forced single epoch (ref utils/config.py:70)
    assert cfg2.batch_size == cfg.batch_size  # merged from checkpoint


def test_prune_checkpoints(tmp_path):
    from mca_tpu.train import _prune_checkpoints

    for e in range(5):
        os.makedirs(tmp_path / str(e))
    _prune_checkpoints(str(tmp_path), epoch=4, keep=2)
    remaining = sorted(
        d for d in os.listdir(tmp_path) if d.isdigit()
    )
    assert remaining == ["3", "4"]
