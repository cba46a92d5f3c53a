"""End-to-end slice: synthetic TCGA -> train -> checkpoint -> infer ->
probe, on the virtual CPU mesh.  The 'one model running' milestone
(SURVEY.md §7 step 4)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mca_tpu.config import (
    get_cfg_defaults_embedding_eval,
    training_config_from_dict,
)
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    samples = make_tcga_like(
        48, widths=widths, p_missing=0.2, seed=0, n_classes=4
    )
    ds = to_hf_dataset(samples)
    ds_path = str(root / "dataset")
    ds.save_to_disk(ds_path)

    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=widths,
            batch_size=8,
            epochs=3,
            lr=2e-3,
            num_warmup_steps=2,
        )
    )
    cfg.dataset = ds_path
    cfg.output_dir = str(root / "out")
    cfg.split = 0.25
    from mca_tpu.config import dump_configs
    from mca_tpu.train import train

    dump_configs(cfg, cfg.output_dir)
    train(cfg)
    return cfg, root


def _read_metrics(output_dir):
    path = os.path.join(output_dir, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_train_loss_decreases(trained):
    cfg, _ = trained
    records = [
        r for r in _read_metrics(cfg.output_dir) if "total_loss" in r
    ]
    assert len(records) >= 6
    first = np.mean([r["total_loss"] for r in records[:2]])
    last = np.mean([r["total_loss"] for r in records[-2:]])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_eval_metrics_logged(trained):
    cfg, _ = trained
    records = _read_metrics(cfg.output_dir)
    epoch_recs = [r for r in records if "val_epoch_total_loss" in r]
    assert epoch_recs, "eval loop produced no epoch records"
    r = epoch_recs[-1]
    assert any(k.startswith("val_epoch_uniformity_") for k in r)
    assert any(k.startswith("val_epoch_norm_alignment_") for k in r)


def test_checkpoint_layout_and_restart(trained):
    cfg, _ = trained
    # per-epoch checkpoint dirs like the reference's output layout
    for epoch in range(cfg.epochs):
        assert os.path.isdir(
            os.path.join(cfg.output_dir, str(epoch), "state")
        )
    assert os.path.isdir(os.path.join(cfg.output_dir, "model"))
    assert os.path.isfile(os.path.join(cfg.output_dir, "config.yaml"))

    # restart: resume from the penultimate epoch and run one more
    import copy

    from mca_tpu.train import train

    cfg2 = copy.deepcopy(cfg)
    cfg2.restart = os.path.join(cfg.output_dir, str(cfg.epochs - 2))
    cfg2.start_epoch = cfg.epochs - 1
    cfg2.output_dir = cfg.output_dir + "_restart"
    train(cfg2)
    records = [
        r
        for r in _read_metrics(cfg2.output_dir)
        if "total_loss" in r
    ]
    assert records and all(
        np.isfinite(r["total_loss"]) for r in records
    )


@pytest.fixture(scope="module")
def inferred(trained):
    cfg, root = trained
    import copy

    from mca_tpu.infer import infer

    icfg = copy.deepcopy(cfg)
    icfg.restart = os.path.join(cfg.output_dir, str(cfg.epochs - 1))
    icfg.output_dir = str(root / "inference")
    os.makedirs(icfg.output_dir, exist_ok=True)
    infer(icfg)
    return icfg, root


def test_infer_outputs(inferred):
    icfg, _ = inferred
    import torch

    for split in ("train", "eval"):
        emb = torch.load(
            f"{icfg.output_dir}/{split}_embeddings.pt",
            map_location="cpu",
            weights_only=False,
        )
        masks = torch.load(
            f"{icfg.output_dir}/{split}_masks.pt",
            map_location="cpu",
            weights_only=False,
        )
        labels = torch.load(
            f"{icfg.output_dir}/{split}_labels.pt",
            map_location="cpu",
            weights_only=False,
        )
        # reference key scheme: str modalities + frozenset combos + fusion
        assert "fusion" in emb
        assert any(isinstance(k, frozenset) for k in emb)
        n = emb["fusion"].shape[0]
        assert labels.shape[0] == n
        for k in masks:
            assert masks[k].shape[0] == n
        # embedding keys match loss-output keys: 4 mods + 11 combos + fusion
        assert len(emb) == 4 + 11 + 1


def test_probe_end_to_end(inferred):
    icfg, root = inferred
    from mca_tpu.probe import probe

    pcfg = get_cfg_defaults_embedding_eval()
    pcfg.embedding_dir = icfg.output_dir
    pcfg.output_dir = str(root / "probe_out")
    pcfg.task = -1
    pcfg.loss_type = "BCE"
    pcfg.epochs = 60
    pcfg.lr = 1e-3
    pcfg.batch_size = 16
    pcfg.rank_metrics = True
    metrics = probe(pcfg)
    assert np.isfinite(metrics["train_loss"])
    assert 0.0 <= metrics["eval_f1"] <= 1.0
    # one-hot labels from a shared latent: element-wise binary accuracy
    # must beat the all-ones baseline (25% positives -> 0.25)
    assert metrics["train_accuracy"] > 0.5


def test_probe_ce_and_regression(inferred):
    icfg, root = inferred
    from mca_tpu.probe import probe

    pcfg = get_cfg_defaults_embedding_eval()
    pcfg.embedding_dir = icfg.output_dir
    pcfg.output_dir = str(root / "probe_ce")
    pcfg.task = -1
    pcfg.loss_type = "CE"
    pcfg.epochs = 40
    pcfg.lr = 1e-3
    pcfg.batch_size = 16
    pcfg.rank_metrics = False
    m = probe(pcfg)
    assert 0.0 <= m["eval_accuracy"] <= 1.0
    # NOTE: genuine above-chance accuracy needs more pretraining than
    # this 3-epoch tiny CI run affords; learning quality is covered by
    # the bench/parity harness, this test pins the plumbing.
    assert np.isfinite(m["train_accuracy"])

    # CE over a single 0/1 label column: integer class ids, so the
    # head must be sized from the data (2 classes), not the column
    # count (the reference sizes it 1 and torch CE crashes,
    # lp_accel_gpu.py:104-107)
    pcfg_bin = get_cfg_defaults_embedding_eval()
    pcfg_bin.embedding_dir = icfg.output_dir
    pcfg_bin.output_dir = str(root / "probe_ce_bin")
    pcfg_bin.task = 0
    pcfg_bin.loss_type = "CE"
    pcfg_bin.epochs = 20
    pcfg_bin.lr = 1e-3
    pcfg_bin.batch_size = 16
    pcfg_bin.rank_metrics = False
    mb = probe(pcfg_bin)
    assert 0.0 <= mb["eval_accuracy"] <= 1.0
    assert np.isfinite(mb["train_loss"])

    pcfg2 = get_cfg_defaults_embedding_eval()
    pcfg2.embedding_dir = icfg.output_dir
    pcfg2.output_dir = str(root / "probe_l1")
    pcfg2.task = 0  # first label column as a regression target
    pcfg2.loss_type = "L1"
    pcfg2.lr = 1e-3
    pcfg2.epochs = 20
    pcfg2.batch_size = 16
    pcfg2.rank_metrics = False
    m2 = probe(pcfg2)
    assert -1.0 <= m2["eval_PCC"] <= 1.0


def test_probe_ridge(inferred):
    icfg, root = inferred
    from mca_tpu.probe import probe

    pcfg = get_cfg_defaults_embedding_eval()
    pcfg.embedding_dir = icfg.output_dir
    pcfg.output_dir = str(root / "probe_ridge")
    pcfg.task = -1
    pcfg.loss_type = "CE"
    pcfg.model_type = "ridge"
    pcfg.rank_metrics = False
    m = probe(pcfg)
    assert 0.0 <= m["eval_accuracy"] <= 1.0
    assert np.isfinite(m["train_loss"])


def test_probe_scan_epochs_matches_host_loop(inferred):
    """scan_epochs=True (the relay-scale chunked-lax.scan probe loop)
    must reproduce the host loop: on a FULL-BATCH probe (batch_size >=
    n_train) the shuffle order cannot matter, so the two paths differ
    only by fp reduction order — metrics must agree tightly.  A
    mini-batch CE run additionally pins the masked remainder-batch
    handling (not order-independent, so only sanity-bounded)."""
    icfg, root = inferred
    from mca_tpu.probe import probe

    def cfg(out, **kw):
        p = get_cfg_defaults_embedding_eval()
        p.embedding_dir = icfg.output_dir
        p.output_dir = str(root / out)
        p.task = -1
        p.loss_type = "BCE"
        p.epochs = 30
        p.lr = 1e-3
        p.batch_size = 4096  # full batch: order-independent
        p.rank_metrics = False
        for k, v in kw.items():
            setattr(p, k, v)
        return p

    host = probe(cfg("probe_host"))
    scan = probe(cfg("probe_scan", scan_epochs=True,
                     scan_epochs_chunk=8))
    for key in ("train_loss", "eval_loss", "eval_f1", "eval_auroc",
                "param_norm"):
        np.testing.assert_allclose(
            scan[key], host[key], rtol=2e-4, atol=1e-6,
        ), key

    # mini-batch + remainder (n_train % 16 != 0 in this fixture) + CE
    mb = probe(cfg("probe_scan_mb", scan_epochs=True, loss_type="CE",
                   batch_size=16, epochs=20))
    assert np.isfinite(mb["train_loss"])
    assert 0.0 <= mb["eval_accuracy"] <= 1.0
