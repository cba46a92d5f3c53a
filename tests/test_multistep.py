"""Multi-step-per-launch training (lax.scan) must match the semantics
of the single-step loop: same step count, finite decreasing loss,
chunk + remainder handling."""

import json
import os

import numpy as np
import pytest

from mca_tpu.config import dump_configs, training_config_from_dict
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset


def _run(tmp_path, steps_per_call, tag):
    from mca_tpu.train import train

    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    ds = to_hf_dataset(
        make_tcga_like(48, widths=widths, p_missing=0.2, seed=0)
    )
    ds_path = str(tmp_path / f"ds_{tag}")
    ds.save_to_disk(ds_path)
    cfg = training_config_from_dict(
        tiny_config(
            "tcga", widths=widths, batch_size=8, epochs=2, lr=2e-3
        )
    )
    cfg.dataset = ds_path
    cfg.output_dir = str(tmp_path / f"out_{tag}")
    cfg.split = 0.25
    cfg.steps_per_call = steps_per_call
    dump_configs(cfg, cfg.output_dir)
    train(cfg)
    recs = [
        json.loads(l)
        for l in open(os.path.join(cfg.output_dir, "metrics.jsonl"))
    ]
    return [r for r in recs if "total_loss" in r]


@pytest.mark.slow
def test_scan_chunks_and_remainder(tmp_path):
    # 4 steps/epoch with chunks of 3 -> one scan(3) + one single step
    steps = _run(tmp_path, steps_per_call=3, tag="scan")
    assert sorted(set(r["step"] for r in steps)) == list(
        range(1, 9)
    )
    assert all(np.isfinite(r["total_loss"]) for r in steps)
    assert steps[-1]["total_loss"] < steps[0]["total_loss"]


@pytest.mark.slow
def test_scan_matches_single_step(tmp_path):
    """Same data, same seeds: scan and single-step losses coincide."""
    single = _run(tmp_path, steps_per_call=1, tag="single")
    scan = _run(tmp_path, steps_per_call=2, tag="scan2")
    for a, b in zip(single, scan):
        assert a["step"] == b["step"]
        np.testing.assert_allclose(
            a["total_loss"], b["total_loss"], rtol=2e-4
        )
