"""Failure detection: the halt_on_nan guard stops a diverged run with
a forensic checkpoint instead of burning the rest of the schedule on
NaN parameters."""

import os

import pytest

from mca_tpu.config import training_config_from_dict
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset
from mca_tpu.train import DivergenceError, train


def _cfg(tmp_path, **overrides):
    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    samples = make_tcga_like(32, widths=widths, p_missing=0.2, seed=0)
    to_hf_dataset(samples).save_to_disk(str(tmp_path / "ds"))
    cfg = training_config_from_dict(
        tiny_config("tcga", widths=widths, batch_size=8, epochs=2,
                    num_warmup_steps=1, **overrides)
    )
    cfg.dataset = str(tmp_path / "ds")
    cfg.output_dir = str(tmp_path / "out")
    cfg.split = 0.25
    return cfg


def test_halt_on_nan_raises_and_saves_forensic_state(tmp_path):
    # misconfigured lr=inf: the warmup schedule's 0*inf produces a NaN
    # update on step 1, so the loss is non-finite from step 2 on
    # (plain huge-but-finite lrs do NOT diverge this model — LayerNorm
    # renormalises exploded activations — which is itself a reason the
    # guard keys on the loss, not on parameter norms)
    cfg = _cfg(tmp_path, lr=float("inf"), clip=0.0)
    cfg.steps_per_call = 4  # scan path (the production launch shape)
    with pytest.raises(DivergenceError):
        train(cfg)
    assert os.path.isdir(os.path.join(cfg.output_dir, "diverged"))
    # the non-finite rows reached the JSONL before the halt
    # (forensics); note the NaN-safe pair averaging reports
    # total_loss == 0.0 on fully-NaN batches, so grad_norm carries
    # the death signal
    import json

    with open(os.path.join(cfg.output_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    import numpy as np

    assert any(
        not np.isfinite(r["grad_norm"])
        for r in rows
        if "grad_norm" in r
    )


@pytest.mark.slow
def test_halt_on_nan_disabled_runs_to_completion(tmp_path):
    cfg = _cfg(tmp_path, lr=float("inf"), clip=0.0)
    cfg.halt_on_nan = False
    cfg.steps_per_call = 4
    train(cfg)  # must not raise
