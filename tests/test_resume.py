"""Mid-epoch resume: restarting from an n_step_checkpoint
fast-forwards the deterministic loader past the already-trained
batches instead of replaying them — the trajectory continues exactly
where the crashed run stopped (the reference can only restart at
epoch boundaries)."""

import json
import os

import jax
import numpy as np
import pytest

from mca_tpu.config import training_config_from_dict
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset
from mca_tpu.train import train


def _base_cfg(tmp_path, out_name):
    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    cfg = training_config_from_dict(
        tiny_config(
            "tcga", widths=widths, batch_size=8, epochs=1,
            lr=2e-3, num_warmup_steps=2,
        )
    )
    cfg.dataset = str(tmp_path / "ds")
    cfg.output_dir = str(tmp_path / out_name)
    cfg.split = 0.2  # 40 samples -> 32 train -> 4 steps/epoch
    return cfg, widths


def _losses(output_dir):
    with open(os.path.join(output_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    return [
        (r["step"], r["total_loss"]) for r in rows if "total_loss" in r
    ]


@pytest.mark.slow
def test_mid_epoch_resume_continues_not_replays(tmp_path):
    cfg_a, widths = _base_cfg(tmp_path, "out_a")
    samples = make_tcga_like(
        40, widths=widths, p_missing=0.2, seed=0
    )
    to_hf_dataset(samples).save_to_disk(cfg_a.dataset)
    cfg_a.n_step_checkpoint = 3  # root state dir captured at step 3/4
    train(cfg_a)
    a_losses = _losses(cfg_a.output_dir)
    assert [s for s, _ in a_losses] == [1, 2, 3, 4]

    # "crash" after step 3: restart from the root n_step checkpoint
    cfg_b, _ = _base_cfg(tmp_path, "out_b")
    cfg_b.restart = cfg_a.output_dir
    train(cfg_b)
    b_losses = _losses(cfg_b.output_dir)

    # exactly ONE training step ran (step 4), with A's step-4 loss —
    # no replay of steps 1-3
    assert [s for s, _ in b_losses] == [4]
    np.testing.assert_allclose(
        b_losses[0][1], a_losses[3][1], rtol=1e-6
    )

    # and the resumed run's final params equal the uninterrupted
    # run's epoch-end checkpoint
    from mca_tpu import checkpoint as ckpt

    pa = ckpt.load_state(os.path.join(cfg_a.output_dir, "0"))
    pb = ckpt.load_state(os.path.join(cfg_b.output_dir, "0"))
    for x, y in zip(
        jax.tree.leaves(pa["params"]), jax.tree.leaves(pb["params"])
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-8
        )


@pytest.mark.slow
def test_resume_derives_start_epoch_from_restored_step(tmp_path):
    """A crash inside epoch 1 restarted with the DEFAULT start_epoch 0
    must not re-train epoch 0 on the restored state: the epoch is
    derived from the restored step and the loader fast-forwards."""
    cfg_a, widths = _base_cfg(tmp_path, "out_a")
    cfg_a.epochs = 2
    samples = make_tcga_like(
        40, widths=widths, p_missing=0.2, seed=0
    )
    to_hf_dataset(samples).save_to_disk(cfg_a.dataset)
    cfg_a.n_step_checkpoint = 3  # root state at step 7 (epoch 1 + 3)
    train(cfg_a)
    a_losses = _losses(cfg_a.output_dir)
    assert [s for s, _ in a_losses] == list(range(1, 9))

    cfg_b, _ = _base_cfg(tmp_path, "out_b")
    cfg_b.epochs = 2
    cfg_b.restart = cfg_a.output_dir  # start_epoch stays default 0
    train(cfg_b)
    b_losses = _losses(cfg_b.output_dir)

    assert [s for s, _ in b_losses] == [8]  # only step 8 ran
    np.testing.assert_allclose(
        b_losses[0][1], a_losses[7][1], rtol=1e-6
    )


@pytest.mark.slow
def test_unpadded_flat_opt_state_restores_into_fsdp(tmp_path):
    """An unpadded flat-state checkpoint (pad_to_multiple=1 — what
    ``tools/import_checkpoint.py --with-optimizer`` writes, or any
    non-FSDP flat run) must restore its optimizer MOMENTS into an
    FSDP run whose flat vector is padded to mesh.shape['data'];
    restore_state zero-pads the 1-D moment tails instead of falling
    back to params-only (fresh zero moments + reset step count)."""
    cfg_a, widths = _base_cfg(tmp_path, "out_a")
    cfg_a.steps_per_call = 2  # flat (single-vector) state mode
    cfg_a.epochs = 2
    samples = make_tcga_like(40, widths=widths, p_missing=0.2, seed=0)
    to_hf_dataset(samples).save_to_disk(cfg_a.dataset)
    train(cfg_a)
    a_losses = _losses(cfg_a.output_dir)
    assert [s for s, _ in a_losses] == list(range(1, 9))

    # the pad must actually be exercised: the raveled param vector of
    # the tiny model must not already divide the 8-device data axis
    from jax.flatten_util import ravel_pytree

    from mca_tpu import checkpoint as ckpt

    epoch0 = os.path.join(cfg_a.output_dir, "0")
    saved = ckpt.load_state(epoch0)
    n = int(ravel_pytree(saved["params"])[0].size)
    assert n % 8 != 0, "widths accidentally divisible; adjust test"

    # resume epoch 1 under FSDP on the 8-device CPU mesh
    cfg_b, _ = _base_cfg(tmp_path, "out_b")
    cfg_b.steps_per_call = 2
    cfg_b.epochs = 2
    cfg_b.fsdp = True
    cfg_b.restart = epoch0
    train(cfg_b)
    b_losses = _losses(cfg_b.output_dir)
    assert [s for s, _ in b_losses] == [5, 6, 7, 8]

    # moments + step count survived: the FSDP continuation reproduces
    # the uninterrupted run's trajectory and final parameters (FSDP
    # changes only sharding; reduce order gives tiny fp32 wiggle)
    np.testing.assert_allclose(
        [l for _, l in b_losses],
        [l for s, l in a_losses if s >= 5],
        rtol=1e-4,
    )
    pa = ckpt.load_state(os.path.join(cfg_a.output_dir, "1"))
    pb = ckpt.load_state(os.path.join(cfg_b.output_dir, "1"))
    for x, y in zip(
        jax.tree.leaves(pa["params"]), jax.tree.leaves(pb["params"])
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=2e-4, atol=1e-6
        )
