"""Preemption-safe training (``preempt_save``): a SIGTERM mid-run
checkpoints at the next launch boundary and exits 75; restarting from
the output dir continues the EXACT trajectory, so the union of the
preempted run's steps and the resumed run's steps reproduces an
uninterrupted run bit-for-bit (within fp tolerance).

TPU VMs get exactly this signal on spot preemption / maintenance; the
reference has no handler and loses everything since its last epoch
checkpoint (ref train_accel_gpu.py restart_cfg).
"""

import json
import os
import signal
import subprocess
import sys

import jax
import numpy as np
import pytest
import yaml

from mca_tpu.config import training_config_from_dict
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset
from mca_tpu.train import PreemptedError, train

WIDTHS = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
EPOCHS = 3  # 160 train samples / batch 8 = 20 steps/epoch -> 60 steps


def _cfg_dict(tmp_path, out_name):
    cfg = tiny_config(
        "tcga",
        widths=WIDTHS,
        batch_size=8,
        epochs=EPOCHS,
        lr=2e-3,
        num_warmup_steps=2,
        # production-shaped path: K-step scan launches + flat-vector
        # state (CPU's auto would pick K=1) — SIGTERM lands mid-launch
        # and the guard must stop at a LAUNCH boundary, not a step
        steps_per_call=4,
    )
    cfg["dataset"] = str(tmp_path / "ds")
    cfg["output_dir"] = str(tmp_path / out_name)
    cfg["split"] = 0.2
    return cfg


def _losses(output_dir):
    with open(os.path.join(output_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    return {
        r["step"]: r["total_loss"] for r in rows if "total_loss" in r
    }


@pytest.mark.slow
def test_sigterm_checkpoints_and_resume_matches_uninterrupted(tmp_path):
    samples = make_tcga_like(200, widths=WIDTHS, p_missing=0.2, seed=0)
    to_hf_dataset(samples).save_to_disk(str(tmp_path / "ds"))

    # 1) the preempted run: real CLI in a subprocess, SIGTERM delivered
    # asynchronously after >=2 logged steps (see _preempt_worker.py)
    cfg_a = _cfg_dict(tmp_path, "out_a")
    cfg_a_path = tmp_path / "cfg_a.yaml"
    # sort_keys would reorder modality_config — modality order sets the
    # packed-sequence layout, so it must match the in-process oracle
    cfg_a_path.write_text(yaml.safe_dump(cfg_a, sort_keys=False))
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "_preempt_worker.py"),
            str(cfg_a_path),
            cfg_a["output_dir"],
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 75, (proc.stdout, proc.stderr)
    marker_path = os.path.join(cfg_a["output_dir"], "preempted.json")
    assert os.path.exists(marker_path), proc.stderr
    marker = json.load(open(marker_path))
    step_s = marker["step"]
    assert 2 <= step_s < EPOCHS * 20, marker
    a_losses = _losses(cfg_a["output_dir"])
    # every step up to the saved one was logged (in-flight metrics
    # drained before the checkpoint), none after
    assert sorted(a_losses) == list(range(1, step_s + 1))

    # 2) resume from the preempted output dir: continues at step S+1
    cfg_b = training_config_from_dict(_cfg_dict(tmp_path, "out_b"))
    cfg_b.restart = cfg_a["output_dir"]
    train(cfg_b)
    b_losses = _losses(cfg_b.output_dir)
    assert sorted(b_losses) == list(range(step_s + 1, EPOCHS * 20 + 1))

    # 3) uninterrupted oracle: the stitched trajectory must match it
    cfg_c = training_config_from_dict(_cfg_dict(tmp_path, "out_c"))
    train(cfg_c)
    c_losses = _losses(cfg_c.output_dir)
    stitched = dict(a_losses)
    stitched.update(b_losses)
    assert sorted(stitched) == sorted(c_losses)
    for step in sorted(c_losses):
        np.testing.assert_allclose(
            stitched[step], c_losses[step], rtol=1e-6, err_msg=f"step {step}"
        )

    # and the final params equal the oracle's
    from mca_tpu import checkpoint as ckpt

    pb = ckpt.load_state(os.path.join(cfg_b.output_dir, str(EPOCHS - 1)))
    pc = ckpt.load_state(os.path.join(cfg_c.output_dir, str(EPOCHS - 1)))
    for x, y in zip(
        jax.tree.leaves(pb["params"]), jax.tree.leaves(pc["params"])
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-8
        )


@pytest.mark.slow
def test_preempt_guard_restores_prior_handler(tmp_path):
    """train() must hand SIGTERM back on every exit path — a leaked
    handler would flip a dead flag on the next run in this process.
    Also: clean completion clears a stale ``preempted.json`` (the
    marker means "preempted and unfinished" — leaving it would make a
    future restart of the COMPLETED dir reattach to the old wandb
    run via make_wandb_config)."""
    calls = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: calls.append(s))
    try:
        samples = make_tcga_like(40, widths=WIDTHS, p_missing=0.2, seed=0)
        to_hf_dataset(samples).save_to_disk(str(tmp_path / "ds"))
        cfg = _cfg_dict(tmp_path, "out")
        cfg["epochs"] = 1
        os.makedirs(cfg["output_dir"], exist_ok=True)
        marker = os.path.join(cfg["output_dir"], "preempted.json")
        with open(marker, "w") as f:
            json.dump({"step": 1, "wandb_id": "stale"}, f)
        train(training_config_from_dict(cfg))
        assert not os.path.exists(marker)
        handler = signal.getsignal(signal.SIGTERM)
        assert handler is not signal.SIG_DFL
        os.kill(os.getpid(), signal.SIGTERM)
        assert calls == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_preempted_error_carries_resume_path():
    err = PreemptedError(7, "/tmp/out")
    assert err.step == 7 and err.path == "/tmp/out"
    assert "restart: /tmp/out" in str(err)


def test_wandb_autoresume_from_preempted_marker(tmp_path):
    """restart: <preempted output dir> reattaches to the marker's
    recorded wandb run (resume=allow); an explicit wandb_restart
    still wins with the reference's resume=must semantics."""
    from mca_tpu.train import make_wandb_config

    def cfg(**over):
        d = tiny_config("tcga", widths=WIDTHS)
        d.update(
            {"wandb": True, "wandb_name": "proj", "output_dir": "x"},
            **over,
        )
        return training_config_from_dict(d)

    assert make_wandb_config(cfg(wandb=False)) is None
    assert "id" not in make_wandb_config(cfg())

    marked = tmp_path / "out_pre"
    marked.mkdir()
    (marked / "preempted.json").write_text(
        json.dumps({"step": 3, "wandb_id": "abc123"})
    )
    auto = make_wandb_config(cfg(restart=str(marked)))
    assert auto["id"] == "abc123" and auto["resume"] == "allow"

    explicit = make_wandb_config(
        cfg(restart=str(marked), wandb_restart="zzz")
    )
    assert explicit["id"] == "zzz" and explicit["resume"] == "must"

    # marker from a JSONL-only run records wandb_id null — no resume
    (marked / "preempted.json").write_text(
        json.dumps({"step": 3, "wandb_id": None})
    )
    assert "id" not in make_wandb_config(cfg(restart=str(marked)))

    # restart from a NON-preempted checkpoint dir: no marker, no id
    plain = tmp_path / "out_plain"
    plain.mkdir()
    assert "id" not in make_wandb_config(cfg(restart=str(plain)))
