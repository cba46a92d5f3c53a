"""REAL multi-process distributed validation (2 OS processes).

Spawns two worker processes that form a jax.distributed runtime over
the CPU backend (2 local devices each -> a 4-device global mesh
spanning processes), run one data-parallel step with each process
feeding only ITS rows (`mca_tpu.parallel.multihost`), and pins the
result against the single-process oracle.  This exercises the actual
cross-process path — coordination service, global mesh,
make_array_from_process_local_data, cross-host grad psum — that a TPU
pod slice uses, which no virtual single-process mesh test can.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _oracle():
    """Single-process reference for the worker's step."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    D, B, LR = 16, 8, 0.1
    w0 = jnp.asarray(rng.normal(size=(D, D)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)

    def loss_fn(w):
        return jnp.mean((jnp.tanh(x @ w) - t) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(w0)
    return np.asarray(loss), np.asarray(w0 - LR * g)


def _read_losses(output_dir):
    import json

    path = os.path.join(output_dir, "metrics.jsonl")
    with open(path) as f:
        rows = [json.loads(line) for line in f]
    return [r["total_loss"] for r in rows if "total_loss" in r]


def test_two_process_full_train_loop_matches_single_process(tmp_path):
    """The ENTIRE production train() loop — loader, staging, epochs,
    eval loop, Orbax checkpoints — under jax.distributed across two
    OS processes: rank 0's metrics.jsonl trajectory equals the
    single-process run's."""
    from mca_tpu.config import training_config_from_dict
    from mca_tpu.data.synthetic import (
        make_tcga_like,
        tiny_config,
        to_hf_dataset,
    )

    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    samples = make_tcga_like(
        48, widths=widths, p_missing=0.2, seed=0, n_classes=4
    )
    to_hf_dataset(samples).save_to_disk(str(tmp_path / "dataset"))

    # train() alone measured ~8 min under full host load; the chained
    # multi-host infer() adds restore + two split sweeps
    _spawn_workers(tmp_path, "train", timeout_s=900, expect_npz=False)
    mh_losses = _read_losses(str(tmp_path / "out_mh"))
    assert len(mh_losses) >= 6

    from mca_tpu.train import train

    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=widths,
            batch_size=8,
            epochs=2,
            lr=2e-3,
            num_warmup_steps=2,
        )
    )
    cfg.dataset = str(tmp_path / "dataset")
    cfg.output_dir = str(tmp_path / "out_sp")
    cfg.split = 0.25
    train(cfg)
    sp_losses = _read_losses(cfg.output_dir)

    assert len(mh_losses) == len(sp_losses)
    np.testing.assert_allclose(mh_losses, sp_losses, rtol=1e-5)

    # and the chained multi-host batch INFERENCE (rank 0's .pt files)
    # matches the single-process infer from the equivalent checkpoint
    from mca_tpu.config import training_config_from_dict as _tc
    from mca_tpu.data.synthetic import tiny_config as _tiny
    from mca_tpu.infer import infer

    icfg = _tc(
        _tiny("tcga", widths=widths, batch_size=8, epochs=2,
              lr=2e-3, num_warmup_steps=2)
    )
    icfg.dataset = cfg.dataset
    icfg.restart = os.path.join(cfg.output_dir, "1")
    icfg.output_dir = str(tmp_path / "out_sp_infer")
    icfg.split = 0.25
    infer(icfg)

    import torch

    for split in ("train", "eval"):
        mh = torch.load(
            str(tmp_path / "out_mh_infer" / f"{split}_embeddings.pt"),
            weights_only=False,
        )
        sp = torch.load(
            str(tmp_path / "out_sp_infer" / f"{split}_embeddings.pt"),
            weights_only=False,
        )
        assert set(mh) == set(sp)
        for k in sp:
            np.testing.assert_allclose(
                mh[k].numpy(), sp[k].numpy(), rtol=1e-4, atol=1e-6
            )


def test_init_multihost_validates_process_id():
    from mca_tpu.parallel.multihost import init_multihost

    with pytest.raises(ValueError, match="MCA_PROCESS_ID"):
        init_multihost("localhost:1", 2, -1)  # rank unset/forgotten
    with pytest.raises(ValueError, match="MCA_PROCESS_ID"):
        init_multihost("localhost:1", 2, 2)  # out of range


def test_check_mesh_alignment_rejects_clamped_mesh(monkeypatch):
    """A mesh that dropped devices (batch-driven clamping) or a data
    axis not divisible by the process count must fail fast — silent
    ownership mismatch would feed wrong rows."""
    import jax as _jax

    from mca_tpu.parallel import multihost as mh
    from mca_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    # batch 6 on 8 devices: make_mesh clamps data 8 -> 6, drops 2
    clamped = make_mesh(0, 1, batch_size=6)
    with pytest.raises(ValueError, match="misalignment"):
        mh.check_mesh_alignment(clamped, 6)
    # full mesh, aligned batch: fine
    full = make_mesh(8, 1)
    mh.check_mesh_alignment(full, 8)
    # data axis not divisible by process count
    monkeypatch.setattr(_jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="misalignment"):
        mh.check_mesh_alignment(full, 24)


def _free_port():
    """A port the OS just handed out and released — avoids reusing one
    fixed pid-derived port across the session's multihost tests (a
    lingering coordinator socket would stall the next init)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(tmp_path, mode, timeout_s=540, expect_npz=True):
    port = _free_port()
    worker = os.path.join(
        os.path.dirname(__file__), "_multihost_worker.py"
    )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port),
             str(tmp_path), mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
    if not expect_npz:
        return None
    return np.load(tmp_path / "result.npz")


def test_two_process_dp_step_matches_single_process(tmp_path):
    got = _spawn_workers(tmp_path, "toy")
    loss_ref, w1_ref = _oracle()
    np.testing.assert_allclose(got["loss"], loss_ref, rtol=1e-6)
    np.testing.assert_allclose(got["w1"], w1_ref, rtol=1e-6, atol=1e-7)


def test_two_process_mca_train_step_matches_single_process(tmp_path):
    """The REAL MCA train step (AdamW, production _step_body) across
    two OS processes == the single-process step: total loss and every
    updated parameter leaf."""
    import jax
    import jax.numpy as jnp

    from mca_tpu.config import (
        get_model_config,
        training_config_from_dict,
    )
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like, tiny_config
    from mca_tpu.models import build_model
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    got = _spawn_workers(tmp_path, "mca", timeout_s=560)

    B = 8
    cfg = training_config_from_dict(
        tiny_config(
            "tcga", batch_size=B, precision="fp32",
            attention_impl="dense",
        )
    )
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(B, widths=widths, p_missing=0.25, seed=0)
    batch = jax.tree.map(
        jnp.asarray,
        MultimodalCollator(cfg.modality_config.to_plain())(samples),
    )
    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    state = init_state(model, tx, batch, seed=0)
    state, metrics = make_train_step(model, tx, schedule)(state, batch)

    np.testing.assert_allclose(
        got["loss"], float(metrics["total_loss"]), rtol=1e-6
    )
    leaves = jax.tree.leaves(jax.device_get(state["params"]))
    assert len(leaves) == sum(1 for k in got.files if k.startswith("p"))
    for i, ref in enumerate(leaves):
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(ref), rtol=1e-5, atol=1e-7
        )
