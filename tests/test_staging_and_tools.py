"""Round-3 feature pins: staging-dtype narrowing, attention maps,
wandb-resume config plumbing, and the one-command reproduce pipeline.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model


def _tiny(batch_size=4, **over):
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=batch_size, **over)
    )
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        batch_size, widths=widths, p_missing=0.25, seed=0
    )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    return cfg, model, batch


def test_narrow_for_staging_roundtrip():
    """fp32 features narrow to fp16 (int64 -> int32) and the on-device
    upcast restores fp32; the pad marker -10000 survives exactly (the
    ContinuousValueEncoder zeroes positions equal to it on device)."""
    from mca_tpu.train import _upcast_staged, narrow_for_staging

    cfg, model, batch = _tiny()
    narrowed = narrow_for_staging(batch, "fp16")
    leaves = jax.tree.leaves(narrowed)
    assert any(x.dtype == np.float16 for x in leaves)
    assert not any(x.dtype == np.int64 for x in leaves)
    vals = narrowed[list(cfg.modality_config.keys())[0]]["values"]
    assert (vals.astype(np.float32) == -10000.0).any()

    restored = _upcast_staged(jax.tree.map(jnp.asarray, narrowed))
    assert all(
        x.dtype != jnp.float16 for x in jax.tree.leaves(restored)
    )
    # fp32 passthrough is identity
    same = narrow_for_staging(batch, "fp32")
    for a, b in zip(jax.tree.leaves(same), jax.tree.leaves(batch)):
        assert a is b


def test_narrow_bf16_preserves_pad_sentinel():
    """bf16 cannot represent -10000 (it rounds to -9984), which would
    silently defeat the on-device pad-equality tests (PatchEncoder,
    ref encoders.py:273; ContinuousValueEncoder padding_value zeroing).
    The decision is STATIC per modality (never data-dependent — a
    data-dependent dtype would recompile the jitted K-step scan when
    sentinel presence flips between chunks): every float array of a
    modality whose pad value bf16 cannot represent stays fp32, with
    or without sentinels present; a modality whose configured pad
    bf16 CAN represent narrows."""
    from mca_tpu.train import narrow_for_staging

    with_pad = {
        "m": {"values": np.array([[1.5, -10000.0]], np.float32)}
    }
    clean = {"m": {"values": np.array([[1.5, 2.5]], np.float32)}}
    kept = jax.tree.leaves(narrow_for_staging(with_pad, "bf16"))[0]
    assert kept.dtype == np.float32
    assert (kept == -10000.0).any()
    # STATIC per modality: the sentinel-free batch keeps the same
    # dtype as the sentinel-carrying one (stable jit signature)
    clean_kept = jax.tree.leaves(narrow_for_staging(clean, "bf16"))[0]
    assert clean_kept.dtype == np.float32
    # a bf16-representable pad token narrows (and survives exactly)
    rep = {"m": {"values": np.array([[1.5, -8192.0]], np.float32)}}
    narrowed = jax.tree.leaves(
        narrow_for_staging(rep, "bf16", {"m": -8192.0})
    )[0]
    assert narrowed.dtype == jnp.bfloat16
    assert (narrowed.astype(np.float32) == -8192.0).any()
    # a sentinel-free modality (on-device path never does float
    # equality, e.g. CMU's EmbeddedSequenceEncoder) narrows freely
    free = jax.tree.leaves(
        narrow_for_staging(with_pad, "bf16", {"m": None})
    )[0]
    assert free.dtype == jnp.bfloat16
    # fp16 represents -10000 exactly -> narrowing stays safe
    f16 = jax.tree.leaves(narrow_for_staging(with_pad, "fp16"))[0]
    assert f16.dtype == np.float16
    assert (f16.astype(np.float32) == -10000.0).any()


def test_staging_sentinels_per_encoder():
    """The sentinel map follows the on-device detection semantics:
    TabularEncoder modalities detect padding_value=float(padding_idx),
    embedded_sequence modalities detect nothing (explicit
    attention_mask), matrix modalities detect the PatchEncoder
    pad_token."""
    from mca_tpu.train import staging_sentinels

    cfg = training_config_from_dict(tiny_config("tcga"))
    s = staging_sentinels(cfg)
    # tiny TCGA uses TabularEncoder (padding_idx default -1)
    assert all(v == -1.0 for v in s.values()), s

    cmu = training_config_from_dict(
        dict(
            tiny_config("tcga"),
            encoder_configs={
                "a": {
                    "type": "EmbeddedSequenceEncoder",
                    "input_size": 4,
                    "max_tokens": 6,
                }
            },
            modality_config={
                "a": {
                    "type": "embedded_sequence",
                    "pad_len": 6,
                    "data_col_name": "data",
                    "pad_token": -10000,
                    "embedding_size": 4,
                }
            },
        )
    )
    assert staging_sentinels(cmu) == {"a": None}


def test_narrow_fp16_nudges_collided_live_values():
    """fp16 rounds every value in (-10004, -9996) onto the -10000
    sentinel; a live feature in that window must NOT become padding on
    device — it gets nudged one representable step away instead."""
    from mca_tpu.train import narrow_for_staging

    batch = {
        "m": {
            "values": np.array(
                [[-9998.0, -10000.0, 3.25]], np.float32
            )
        }
    }
    f16 = jax.tree.leaves(narrow_for_staging(batch, "fp16"))[0]
    assert f16.dtype == np.float16
    up = f16.astype(np.float32)
    assert up[0, 1] == -10000.0  # real pad survives exactly
    assert up[0, 0] != -10000.0  # live value did not become padding
    assert abs(up[0, 0] + 9998.0) < 20  # ...and stayed close
    assert up[0, 2] == 3.25


def test_fp16_staged_loss_close_to_fp32():
    """Input quantisation to fp16 moves the loss only marginally."""
    from mca_tpu.train import _upcast_staged, narrow_for_staging

    cfg, model, batch = _tiny(batch_size=8)
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)
    full = float(model.apply(params, batch_j)["loss"])
    staged = jax.tree.map(
        jnp.asarray, narrow_for_staging(batch, "fp16")
    )
    halfed = float(
        model.apply(params, _upcast_staged(staged))["loss"]
    )
    np.testing.assert_allclose(halfed, full, rtol=1e-3)


def test_attention_maps_method():
    """attention_maps returns per-layer probabilities that honour the
    static mask (blocked pairs get ~zero probability)."""
    cfg, model, batch = _tiny()
    batch_j = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch_j)
    maps = jax.device_get(
        model.apply(params, batch_j, method="attention_maps")
    )
    from mca_tpu import masks as masks_lib

    enc = cfg.encoder_configs.to_plain()
    ms = masks_lib.build_masks(
        [int(enc[m]["max_tokens"]) for m in enc],
        int(cfg.num_fusion_tokens),
        list(cfg.fusion_combos),
        zorro=bool(cfg.zorro),
        fcl=bool(cfg.fcl),
        no_fusion=bool(cfg.no_fusion),
    )
    T = ms.seq_len
    assert maps["layers"].shape == (
        cfg.layers,
        cfg.batch_size,
        cfg.heads,
        T,
        T,
    )
    # blocked [q, k] pairs get ~zero probability on LIVE query rows
    # (fully-masked rows — padded positions — softmax to uniform on
    # the dense path; their outputs are never consumed)
    blocked = np.asarray(ms.attn_mask, bool)
    layers = np.asarray(maps["layers"])  # [L, B, H, T, T]
    pad = np.stack(
        [
            np.concatenate(
                [
                    np.asarray(batch[m]["attention_mask"][b], bool)
                    for m in cfg.modality_config
                ]
                + [np.zeros(cfg.num_fusion_tokens, bool)]
            )
            for b in range(cfg.batch_size)
        ]
    )  # [B, T]
    fully = blocked[None] | pad[:, None, :]  # [B, T, T]
    live_rows = ~fully.all(-1)  # [B, T]
    for b in range(cfg.batch_size):
        rows = layers[:, b][:, :, live_rows[b]]  # [L, H, R, T]
        assert rows[..., blocked[live_rows[b]]].max() < 1e-6
    # softmax rows always sum to 1
    np.testing.assert_allclose(layers.sum(-1), 1.0, atol=1e-4)
    assert "pool" in maps


def test_wandb_restart_config_plumbs_resume():
    """wandb_restart -> wandb.init(id=..., resume='must') (ref
    train_accel_gpu.py:60-62) — pinned against the REAL assembly
    function train() calls (mca_tpu.train.make_wandb_config)."""
    from mca_tpu.train import make_wandb_config

    cfg = training_config_from_dict(
        tiny_config("tcga", wandb=True, wandb_restart="run123")
    )
    wandb_cfg = make_wandb_config(cfg)
    assert wandb_cfg["id"] == "run123"
    assert wandb_cfg["resume"] == "must"
    assert wandb_cfg["project"] == cfg.wandb_name

    # without wandb_restart there is no forced resume
    cfg2 = training_config_from_dict(tiny_config("tcga", wandb=True))
    wandb_cfg2 = make_wandb_config(cfg2)
    assert "id" not in wandb_cfg2 and "resume" not in wandb_cfg2

    # wandb off -> no config at all
    assert make_wandb_config(
        training_config_from_dict(tiny_config("tcga"))
    ) is None


def test_reproduce_respects_explicit_dataset_and_bare_sections(
    tmp_path, monkeypatch
):
    """A train config FILE that names its own `dataset:` must win over
    preprocess.out (the pipeline doc promises default-not-override
    semantics), and bare `train:` / `probe:` YAML sections (None) must
    not crash.  Stages are stubbed — this pins the plumbing only."""
    import yaml

    import mca_tpu.infer as infer_mod
    import mca_tpu.probe as probe_mod
    import mca_tpu.train as train_mod
    from mca_tpu.tools.reproduce import reproduce

    explicit = str(tmp_path / "real_dataset")
    tcfg = dict(
        tiny_config("tcga", epochs=1),
        dataset=explicit,
        output_dir=str(tmp_path / "out"),
    )
    cfg_path = tmp_path / "train.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(tcfg, f)

    seen = {}

    def fake_train(cfg):
        seen["dataset"] = cfg.dataset
        os.makedirs(cfg.output_dir, exist_ok=True)
        return cfg.output_dir

    monkeypatch.setattr(train_mod, "train", fake_train)
    monkeypatch.setattr(infer_mod, "infer", lambda cfg: None)
    monkeypatch.setattr(probe_mod, "probe", lambda cfg: {"f1": 0.5})

    synth_out = tmp_path / "synth"
    from mca_tpu.data.synthetic import make_tcga_like, to_hf_dataset

    to_hf_dataset(make_tcga_like(4, seed=0)).save_to_disk(
        str(synth_out)
    )
    summary = reproduce(
        {
            "preprocess": {"out": str(synth_out)},  # exists -> reused
            "train": str(cfg_path),
            "probe": None,  # bare `probe:` section
        }
    )
    assert seen["dataset"] == explicit  # not clobbered by synth_out
    assert summary["probe"] == {"f1": 0.5}


@pytest.mark.slow
def test_reproduce_pipeline_synthetic(tmp_path):
    """One-command reproduction: synthetic preprocess -> train ->
    infer -> probe from a single pipeline YAML."""
    import yaml

    from mca_tpu.tools.reproduce import main as reproduce_main

    pipeline = {
        "preprocess": {
            "synthetic": {
                "kind": "tcga",
                "n_samples": 48,
                "widths": {
                    "gene": 12,
                    "protein": 8,
                    "methylation": 10,
                    "mirna": 6,
                },
                "clustered": True,
                "p_missing": 0.2,
                "seed": 0,
                "n_classes": 4,
            },
            "out": str(tmp_path / "dataset"),
        },
        "train": dict(
            tiny_config(
                "tcga",
                widths={
                    "gene": 12,
                    "protein": 8,
                    "methylation": 10,
                    "mirna": 6,
                },
                batch_size=8,
                epochs=2,
                lr=2e-3,
                num_warmup_steps=2,
            ),
            dataset=str(tmp_path / "dataset"),
            output_dir=str(tmp_path / "out"),
            split=0.25,
        ),
        "infer_epoch": -1,
        "probe": {
            "task": -1,
            "loss_type": "BCE",
            "model_type": "linear",
            "epochs": 4,
            "batch_size": 16,
            "rank_metrics": False,
            "output_dir": str(tmp_path / "probe"),
        },
    }
    ppath = tmp_path / "pipeline.yaml"
    with open(ppath, "w") as f:
        yaml.safe_dump(pipeline, f)
    cwd = os.getcwd()
    os.chdir(tmp_path)  # auto output dirs land in tmp
    try:
        reproduce_main([str(ppath)])
    finally:
        os.chdir(cwd)
    # all four stages left their artifacts
    assert os.path.isdir(tmp_path / "dataset")
    assert os.path.isfile(tmp_path / "out" / "config.yaml")
    assert os.path.isfile(
        tmp_path / "out" / "inference" / "train_embeddings.pt"
    ) or os.path.isfile(
        tmp_path / "out" / "inference" / "train_embeddings.npz"
    )
    probe_metrics = os.path.join(tmp_path, "probe", "metrics.jsonl")
    assert os.path.isfile(probe_metrics)
    recs = [json.loads(l) for l in open(probe_metrics)]
    assert recs
