"""Config-system tests: defaults, YAML merge, full reference-corpus parse."""

import glob
import os

import pytest

from mca_tpu import config as C


def test_defaults_roundtrip(tmp_path):
    cfg = C.get_cfg_defaults_train()
    assert cfg.batch_size == 32
    assert cfg.fusion_combos == [4, 3, 2]
    assert cfg.modality_config == {}
    # attribute + item access agree
    assert cfg["hidden_size"] == cfg.hidden_size == 512


def test_merge_nested():
    cfg = C.training_config_from_dict(
        {
            "encoder_configs": {
                "gene": {"type": "TabularEncoder", "max_tokens": 10}
            },
            "batch_size": 8,
            "loss_masking": True,  # dead key: accepted, ignored
        }
    )
    assert cfg.batch_size == 8
    assert cfg.encoder_configs.gene.type == "TabularEncoder"
    assert cfg.loss_masking is True  # tolerated
    assert cfg.epochs == 3  # default preserved


def test_yaml_load_and_dump(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("batch_size: 4\nzorro: true\n")
    out = tmp_path / "out"
    cfg = C.get_cfg_defaults_train()
    cfg.merge(C.load_yaml(str(p)))
    cfg.output_dir = str(out)
    C.dump_configs(cfg, cfg.output_dir)
    cfg2 = C.get_cfg_defaults_train().merge(
        C.load_yaml(os.path.join(str(out), "config.yaml"))
    )
    assert cfg2.batch_size == 4 and cfg2.zorro is True


def test_get_model_config_keys():
    cfg = C.training_config_from_dict(
        {"encoder_configs": {"a": {"type": "TabularEncoder"}}}
    )
    mc = C.get_model_config(cfg)
    for k in [
        "dim",
        "depth",
        "heads",
        "dim_head",
        "ff_mult",
        "num_fusion_tokens",
        "encoder_configs",
        "batch_size",
        "fcl",
        "fcl_root",
        "bimodal_contrastive",
        "non_fusion_fcl",
        "fusion_combos",
        "zorro",
        "eao",
        "no_fusion",
        "mean_pool",
    ]:
        assert k in mc
    assert isinstance(mc["encoder_configs"], dict)


def test_parse_entire_reference_corpus(reference_path):
    """Every YAML in the reference's configs/ must merge cleanly."""
    files = sorted(
        glob.glob(os.path.join(reference_path, "configs", "*.yaml"))
    )
    assert len(files) > 200
    n_train, n_eval = 0, 0
    for f in files:
        raw = C.load_yaml(f)
        if "embedding_dir" in raw:
            cfg = C.get_cfg_defaults_embedding_eval().merge(raw)
            assert cfg.loss_type in {"L1", "MSE", "BCE", "CE"}
            n_eval += 1
        else:
            cfg = C.get_cfg_defaults_train().merge(raw)
            assert cfg.batch_size > 0
            assert isinstance(cfg.encoder_configs, dict)
            # every encoder entry must name a known encoder type
            for name, enc in cfg.encoder_configs.items():
                assert enc["type"] in {
                    "SequenceEncoder",
                    "TabularEncoder",
                    "SparseTabularEncoder",
                    "PatchEncoder",
                    "EmbeddedSequenceEncoder",
                }
            for name, mod in cfg.modality_config.items():
                assert mod["type"] in {
                    "sequence",
                    "embedded_sequence",
                    "matrix",
                }
            n_train += 1
    assert n_train > 100 and n_eval > 50


def test_eval_defaults():
    cfg = C.get_cfg_defaults_embedding_eval()
    assert cfg.task == 0
    assert cfg.model_type == "linear"
    assert cfg.batch_size == 1024
    assert cfg.clip == 2.0


def test_docs_config_reference_covers_all_keys():
    """docs/config.md documents every key in both default schemas (and
    the env knobs the ops layer reads) — a docs-rot guard: adding a
    config key without documenting it fails here."""
    import re

    from mca_tpu.config import (
        get_cfg_defaults_embedding_eval,
        get_cfg_defaults_train,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = open(os.path.join(root, "docs", "config.md")).read()
    # exact backticked occurrence only — a bare substring match would
    # let short keys (`lr`, `clip`, `task`, …) hide inside other
    # documented tokens
    documented = set(re.findall(r"`([A-Za-z0-9_/|\\ ]+)`", doc))

    import mca_tpu

    pkg = os.path.dirname(mca_tpu.__file__)
    # keys consumed via config.get(...) without a schema default
    get_keys, knobs = set(), set()
    for dirpath, _, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                src = open(os.path.join(dirpath, f)).read()
                get_keys |= set(
                    re.findall(r'config\.get\(\s*"([a-z_0-9]+)"', src)
                )
                knobs |= set(re.findall(r'"(MCA_[A-Z0-9_]+)"', src))
    # internal plumbing, not user-facing YAML keys: pipeline_stages /
    # group_channels are model-config fields set from mesh_pipe /
    # eao_group_channels
    get_keys -= {"pipeline_stages", "group_channels"}
    missing = [
        k
        for k in set(get_cfg_defaults_train())
        | set(get_cfg_defaults_embedding_eval())
        | get_keys
        if k not in documented
    ]
    assert not missing, f"undocumented config keys: {sorted(missing)}"

    # cache-path override is documented via MCA_COMPILE_CACHE
    knobs.discard("MCA_FLASH_TUNE_CACHE")
    undocumented = sorted(k for k in knobs if k not in documented)
    assert not undocumented, f"undocumented env knobs: {undocumented}"
