"""Every reference train config must produce a valid model structure:
masks build (divisibility etc.), loss pair graph enumerates, and the
collators instantiate.  Deduplicated by structural signature to keep CI
fast; this pins the whole 244-file corpus, not just the canonical two."""

import glob
import os

import pytest

from mca_tpu import masks as M
from mca_tpu.config import get_cfg_defaults_train, load_yaml
from mca_tpu.data.collators import collators as collator_registry
from mca_tpu.encoders import encoders_dict


def _signature(cfg):
    dims = tuple(
        int(e["max_tokens"]) for e in cfg.encoder_configs.values()
    )
    return (
        dims,
        int(cfg.num_fusion_tokens),
        tuple(cfg.fusion_combos),
        bool(cfg.zorro),
        bool(cfg.fcl),
        bool(cfg.no_fusion),
        bool(cfg.eao),
    )


def test_all_reference_configs_build(reference_path):
    files = sorted(
        glob.glob(os.path.join(reference_path, "configs", "*.yaml"))
    )
    seen = set()
    n_checked = 0
    for f in files:
        raw = load_yaml(f)
        if "embedding_dir" in raw:
            continue  # probe config
        cfg = get_cfg_defaults_train().merge(raw)
        sig = _signature(cfg)
        if sig in seen:
            continue
        seen.add(sig)
        n_checked += 1
        # encoders + collators resolve
        for name, enc in cfg.encoder_configs.items():
            assert enc["type"] in encoders_dict, (f, name)
        for name, mod in cfg.modality_config.items():
            assert mod["type"] in collator_registry, (f, name)
            collator_registry[mod["type"]](**mod.to_plain())
        if cfg.eao:
            combos = M.adjusted_powerset(
                range(len(cfg.encoder_configs)),
                list(cfg.fusion_combos),
            )
            assert combos, f
            continue
        ms = M.build_masks(
            [
                int(e["max_tokens"])
                for e in cfg.encoder_configs.values()
            ],
            int(cfg.num_fusion_tokens),
            list(cfg.fusion_combos),
            zorro=bool(cfg.zorro),
            fcl=bool(cfg.fcl),
            no_fusion=bool(cfg.no_fusion),
        )
        assert ms.seq_len == sum(
            int(e["max_tokens"])
            for e in cfg.encoder_configs.values()
        ) + (
            0 if cfg.no_fusion else int(cfg.num_fusion_tokens)
        )
        # loss graph enumerates without error
        from mca_tpu.losses import MCAPretrainingLoss

        loss = MCAPretrainingLoss(
            modality_names=tuple(cfg.encoder_configs.keys()),
            do_fcl=bool(cfg.fcl) and not bool(cfg.zorro),
            fusion_combos=ms.fusion_combos,
            bimodal_contrastive=bool(cfg.bimodal_contrastive),
            no_fusion=bool(cfg.no_fusion),
            non_fusion_fcl=bool(cfg.non_fusion_fcl),
        )
        assert loss._pair_list()
    assert n_checked >= 5  # at least the distinct structural families
