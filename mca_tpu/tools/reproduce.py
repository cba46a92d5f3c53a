"""One-command paper reproduction: ``python -m mca_tpu.tools.reproduce``.

Chains the reference's four-stage workflow — preprocess -> pretrain ->
batch inference -> linear/MLP probe (ref README.md:19-42: three
``accelerate launch`` scripts plus offline preprocessing) — from ONE
pipeline YAML::

    # pipeline.yaml
    preprocess:                  # optional; pick ONE source
      synthetic:                 # runs anywhere (clustered classes)
        kind: tcga               # tcga | cmu
        n_samples: 512
        clustered: true
        p_missing: 0.3
        seed: 0
      # tcga: {gene_path: ..., mirna_path: ..., methylation_path: ...,
      #        rppa_path: ..., cdr_path: ...}   # real TCGA raw tables
      # cmu: {data_dir: ...}                    # real CMU-MOSEI .csd dir
      out: ./dataset               # HF dataset dir to write
    train:                         # a training config path or inline
      epochs: 4                    # dict merged over the defaults;
      batch_size: 8                # `dataset:` defaults to
      ...                          # preprocess.out
    infer_epoch: -1                # checkpoint epoch to infer (-1=last)
    probe:                         # probe overrides (embedding_dir and
      task: -1                     # output_dir are filled in)
      loss_type: BCE
      epochs: 256

Real-data runs need the TCGA (122 MB) / CMU-MOSEI (38.2 GB) downloads
from the reference README (`/root/reference/README.md:26-27`); the
synthetic source verifies the full pipeline end-to-end without them.

Prints one JSON summary {dataset, train_output, inference, probe
metrics} and returns it from :func:`reproduce`.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import sys
from typing import Any, Dict

logger = logging.getLogger(__name__)


def _load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _run_preprocess(spec: Dict[str, Any]) -> str:
    out = spec["out"]
    if os.path.isdir(out) and os.listdir(out):
        logger.info("preprocess: %s already exists, reusing", out)
        return out
    if "synthetic" in spec:
        from mca_tpu.data.synthetic import (
            make_cmu_like,
            make_tcga_like,
            to_hf_dataset,
        )

        s = dict(spec["synthetic"])
        kind = s.pop("kind", "tcga")
        maker = make_tcga_like if kind == "tcga" else make_cmu_like
        samples = maker(**s)
        to_hf_dataset(samples).save_to_disk(out)
    elif "tcga" in spec:
        from mca_tpu.data.preprocess_tcga import process

        process(out_path=out, **spec["tcga"])
    elif "cmu" in spec:
        from mca_tpu.data.preprocess_cmu import process

        process(out_path=out, **spec["cmu"])
    else:
        raise ValueError(
            "preprocess needs one of: synthetic / tcga / cmu"
        )
    logger.info("preprocess: wrote %s", out)
    return out


def reproduce(pipeline: Dict[str, Any]) -> Dict[str, Any]:
    from mca_tpu.config import (
        dump_configs,
        get_cfg_defaults_embedding_eval,
        training_config,
        training_config_from_dict,
    )
    from mca_tpu.infer import infer
    from mca_tpu.probe import probe
    from mca_tpu.train import train

    summary: Dict[str, Any] = {}

    # 1. preprocess
    dataset = None
    if pipeline.get("preprocess"):
        dataset = _run_preprocess(pipeline["preprocess"])
        summary["dataset"] = dataset

    # 2. pretrain
    tspec = pipeline.get("train") or {}  # bare `train:` == all defaults
    if isinstance(tspec, str):
        cfg = training_config(tspec)
    else:
        cfg = training_config_from_dict(dict(tspec))
        if not cfg.output_dir:
            from mca_tpu.config import _auto_output_dir

            cfg.output_dir = _auto_output_dir()
        dump_configs(cfg, cfg.output_dir)
    # preprocess.out is a DEFAULT for `dataset:`, never an override —
    # a train config (inline or file) that names its own dataset wins
    if dataset and not cfg.dataset:
        cfg.dataset = dataset
    train_out = train(cfg)
    summary["train_output"] = train_out

    # 3. batch inference from the chosen epoch checkpoint
    epoch = int(pipeline.get("infer_epoch", -1))
    if epoch < 0:
        epoch = cfg.epochs - 1
    icfg = copy.deepcopy(cfg)
    icfg.restart = os.path.join(train_out, str(epoch))
    icfg.output_dir = os.path.join(train_out, "inference")
    os.makedirs(icfg.output_dir, exist_ok=True)
    infer(icfg)
    summary["inference"] = icfg.output_dir

    # 4. probe
    ecfg = get_cfg_defaults_embedding_eval()
    ecfg.merge(dict(pipeline.get("probe") or {}))
    ecfg.embedding_dir = icfg.output_dir
    if not ecfg.output_dir:
        ecfg.output_dir = os.path.join(train_out, "probe")
    os.makedirs(ecfg.output_dir, exist_ok=True)
    metrics = probe(ecfg)
    summary["probe"] = {
        k: float(v)
        for k, v in metrics.items()
        if isinstance(v, (int, float)) or hasattr(v, "item")
    }
    return summary


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        raise SystemExit(2)
    summary = reproduce(_load_yaml(argv[0]))
    print(json.dumps(summary, indent=2, default=str))


if __name__ == "__main__":
    main()
