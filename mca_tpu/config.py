"""Config system: YAML surface compatible with the reference corpus.

The reference uses yacs ``CfgNode`` with defaults-then-merge semantics
(``/root/reference/utils/config.py:9-61`` for the train schema and
``:129-153`` for the embedding-eval schema).  We re-implement the same
behaviour with a small attribute-dict so the 244 YAML files in the
reference's ``configs/`` directory parse unchanged:

- unknown keys are accepted (yacs ``new_allowed=True``); several dead keys
  appear throughout the corpus (``loss_masking``, ``random_seed``,
  ``do_fcl``, ``everything_at_once``, ``jepa_all``, ``inverse_doom``) and
  are tolerated but ignored, exactly like the reference,
- ``output_dir`` is auto-generated from a timestamp when empty, with
  ``_i`` dedup (reference ``utils/config.py:82-87``),
- the merged config is dumped to ``<output_dir>/config.yaml``
  (reference ``utils/config.py:120-123``) so restart/inference configs
  (``restart: <dir>/<epoch>``) keep working.

TPU-native extension keys (all optional, with defaults): ``precision``
(``bf16``/``fp32`` compute), ``attention_impl`` (``dense``/``pallas``/
``auto``), ``mesh_data``/``mesh_model`` (device-mesh axis sizes),
``log_every``, ``wandb`` (enable wandb mirroring of the JSONL logs).
"""

from __future__ import annotations

import copy
import os
from datetime import datetime
from typing import Any, Dict

import yaml


class Config(dict):
    """dict with attribute access, recursive over nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls({k: cls._wrap(v) for k, v in d.items()})

    def merge(self, other: Dict[str, Any]) -> "Config":
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], dict)
                and isinstance(v, dict)
            ):
                Config.merge(self[k], v)
            else:
                self[k] = Config._wrap(v)
        return self

    def to_plain(self) -> Dict[str, Any]:
        def unwrap(v: Any) -> Any:
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def get_cfg_defaults_train() -> Config:
    """Training defaults, mirroring reference ``utils/config.py:9-61``.

    Extra keys the reference scripts require but its defaults omit
    (``predrop``, ``modality_config``) get safe defaults here, plus the
    TPU-native extension keys.
    """
    return Config.from_dict(
        {
            # Structure configs
            "encoder_configs": {},
            "modality_config": {},
            # Training and dataset configuration
            "restart": "",
            "wandb": False,
            "wandb_name": "No Name",
            "wandb_account_name": "",
            "wandb_restart": "",
            "wandb_job_name": "",
            "epochs": 3,
            "start_epoch": 0,
            "batch_size": 32,
            "n_step_checkpoint": 0,
            "num_warmup_steps": 3000,
            "lr_scheduler_type": "cosine",
            "lr": 1e-4,
            "output_dir": "",
            "label_col": "Labels",
            "dataset": "",
            "split": 0.1,
            "ds_frac": 1.0,
            "ds_seed": 42,
            "clip": 0.0,
            "predrop": False,
            # Model configuration
            "hidden_size": 512,
            "layers": 10,
            "heads": 8,
            "dim_head": 64,
            "ff_mult": 4,
            "num_fusion_tokens": 256,
            "seed": 42,
            "mean_pool": False,
            "dropout": 0.1,
            "zorro": False,
            "eao": False,
            "run_eval_loop": True,
            "bimodal_contrastive": True,
            "non_fusion_fcl": True,
            "fcl": True,
            "no_fusion": False,
            "fcl_root": [1, 2, 3, 4],
            "fusion_combos": [4, 3, 2],
            "return_logits": True,
            # --- TPU-native extensions (not present in reference) ---
            "precision": "bf16",         # compute dtype: "bf16" | "fp32"
            "attention_impl": "auto",    # dense | pallas | segmented | auto
            "mesh_data": 0,              # 0 = use all devices on the data axis
            "mesh_model": 1,             # tensor-parallel axis size
            "mesh_pipe": 1,              # pipeline-parallel stages (GPipe over
                                         # the layer stack; depth % pipe == 0)
            "pipeline_microbatches": 0,  # 0 = one per stage
            "seq_shard": False,          # megatron sequence parallelism
                                         # (activations shard T over the TP
                                         # axis between blocks)
            "fsdp": False,               # ZeRO-style param/optimizer sharding
                                         # over the data axis (for models that
                                         # outgrow one chip's HBM; the 16M-param
                                         # reference is faster replicated)
            "grad_accum": 1,             # gradient-accumulation microbatches
                                         # per optimiser step (must divide
                                         # batch_size; each microbatch computes
                                         # its own contrastive loss — DDP-rank
                                         # semantics — and activations peak at
                                         # one microbatch)
            "moe_experts": 0,            # mixture-of-experts FF (extension):
                                         # 0 = the reference's dense GEGLU;
                                         # E > 0 = E expert-choice GEGLU
                                         # experts per block, expert dim
                                         # sharded over the 'model' mesh axis
                                         # (expert parallelism)
            "moe_capacity_factor": 2.0,  # expert-choice capacity: each expert
                                         # processes cf*T/E tokens per sample
            "halt_on_nan": True,         # failure detection: halt with a
                                         # forensic checkpoint when the
                                         # total loss goes non-finite
            "log_every": 1,              # JSONL log cadence (steps)
            "steps_per_call": 0,         # optimiser steps per launch (0 = auto)
            "checkpoint_keep": 0,        # 0 = keep all epoch checkpoints
            "trace_dir": "",             # jax.profiler trace of one launch
            "fuse_optimizer": True,      # flat-vector AdamW (fewer kernels)
            "preload_dataset": True,     # materialise samples once (host RAM)
            "remat": False,              # rematerialise transformer blocks
            "export_safetensors": True,  # final save also as reference-named
                                         # model.safetensors (interop)
        }
    )


def get_cfg_defaults_embedding_eval() -> Config:
    """Probe defaults, mirroring reference ``utils/config.py:129-153``."""
    return Config.from_dict(
        {
            "embedding_dir": "",
            "task": 0,
            "loss_type": "L1",
            "model_type": "linear",
            "hidden_size": 256,
            "dropout": 0.1,
            "wandb": False,
            "wandb_name": "MCA",
            "wandb_account_name": "",
            "lr": 1e-5,
            "lr_scheduler_type": "cosine",
            "num_warmup_steps": 1000,
            "rank_metrics": True,
            "epochs": 1024,
            "clip": 2.0,
            "metric": "PCC",
            "output_dir": "",
            "wandb_job_name": "MCA-DefaultJobName",
            "seed": 42,
            "batch_size": 1024,
            "threshold": 0.0,
        }
    )


#: YAML keys present throughout the reference's config corpus that are
#: consumed nowhere in its code (grep-verified; SURVEY.md §2.2).  They are
#: accepted and ignored here too.
DEAD_KEYS = frozenset(
    {
        "loss_masking",
        "random_seed",
        "do_fcl",
        "everything_at_once",
        "jepa_all",
        "inverse_doom",
        "modality_configs",  # defaults-only spelling in the reference
        "reset_lr",
    }
)


def _auto_output_dir(prefix: str = "training_output") -> str:
    """Timestamped output dir with ``_i`` dedup (ref utils/config.py:82-87)."""
    base = datetime.now().strftime(f"{prefix}_%H_%M_%d_%m_%Y")
    out = base
    i = 1
    while os.path.isdir(out):
        out = f"{base}_{i}"
        i += 1
    return out


def dump_configs(config: Config, output_dir: str) -> None:
    """Dump the merged config to ``<output_dir>/config.yaml``."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config.to_plain(), f, sort_keys=False)


def load_yaml(filename: str) -> Dict[str, Any]:
    with open(filename, "r") as stream:
        return yaml.safe_load(stream) or {}


def training_config(
    filename: str, make_output_dir: bool = True
) -> Config:
    """Load a training YAML over the defaults (ref utils/config.py:76-93)."""
    config = get_cfg_defaults_train()
    config.merge(load_yaml(filename))
    if not config.output_dir and make_output_dir:
        config.output_dir = _auto_output_dir()
    if make_output_dir:
        dump_configs(config, config.output_dir)
    return config


def training_config_from_dict(d: Dict[str, Any]) -> Config:
    """Defaults merged with an in-memory dict (for tests / programmatic use)."""
    return get_cfg_defaults_train().merge(copy.deepcopy(d))


def embedding_eval_config(
    filename: str, make_output_dir: bool = True
) -> Config:
    """Load a probe YAML over the defaults (ref utils/config.py:155-170)."""
    config = get_cfg_defaults_embedding_eval()
    config.merge(load_yaml(filename))
    if not config.output_dir and make_output_dir:
        config.output_dir = _auto_output_dir()
    if make_output_dir:
        dump_configs(config, config.output_dir)
    return config


def get_model_config(config: Config) -> Dict[str, Any]:
    """Map a train config onto MCA/EAO constructor kwargs.

    Mirrors reference ``utils/config.py:96-117``; ``eao`` is the live
    model-selector key.  The TPU extensions ``precision`` and
    ``attention_impl`` ride along.
    """
    return {
        "dim": config.hidden_size,
        "depth": config.layers,
        "heads": config.heads,
        "dim_head": config.dim_head,
        "ff_mult": config.ff_mult,
        "num_fusion_tokens": config.num_fusion_tokens,
        "encoder_configs": config.encoder_configs.to_plain()
        if isinstance(config.encoder_configs, Config)
        else dict(config.encoder_configs),
        "batch_size": config.batch_size,
        "fcl": config.fcl,
        "fcl_root": list(config.fcl_root),
        "bimodal_contrastive": config.bimodal_contrastive,
        "non_fusion_fcl": config.non_fusion_fcl,
        "fusion_combos": list(config.fusion_combos),
        "zorro": config.zorro,
        "eao": config.eao,
        "no_fusion": config.no_fusion,
        "mean_pool": config.mean_pool,
        "precision": config.get("precision", "bf16"),
        "attention_impl": config.get("attention_impl", "auto"),
        "remat": config.get("remat", False),
        # pipeline parallelism (MCA-only; train() injects the live
        # Mesh as 'pipeline_mesh' when mesh_pipe > 1)
        "pipeline_stages": int(config.get("mesh_pipe", 1) or 1)
        if int(config.get("mesh_pipe", 1) or 1) > 1
        else 0,
        "pipeline_microbatches": int(
            config.get("pipeline_microbatches", 0) or 0
        ),
        # Megatron sequence parallelism (needs mesh_model > 1;
        # train() injects the live Mesh as 'seq_shard_mesh')
        "seq_shard": bool(config.get("seq_shard", False)),
        # mixture-of-experts FF (extension, mca_tpu.models.moe)
        "moe_experts": int(config.get("moe_experts", 0) or 0),
        "moe_capacity_factor": float(
            config.get("moe_capacity_factor", 2.0)
        ),
        # EAO-only (build_model filters by dataclass fields); grouping
        # measured slower at canonical scale (PERF.md round 3), so the
        # default is the reference's sequential pass structure
        "group_channels": config.get("eao_group_channels", False),
    }


def dump_model_configs(config: Config, output_dir: str) -> None:
    """Dump the model kwargs as JSON (ref utils/config.py:125-127)."""
    import json

    os.makedirs(output_dir, exist_ok=True)
    with open(
        os.path.join(output_dir, "model_config.json"), "w"
    ) as f:
        json.dump(get_model_config(config), f)


def restart_cfg(config: Config) -> Config:
    """Merge a checkpoint's dumped config on restart (ref utils/config.py:63-74)."""
    if config.restart:
        config.merge(load_yaml(os.path.join(config.restart, "config.yaml")))
        config.epochs = 1
        config.output_dir = _auto_output_dir()
    return config
