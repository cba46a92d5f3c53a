"""Synthetic multimodal datasets shaped like TCGA / CMU-MOSEI.

Used by the tests, the benchmark, and smoke-training when the real
datasets (reference README.md:26-27 download links) are not on disk.

The generator plants a shared low-dimensional latent per sample that
every modality observes through its own random linear map, so
contrastive alignment is learnable and the probe has real signal:

- TCGA-like: 4 tabular modalities (z-scored values, missing modality =
  all ``pad_token``), one-hot cancer-type ``Labels`` under ``values``.
- CMU-like: 4 variable-length pre-embedded sequences, 7-column float
  ``Labels`` under ``data`` (sentiment at column 0, emotions after),
  matching the reference's probe tasks (lp_accel_gpu.py:26-28).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

TCGA_MODALITIES = {
    "gene": 800,
    "protein": 198,
    "methylation": 800,
    "mirna": 662,
}
CMU_MODALITIES = {
    "COVAREP": (74, 1500),
    "FACET": (35, 450),
    "OpenFace": (713, 450),
    "glove_vectors": (300, 50),
}


def make_tcga_like(
    n_samples: int = 64,
    widths: Optional[Dict[str, int]] = None,
    n_classes: int = 5,
    latent_dim: int = 8,
    p_missing: float = 0.0,
    pad_token: float = -10000.0,
    seed: int = 0,
    clustered: bool = False,
) -> List[Dict[str, Any]]:
    """List of sample dicts: ``{modality: {'values': [W]}, 'Labels': {...}}``.

    ``clustered=True`` draws the shared latent from per-class Gaussian
    clusters (like cancer types) instead of a continuous latent with
    argmax labels — class structure then survives contrastive
    pretraining and the probe has strong signal.
    """
    rng = np.random.default_rng(seed)
    widths = widths or TCGA_MODALITIES
    maps = {
        m: rng.normal(size=(latent_dim, w)).astype(np.float32)
        for m, w in widths.items()
    }
    class_w = rng.normal(size=(latent_dim, n_classes)).astype(np.float32)
    centers = 2.0 * rng.normal(
        size=(n_classes, latent_dim)
    ).astype(np.float32)
    samples = []
    for _ in range(n_samples):
        if clustered:
            cls = int(rng.integers(n_classes))
            z = centers[cls] + 0.5 * rng.normal(
                size=(latent_dim,)
            ).astype(np.float32)
        else:
            z = rng.normal(size=(latent_dim,)).astype(np.float32)
        sample: Dict[str, Any] = {}
        for m, w in widths.items():
            if rng.random() < p_missing:
                vals = np.full((w,), pad_token, dtype=np.float32)
            else:
                vals = z @ maps[m] + 0.1 * rng.normal(size=(w,)).astype(
                    np.float32
                )
            sample[m] = {"values": vals}
        label = np.zeros((n_classes,), dtype=np.float32)
        label[
            cls if clustered else int(np.argmax(z @ class_w))
        ] = 1.0
        sample["Labels"] = {"values": label}
        samples.append(sample)
    return samples


def make_cmu_like(
    n_samples: int = 64,
    shapes: Optional[Dict[str, tuple]] = None,
    latent_dim: int = 8,
    p_missing: float = 0.0,
    seed: int = 0,
) -> List[Dict[str, Any]]:
    """List of sample dicts: ``{modality: {'data': [T, D]}, 'Labels': {'data': [7]}}``."""
    rng = np.random.default_rng(seed)
    shapes = shapes or CMU_MODALITIES
    maps = {
        m: rng.normal(size=(latent_dim, d)).astype(np.float32)
        for m, (d, _) in shapes.items()
    }
    sent_w = rng.normal(size=(latent_dim,)).astype(np.float32)
    samples = []
    for _ in range(n_samples):
        z = rng.normal(size=(latent_dim,)).astype(np.float32)
        sample: Dict[str, Any] = {}
        for m, (d, max_t) in shapes.items():
            if rng.random() < p_missing:
                sample[m] = {"data": None}
                continue
            t = int(rng.integers(1, max_t + 1))
            seq = z @ maps[m] + 0.1 * rng.normal(size=(t, d)).astype(
                np.float32
            )
            sample[m] = {"data": seq.astype(np.float32)}
        labels = np.zeros((7,), dtype=np.float32)
        labels[0] = float(np.clip(z @ sent_w, -3, 3))  # sentiment
        labels[1:] = (
            rng.random(6) < 0.3
        ).astype(np.float32)  # emotions
        sample["Labels"] = {"data": labels}
        samples.append(sample)
    return samples


def to_hf_dataset(samples: Sequence[Dict[str, Any]]):
    """Materialise sample dicts as an HF dataset (for setup_data parity)."""
    import datasets as hfds

    def unwrap(v):
        if isinstance(v, dict):
            return {k: unwrap(x) for k, x in v.items()}
        if isinstance(v, np.ndarray):
            return v.tolist()
        return v

    columns: Dict[str, list] = {
        k: [] for k in samples[0].keys()
    }
    for s in samples:
        for k in columns:
            columns[k].append(unwrap(s[k]))
    ds = hfds.Dataset.from_dict(columns)
    return ds.with_format("numpy")


def tiny_config(
    kind: str = "tcga",
    *,
    widths: Optional[Dict[str, int]] = None,
    shapes: Optional[Dict[str, tuple]] = None,
    batch_size: int = 4,
    layers: int = 2,
    hidden: int = 32,
    heads: int = 2,
    dim_head: int = 16,
    num_fusion_tokens: int = 22,
    fusion_combos: Sequence[int] = (4, 3, 2),
    **overrides: Any,
) -> Dict[str, Any]:
    """A reference-shaped config dict for tiny synthetic runs."""
    if kind == "tcga":
        widths = widths or {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
        encoder_configs = {
            m: {
                "type": "TabularEncoder",
                "num_embeddings": w,
                "max_tokens": w,
                "max_value": 100,
            }
            for m, w in widths.items()
        }
        modality_config = {
            m: {
                "type": "sequence",
                "pad_len": w,
                "data_col_name": "values",
                "pad_token": -10000,
            }
            for m, w in widths.items()
        }
    elif kind == "cmu":
        shapes = shapes or {
            "COVAREP": (6, 20),
            "FACET": (4, 12),
            "OpenFace": (8, 12),
            "glove_vectors": (5, 8),
        }
        encoder_configs = {
            m: {
                "type": "EmbeddedSequenceEncoder",
                "input_size": d,
                "max_tokens": t,
            }
            for m, (d, t) in shapes.items()
        }
        modality_config = {
            m: {
                "type": "embedded_sequence",
                "pad_len": t,
                "data_col_name": "data",
                "pad_token": -10000,
                "embedding_size": d,
            }
            for m, (d, t) in shapes.items()
        }
    else:
        raise ValueError(kind)
    cfg = {
        "encoder_configs": encoder_configs,
        "modality_config": modality_config,
        "batch_size": batch_size,
        "hidden_size": hidden,
        "layers": layers,
        "heads": heads,
        "dim_head": dim_head,
        "num_fusion_tokens": num_fusion_tokens,
        "fusion_combos": list(fusion_combos),
        "fcl_root": [0, 1, 2, 3],
        "bimodal_contrastive": True,
        "non_fusion_fcl": True,
        "fcl": True,
        "clip": 2.0,
        "lr": 1e-3,
        "num_warmup_steps": 2,
        "epochs": 1,
        "split": 0.25,
        "precision": "fp32",
        "attention_impl": "dense",
    }
    cfg.update(overrides)
    return cfg
