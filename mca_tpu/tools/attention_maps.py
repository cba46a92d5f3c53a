"""Attention-map extraction: ``python -m mca_tpu.tools.attention_maps``.

The TPU-native packaging of the reference's ``Attention(return_attn)``
introspection hook (ref model.py:79, 102-105 — constructed but never
called by any reference script): runs one batch through a trained MCA
checkpoint on the DENSE attention path and saves the per-layer and
pooling post-softmax probabilities to an ``.npz``:

- ``layers``: [depth, B, H, T, T]
- ``pool``:   [B, H, R, T] (attentive pooling only)
- ``token_types``: [T] (modality id per packed position, -1 = fusion)

Usage::

    python -m mca_tpu.tools.attention_maps config.yaml \
        [--out attention_maps.npz] [--split train|test]

``config.yaml`` is a training/inference config; with ``restart:`` set
the checkpointed parameters are loaded (otherwise fresh init — useful
for inspecting mask structure only).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def extract_attention_maps(config, split: str = "train"):
    import jax
    import jax.numpy as jnp

    from mca_tpu.config import get_model_config
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.dataset import BatchedLoader, setup_data
    from mca_tpu.infer import _restore_params
    from mca_tpu.models import build_model

    model_config = get_model_config(config)
    assert not model_config["eao"], (
        "attention maps are an MCA/zorro introspection tool (EAO runs "
        "unmasked passes)"
    )
    model = build_model(model_config)
    mc = (
        config.modality_config.to_plain()
        if hasattr(config.modality_config, "to_plain")
        else config.modality_config
    )
    datasets = setup_data(
        config.dataset,
        split=config.split,
        ds_frac=config.ds_frac,
        ds_seed=config.ds_seed,
        predrop=config.predrop,
        predrop_config=mc,
    )
    dl = BatchedLoader(
        datasets["train" if split == "train" else "test"],
        MultimodalCollator(mc),
        config.batch_size,
        preload=True,
    )
    batch = jax.tree.map(jnp.asarray, dl.first_batch())
    params = jax.jit(model.init)(jax.random.key(0), batch)
    if config.restart:
        logger.info("loading parameters from %s", config.restart)
        params = _restore_params(config.restart, params)
    maps = jax.device_get(
        jax.jit(
            lambda p, b: model.apply(p, b, method="attention_maps")
        )(params, batch)
    )
    maps = {k: np.asarray(v) for k, v in maps.items()}
    from mca_tpu import masks as masks_lib

    enc = model_config["encoder_configs"]
    ms = masks_lib.build_masks(
        [int(enc[m]["max_tokens"]) for m in enc],
        int(model_config["num_fusion_tokens"]),
        list(model_config["fusion_combos"]),
        zorro=bool(model_config["zorro"]),
        fcl=bool(model_config["fcl"]),
        no_fusion=bool(model_config["no_fusion"]),
    )
    maps["token_types"] = np.asarray(ms.token_types)
    return maps


def main(argv=None) -> None:
    from mca_tpu.config import training_config

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--out", default="attention_maps.npz")
    ap.add_argument(
        "--split", default="train", choices=("train", "test")
    )
    args = ap.parse_args(argv)
    config = training_config(args.config)
    maps = extract_attention_maps(config, split=args.split)
    np.savez_compressed(args.out, **maps)
    logger.info(
        "wrote %s: %s",
        os.path.abspath(args.out),
        {k: v.shape for k, v in maps.items()},
    )


if __name__ == "__main__":
    main()
