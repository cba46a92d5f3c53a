"""AOT model export: a self-contained serialized StableHLO artifact.

Deployment counterpart of :mod:`mca_tpu.serve`: `jax.export` lowers
the packed embedding forward (fixed batch shape, weights baked in as
constants) to a portable StableHLO blob that reloads and executes
WITHOUT the model-building Python (no flax, no mca_tpu config) — the
TPU-native analogue of torch's TorchScript/ONNX deployment exports,
which the reference does not provide (it ships raw state dicts only,
ref README.md:44-53).

    python -m mca_tpu.tools.export_aot config.yaml --restart out/3 \
        --out model.stablehlo --batch 8

    from mca_tpu.tools.export_aot import load_aot
    fn, emb_keys, mask_keys = load_aot("model.stablehlo")
    emb, msk = fn(batch)   # [E, B, D], [M, B]

The artifact is platform-checked by jax.export: export on the target
backend (TPU for TPU serving; these tests export/reload on CPU).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_MAGIC = b"MCAAOT1\n"


def export_packed_forward(
    config, params: Any, batch: Any, model: Any = None
) -> Tuple[bytes, Tuple[str, ...], Tuple[str, ...]]:
    """Serialized StableHLO of the packed embedding forward.

    ``batch`` fixes the compiled shapes (pad requests to this batch at
    serving time, exactly like :class:`mca_tpu.serve.EmbeddingService`).
    Weights are closed over — the artifact is self-contained.  Pass an
    already-built ``model`` to skip rebuilding it from the config.
    """
    from jax import export as jexport

    if model is None:
        from mca_tpu.config import get_model_config
        from mca_tpu.models import build_model

        model = build_model(get_model_config(config))
    shapes = jax.eval_shape(
        lambda p, b: model.apply(p, b, no_loss=True), params, batch
    )
    mask_keys = tuple(sorted(shapes["modality_sample_mask"]))
    emb_keys = tuple(
        sorted(k for k in shapes if k != "modality_sample_mask")
    )

    def packed(batch):
        out = model.apply(params, batch, no_loss=True)
        emb = jnp.stack([out[k] for k in emb_keys])
        msk = jnp.stack(
            [out["modality_sample_mask"][k] for k in mask_keys]
        )
        return emb, msk

    arg = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        batch,
    )
    exp = jexport.export(jax.jit(packed))(arg)
    return exp.serialize(), emb_keys, mask_keys


def save_aot(
    path: str,
    blob: bytes,
    emb_keys,
    mask_keys,
    modality_config=None,
    batch: int = 0,
) -> None:
    """MAGIC + json header + the StableHLO blob.

    ``modality_config``/``batch`` make the artifact self-contained for
    serving: ``mca_tpu.serve --aot`` rebuilds the collator and request
    padding from the header alone — no training YAML at the serving
    host."""
    header = json.dumps(
        {
            "emb_keys": list(emb_keys),
            "mask_keys": list(mask_keys),
            "modality_config": modality_config,
            "batch": int(batch),
        }
    ).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)


def load_aot_full(path: str):
    """(callable(batch) -> (emb, msk), header dict)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        assert f.read(len(_MAGIC)) == _MAGIC, "not an mca AOT artifact"
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        exp = jexport.deserialize(f.read())
    return (lambda batch: exp.call(batch)), header


def load_aot(path: str):
    """(callable(batch) -> (emb, msk), emb_keys, mask_keys)."""
    fn, header = load_aot_full(path)
    return fn, tuple(header["emb_keys"]), tuple(header["mask_keys"])


def main(argv=None) -> None:
    import argparse
    import os
    import sys

    import numpy as np

    from mca_tpu.config import training_config
    from mca_tpu.data.collators import MultimodalCollator

    logging.basicConfig(level=logging.INFO)
    # forward-only export: fused GEGLU-FF is a pure win without a
    # backward (PERF.md round 4); explicit env wins.
    os.environ.setdefault("MCA_FUSED_FF", "auto")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--restart", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument(
        "--quantize",
        choices=("none", "int8"),
        default="none",
        help="bake int8-quantized projections into the artifact "
        "(mca_tpu.ops.quant; the int8 kernels become the baked "
        "constants, ~4x smaller than fp32)",
    )
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    config = training_config(args.config)

    from mca_tpu.serve import EmbeddingService

    svc = EmbeddingService(
        config,
        restart=args.restart or (config.restart or None),
        max_batch=args.batch,
        warmup=False,  # the exporter lowers its own executable
        quantize=args.quantize,
    )
    batch = svc._pad([svc._template] * args.batch)
    blob, emb_keys, mask_keys = export_packed_forward(
        config, svc.params, batch, model=svc.model
    )
    save_aot(
        args.out,
        blob,
        emb_keys,
        mask_keys,
        modality_config=(
            config.modality_config.to_plain()
            if hasattr(config.modality_config, "to_plain")
            else dict(config.modality_config)
        ),
        batch=args.batch,
    )
    logger.info(
        "exported %s (%d bytes, batch %d, platform %s, keys %s)",
        args.out,
        len(blob),
        args.batch,
        jax.default_backend(),
        ",".join(emb_keys),
    )
    # round-trip smoke check
    fn, ek, mk = load_aot(args.out)
    emb, msk = fn(batch)
    assert np.isfinite(np.asarray(emb)).all()


if __name__ == "__main__":
    main()
