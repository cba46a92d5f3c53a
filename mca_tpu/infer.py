"""Batch embedding inference: ``python -m mca_tpu.infer <config.yaml>``.

TPU rebuild of ``/root/reference/infer_accel_gpu.py``: loads a
checkpoint (``config.restart`` required, ref :90-92), iterates the
train and test splits with ``shuffle=False, drop_last=True``
(ref :70-71), runs the model, and saves per-split embeddings, modality
presence masks and labels.

Output format matches the reference bit-for-bit when torch is
available: ``{train,eval}_{embeddings,masks,labels}.pt`` via
``torch.save`` with the same key scheme — modality names (str),
modality combos as ``frozenset`` of modality indices, and ``'fusion'``
(ref :110-136) — so embeddings produced here feed the reference's
probe script and vice versa.  Falls back to ``.npz`` without torch.

Unlike the reference there is no single-process assert (ref :95-96):
inference jits over whatever mesh is configured.
"""

from __future__ import annotations

import logging
import os
import sys
from collections import defaultdict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu import checkpoint as ckpt
from mca_tpu.config import Config, get_model_config, training_config
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.dataset import BatchedLoader, setup_data
from mca_tpu.models import build_model
from mca_tpu.parallel.mesh import make_mesh, shard_batch

logger = logging.getLogger(__name__)


def combo_str_to_frozenset(key: str):
    return frozenset(int(i) for i in key.split(":", 1)[1].split(","))


def _save(obj: Dict[Any, np.ndarray], path_stem: str) -> str:
    """torch.save for reference interop; .npz fallback."""
    try:
        import torch

        path = path_stem + ".pt"
        torch.save(
            {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in obj.items()
            },
            path,
        )
        return path
    except ImportError:
        path = path_stem + ".npz"
        np.savez(
            path, **{str(k): v for k, v in obj.items()}
        )
        return path


def _save_array(arr: np.ndarray, path_stem: str) -> str:
    """Bare-tensor save (the reference stores labels as a raw tensor,
    infer_accel_gpu.py:135-136)."""
    try:
        import torch

        path = path_stem + ".pt"
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), path)
        return path
    except ImportError:
        path = path_stem + ".npz"
        np.savez(path, labels=arr)
        return path


def load_label_file(path_stem: str) -> np.ndarray:
    import os

    if os.path.exists(path_stem + ".pt"):
        import torch

        return torch.load(
            path_stem + ".pt", map_location="cpu", weights_only=False
        ).numpy()
    return np.load(path_stem + ".npz", allow_pickle=True)["labels"]


def load_embedding_file(path_stem: str) -> Dict[Any, np.ndarray]:
    """Load embeddings saved by :func:`infer` OR by the reference."""
    import os

    if os.path.exists(path_stem + ".pt"):
        import torch

        data = torch.load(
            path_stem + ".pt", map_location="cpu", weights_only=False
        )
        return {k: v.numpy() for k, v in data.items()}
    data = np.load(path_stem + ".npz", allow_pickle=True)
    return {k: data[k] for k in data.files}


def split_output_keys(out) -> tuple:
    """Embedding vs mask keys of a model output tree (stable order)."""
    emb_keys = sorted(
        k
        for k in out
        if k
        not in (
            "loss",
            "losses",
            "fcl_loss",
            "no-fcl_loss",
            "modality_sample_mask",
        )
    )
    mask_keys = sorted(out["modality_sample_mask"])
    return emb_keys, mask_keys


def make_packed_forward(model, emb_keys, mask_keys):
    """Few-buffer inference forward: stacked embeddings + masks + loss.

    Per-key outputs would be ~80 buffers per launch (each one has
    per-launch cost on remote-attached chips, see PERF.md).
    """

    def _packed_forward(params, batch):
        out = model.apply(params, batch)
        emb = jnp.stack([out[k] for k in emb_keys])  # [E, B, D]
        msk = jnp.stack(
            [out["modality_sample_mask"][k] for k in mask_keys]
        )  # [M, B]
        return emb, msk, out["loss"]

    return _packed_forward


def make_forward_scan(packed_forward):
    """K inference forwards per launch (stacked batches, lax.scan)."""

    @jax.jit
    def forward_scan(params, batches):
        def body(carry, b):
            return carry, packed_forward(params, b)

        _, outs = jax.lax.scan(body, None, batches)
        return outs  # ([K, E, B, D], [K, M, B], [K])

    return forward_scan


def infer(config: Config) -> str:
    assert config.restart, "inference needs config.restart -> checkpoint"
    import os

    os.makedirs(config.output_dir, exist_ok=True)
    mesh = make_mesh(
        config.mesh_data,
        config.mesh_model,
        batch_size=config.batch_size,
    )
    # multi-host: same scheme as train() — every process runs the same
    # deterministic loader, stages only ITS rows, and the sharded
    # device outputs are gathered to every host before rank 0 writes
    # the .pt files (labels come from the full global batch, so they
    # are complete on every host)
    from mca_tpu.parallel.multihost import make_stager

    n_proc = jax.process_count()
    _stage = make_stager(mesh, int(config.batch_size))
    model_config = get_model_config(config)
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
    collator = MultimodalCollator(mc, labels=config.label_col)

    preload = bool(config.get("preload_dataset", True))
    steps_per_call = int(config.get("steps_per_call", 0))
    if steps_per_call <= 0:
        steps_per_call = 1 if jax.default_backend() == "cpu" else 32
    prefetch = int(
        config.get(
            "prefetch_batches",
            0 if steps_per_call == 1 else 2 * steps_per_call,
        )
    )
    loaders = {
        "train": BatchedLoader(
            datasets["train"], collator, config.batch_size,
            preload=preload, prefetch=prefetch,
        ),
        "eval": BatchedLoader(
            datasets["test"], collator, config.batch_size,
            preload=preload, prefetch=prefetch,
        ),
    }

    # init to get structure, then restore the checkpointed params
    first = loaders["train"].first_batch()
    label_batch = first.pop(config.label_col)
    first_staged = _stage(first)
    params = jax.jit(model.init)(jax.random.key(0), first_staged)
    params = _restore_params(config.restart, params)

    _shapes = jax.eval_shape(
        lambda p, b: model.apply(p, b), params, first_staged
    )
    emb_keys, mask_keys = split_output_keys(_shapes)

    _packed_forward = make_packed_forward(model, emb_keys, mask_keys)
    forward = jax.jit(_packed_forward)
    forward_scan = make_forward_scan(_packed_forward)

    # the reference reads batch['Labels']['data'] (infer_accel_gpu.py:105);
    # TCGA-style datasets store labels under 'values'
    label_field = next(
        (f for f in ("data", "values") if f in label_batch),
        next(iter(label_batch.keys())),
    )
    from mca_tpu.train import stack_batches

    for split, dl in loaders.items():
        embeddings = defaultdict(list)
        masks = defaultdict(list)
        labels = []
        # launches keep their outputs on device; ONE device_get at the
        # end of the split batches every transfer into a single sync
        # (per-chunk syncs serialise against dispatch, PERF.md)
        device_chunks = []

        def flush(chunk) -> None:
            if len(chunk) == 1 or steps_per_call == 1:
                for b in chunk:
                    emb, msk, loss = forward(params, _stage(b))
                    device_chunks.append((emb[None], msk[None], loss[None]))
            else:
                stacked = _stage(
                    stack_batches(chunk), leading_scan_axis=True
                )
                device_chunks.append(forward_scan(params, stacked))

        chunk = []
        for batch in dl:
            batch_labels = batch.pop(config.label_col)
            labels.append(np.asarray(batch_labels[label_field]))
            chunk.append(batch)
            if len(chunk) == steps_per_call:
                flush(chunk)
                chunk = []
        if chunk:
            flush(chunk)

        if n_proc == 1:
            host_chunks = jax.device_get(device_chunks)
        else:
            # sharded device outputs are not fully addressable per
            # process; gather the global values to every host
            from jax.experimental import multihost_utils

            host_chunks = multihost_utils.process_allgather(
                device_chunks, tiled=True
            )
        total_loss = 0.0
        n = 0
        for embs, msks, ls in host_chunks:
            for i in range(len(ls)):
                total_loss += float(ls[i])
                n += 1
                for j, k in enumerate(emb_keys):
                    key = (
                        combo_str_to_frozenset(k)
                        if str(k).startswith("combo:")
                        else k
                    )
                    embeddings[key].append(np.asarray(embs[i][j]))
                for j, k in enumerate(mask_keys):
                    masks[k].append(np.asarray(msks[i][j]))
        logger.info(
            "%s split: %d batches, mean loss %.4f",
            split,
            n,
            total_loss / max(n, 1),
        )
        from mca_tpu.parallel.multihost import is_primary

        if is_primary():
            _save(
                {k: np.concatenate(v) for k, v in masks.items()},
                f"{config.output_dir}/{split}_masks",
            )
            _save(
                {k: np.concatenate(v) for k, v in embeddings.items()},
                f"{config.output_dir}/{split}_embeddings",
            )
            _save_array(
                np.concatenate(labels),
                f"{config.output_dir}/{split}_labels",
            )
    return config.output_dir


def _restore_params(restart_dir: str, target):
    """Accept either a train-state checkpoint dir or a final model dir."""
    import os

    if os.path.isdir(os.path.join(restart_dir, "state")):
        restored = ckpt.load_state(restart_dir)
        return jax.tree.map(
            lambda t, r: np.asarray(r), target, restored["params"]
        )
    return ckpt.load_params(restart_dir, target=target)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # forward-only process: the fused GEGLU-FF Pallas kernel is a pure
    # win without a backward (fwd 0.811 -> 0.611 ms/layer, PERF.md
    # round 4); training keeps the XLA path (see
    # models.layers._fused_ff_mode).  setdefault: explicit env wins.
    os.environ.setdefault("MCA_FUSED_FF", "auto")

    from mca_tpu.parallel.multihost import init_multihost

    init_multihost()  # env-gated no-op on single-host runs
    argv = argv if argv is not None else sys.argv[1:]
    if jax.process_count() > 1:
        # same hazard as train: per-process auto-timestamped dirs
        # would scatter rank 0's .pt files away from what the other
        # ranks' configs (and downstream probe tooling) point at
        import yaml as _yaml

        with open(argv[0]) as f:
            raw = _yaml.safe_load(f) or {}
        if not raw.get("output_dir"):
            raise ValueError(
                "multi-host runs must set an explicit output_dir "
                "(auto-timestamped dirs race across hosts)"
            )
    config = training_config(argv[0])
    infer(config)


if __name__ == "__main__":
    main()
