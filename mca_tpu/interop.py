"""Torch-checkpoint interop: move weights between the PyTorch
reference and mca_tpu flax parameter trees, in both directions.

The reference trains with HF Accelerate and saves either
``accelerator.save_state`` directories (``model.safetensors`` /
``pytorch_model.bin`` inside) or a final ``save_model`` safetensors
file (ref train_accel_gpu.py:122-134, :187; README.md:44-53 links
pretrained TCGA/CMU checkpoints in exactly these formats).  A
reference user switching to this framework can point
``python -m mca_tpu.tools.import_checkpoint`` at any of those and get
an Orbax params directory usable as ``restart:`` for train/infer; or
call :func:`import_state_dict` in-process.  :func:`export_state_dict`
is the inverse (our params -> a reference-named torch state_dict), so
embeddings/metrics can be cross-checked in the reference's own
scripts.

The key map is generated from OUR param tree, so it adapts to every
model family (MCA / Zorro / EAO; Tabular / SparseTabular / Sequence /
EmbeddedSequence / Patch encoders; attention or mean-pooling).
Reference module names it mirrors:

- encoders:   ref encoders.py:87-88 (token_encoder/value_encoder),
  :158-159 (token_encoder + param-less sinusoidal positional_encoder),
  :187-193 (EmbeddedSequence ``token_encoder`` = Sequential
  [LayerNorm, Linear, LayerNorm]), :260-267 (Patch ``batch_to_tokens``
  Sequential + learnable ``embedding``).
- transformer: ref model.py:69-71 (bias-free to_q/to_kv/to_out),
  :48-54 (GEGLU ``feedforward.0/.2``), :27 (bias-less LayerNorm
  ``gamma``), :109-122 (ONE shared norm per MCALayer).
- model:      ref model.py:343 (fusion_tokens), :360 (return_tokens),
  attention pool (:473), :152 (shared ``loss.loss_fn.logit_scale`` —
  the per-pair loss dict is a plain python dict in the reference, so
  only the shared temperature exists in its state_dicts), :248
  (MeanTokenProjectionPool ``proj.{i}``).

Torch ``nn.Linear`` stores ``[out, in]`` kernels; flax ``[in, out]`` —
the ``linear`` kind transposes.  torch LayerNorm ``weight/bias`` map
to flax ``scale/bias``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = [
    "build_key_map",
    "import_state_dict",
    "export_state_dict",
    "load_torch_state_dict",
]

# (our_path, ref_key, kind); kind: "linear" transposes, "direct" copies
KeyMap = List[Tuple[Tuple[str, ...], str, str]]


def _map_value_encoder(out: KeyMap, base: Tuple[str, ...], prefix: str) -> None:
    for lin in ("linear1", "linear2"):
        out.append((base + (lin, "kernel"), f"{prefix}.{lin}.weight", "linear"))
        out.append((base + (lin, "bias"), f"{prefix}.{lin}.bias", "direct"))
    out.append((base + ("norm", "scale"), f"{prefix}.norm.weight", "direct"))
    out.append((base + ("norm", "bias"), f"{prefix}.norm.bias", "direct"))


def _map_norm_proj_norm(
    out: KeyMap, base: Tuple[str, ...], prefix: str
) -> None:
    """Our pre_norm/proj/post_norm <-> a reference Sequential
    [0: LayerNorm, 1: Linear, 2: LayerNorm]."""
    out.append((base + ("pre_norm", "scale"), f"{prefix}.0.weight", "direct"))
    out.append((base + ("pre_norm", "bias"), f"{prefix}.0.bias", "direct"))
    out.append((base + ("proj", "kernel"), f"{prefix}.1.weight", "linear"))
    out.append((base + ("proj", "bias"), f"{prefix}.1.bias", "direct"))
    out.append((base + ("post_norm", "scale"), f"{prefix}.2.weight", "direct"))
    out.append((base + ("post_norm", "bias"), f"{prefix}.2.bias", "direct"))


def _map_encoder(out: KeyMap, name: str, tree: Dict[str, Any]) -> None:
    base = (name,)
    prefix = f"encoders.{name}"
    if "value_encoder" in tree:  # TabularEncoder / SparseTabularEncoder
        out.append(
            (
                base + ("token_encoder", "embedding"),
                f"{prefix}.token_encoder.embedding.weight",
                "direct",
            )
        )
        _map_value_encoder(out, base + ("value_encoder",), f"{prefix}.value_encoder")
    elif "token_encoder" in tree:  # SequenceEncoder (PE is param-less)
        out.append(
            (
                base + ("token_encoder", "embedding"),
                f"{prefix}.token_encoder.embedding.weight",
                "direct",
            )
        )
    elif "pos_embedding" in tree:  # PatchEncoder
        _map_norm_proj_norm(out, base, f"{prefix}.batch_to_tokens")
        out.append(
            (base + ("pos_embedding",), f"{prefix}.embedding.weight", "direct")
        )
    elif "proj" in tree:  # EmbeddedSequenceEncoder
        _map_norm_proj_norm(out, base, f"{prefix}.token_encoder")
    else:
        raise ValueError(
            f"unrecognised encoder param structure for modality "
            f"{name!r}: {sorted(tree)}"
        )


def build_key_map(params: Dict[str, Any]) -> KeyMap:
    """Generate (our_path, ref_state_dict_key, kind) triplets from a
    flax param tree (``{'params': {...}}`` or the inner dict)."""
    p = params.get("params", params)
    out: KeyMap = []
    for key in sorted(p):
        tree = p[key]
        if key.startswith("layer_"):
            i = int(key.split("_")[1])
            for proj in ("to_q", "to_kv", "to_out"):
                out.append(
                    (
                        (key, "attn", proj, "kernel"),
                        f"layers.{i}.attn.{proj}.weight",
                        "linear",
                    )
                )
            ff = tree.get("ff", {})
            if isinstance(ff, dict) and "router" in ff:
                # MoE extension (mca_tpu.models.moe) — no reference
                # counterpart exists, so export under extension names;
                # "direct" (no transpose) so import round-trips the
                # stacked [E, ...] expert matrices untouched.
                out.append(
                    ((key, "ff", "router"), f"layers.{i}.ff.router.weight", "direct")
                )
                out.append(
                    ((key, "ff", "w_in"), f"layers.{i}.ff.experts.w_in", "direct")
                )
                out.append(
                    ((key, "ff", "w_out"), f"layers.{i}.ff.experts.w_out", "direct")
                )
            else:
                out.append(
                    ((key, "ff", "w_in", "kernel"), f"layers.{i}.ff.feedforward.0.weight", "linear")
                )
                out.append(
                    ((key, "ff", "w_out", "kernel"), f"layers.{i}.ff.feedforward.2.weight", "linear")
                )
            out.append(
                ((key, "norm", "LayerNorm_0", "scale"), f"layers.{i}.norm.gamma", "direct")
            )
        elif key == "final_norm":
            out.append(((key, "LayerNorm_0", "scale"), "norm.gamma", "direct"))
        elif key in ("fusion_tokens", "return_tokens"):
            out.append(((key,), key, "direct"))
        elif key == "attn_pool":
            for proj in ("to_q", "to_kv", "to_out"):
                out.append(
                    ((key, proj, "kernel"), f"attn_pool.{proj}.weight", "linear")
                )
        elif key == "loss":
            if "logit_scale" in tree:
                out.append(
                    ((key, "logit_scale"), "loss.loss_fn.logit_scale", "direct")
                )
        elif key == "pool":
            for sub in sorted(tree):
                if sub.startswith("proj_"):
                    i = int(sub.split("_")[1])
                    out.append(
                        ((key, sub, "kernel"), f"pool.proj.{i}.weight", "linear")
                    )
                    if "bias" in tree[sub]:
                        out.append(
                            ((key, sub, "bias"), f"pool.proj.{i}.bias", "direct")
                        )
        else:  # a modality encoder
            _map_encoder(out, key, tree)
    return out


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _get(tree: Dict[str, Any], path: Tuple[str, ...]) -> Any:
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: Any) -> None:
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def import_state_dict(
    state_dict: Dict[str, Any],
    params: Dict[str, Any],
    *,
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Copy a reference torch state_dict into a flax param tree.

    ``params`` provides the target structure (e.g. from ``model.init``
    or ``jax.eval_shape`` thereof); returns ``(new_params, report)``
    where ``report`` lists ``matched`` ref keys, ``missing`` ref keys
    (our param had no source — an error when ``strict``), and
    ``unused`` ref keys (buffers like the sinusoidal PE table, or
    params of reference modules we re-derive).
    """
    had_wrapper = "params" in params
    inner = params.get("params", params)
    p = {k: _copy_tree(v) for k, v in inner.items()}
    report = {"matched": [], "missing": [], "unused": []}
    for path, key, kind in build_key_map({"params": p}):
        if key not in state_dict:
            report["missing"].append(key)
            continue
        v = _to_numpy(state_dict[key])
        if kind == "linear":
            v = v.T
        dst = _get(p, path)
        if np.shape(dst) != v.shape:
            # tolerate 0-d vs [1] temperature scalars (torch stores
            # logit_scale as either depending on the loss version)
            if v.size == 1 and np.asarray(dst).size == 1:
                v = v.reshape(np.shape(dst))
            else:
                raise ValueError(
                    f"shape mismatch importing {key} -> "
                    f"{'/'.join(path)}: {v.shape} vs {np.shape(dst)}"
                )
        _set(p, path, v.astype(np.asarray(dst).dtype, copy=False))
        report["matched"].append(key)
    consumed = set(report["matched"])
    report["unused"] = sorted(k for k in state_dict if k not in consumed)
    if strict and report["missing"]:
        raise KeyError(
            f"reference checkpoint lacks {len(report['missing'])} "
            f"expected keys, e.g. {report['missing'][:5]}"
        )
    out = {"params": p} if had_wrapper else p
    return out, report


def export_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our params -> a reference-named state_dict (numpy values).

    The exact inverse of :func:`import_state_dict`; pass the result to
    ``torch.save``/``safetensors`` for the reference scripts.
    """
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for path, key, kind in build_key_map({"params": p}):
        v = np.asarray(_get(p, path))
        sd[key] = v.T if kind == "linear" else v
    return sd


def _copy_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.asarray(tree).copy() if hasattr(tree, "shape") else tree


_STATE_FILES = (
    "model.safetensors",
    "pytorch_model.bin",
    "pytorch_model.pt",
    "model.bin",
    "model.pt",
)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state_dict from a file or an Accelerate
    ``save_state``/``save_model`` directory; values as numpy arrays.

    Supports ``.safetensors`` (via the safetensors package) and torch
    pickle files (``.bin``/``.pt``, loaded with torch CPU).
    """
    if os.path.isdir(path):
        for name in _STATE_FILES:
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            found = sorted(
                f
                for f in os.listdir(path)
                if f.endswith((".safetensors", ".bin", ".pt"))
            )
            if not found:
                raise FileNotFoundError(
                    f"no torch checkpoint file under {path}"
                )
            path = os.path.join(path, found[0])
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {k: _to_numpy(v) for k, v in sd.items()}
    # DDP-wrapped models save under a "module." prefix
    if out and all(k.startswith("module.") for k in out):
        out = {k[len("module."):]: v for k, v in out.items()}
    return out
