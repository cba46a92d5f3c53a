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
    "ref_param_names",
    "import_optimizer_state",
    "load_accelerate_dir",
    "fill_adam_state",
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
    out: KeyMap, base: Tuple[str, ...], prefix: str, start: int = 0
) -> None:
    """Our pre_norm/proj/post_norm <-> a reference Sequential
    [LayerNorm, Linear, LayerNorm] whose first module sits at index
    ``start`` (PatchEncoder's ``batch_to_tokens`` leads with a
    param-less einops ``Rearrange`` at index 0, ref encoders.py:260-265,
    so its LayerNorm/Linear/LayerNorm live at .1/.2/.3)."""
    i, j, k = start, start + 1, start + 2
    out.append((base + ("pre_norm", "scale"), f"{prefix}.{i}.weight", "direct"))
    out.append((base + ("pre_norm", "bias"), f"{prefix}.{i}.bias", "direct"))
    out.append((base + ("proj", "kernel"), f"{prefix}.{j}.weight", "linear"))
    out.append((base + ("proj", "bias"), f"{prefix}.{j}.bias", "direct"))
    out.append((base + ("post_norm", "scale"), f"{prefix}.{k}.weight", "direct"))
    out.append((base + ("post_norm", "bias"), f"{prefix}.{k}.bias", "direct"))


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
        _map_norm_proj_norm(out, base, f"{prefix}.batch_to_tokens", start=1)
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
                    # the reference registers the mean pool as
                    # ``self.attn_pool`` (ref model.py:358, 535), so
                    # its true state_dict keys carry that prefix
                    out.append(
                        ((key, sub, "kernel"), f"attn_pool.proj.{i}.weight", "linear")
                    )
                    if "bias" in tree[sub]:
                        out.append(
                            ((key, sub, "bias"), f"attn_pool.proj.{i}.bias", "direct")
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
            # fallback glob must not pick the optimizer/scheduler/rng
            # files an accelerate save_state dir always carries
            non_model = ("optimizer", "scheduler", "random_state",
                         "scaler", "sampler")
            found = sorted(
                f
                for f in os.listdir(path)
                if f.endswith((".safetensors", ".bin", ".pt"))
                and not f.startswith(non_model)
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


# ---------------------------------------------------------------------------
# Optimizer / scheduler state interop (mid-training continuation)
# ---------------------------------------------------------------------------
#
# ``accelerator.save_state`` (ref train_accel_gpu.py:122-123, :133-134)
# writes, next to the model weights, ``optimizer.bin`` — the torch
# AdamW ``state_dict()`` whose per-parameter entries (``exp_avg`` /
# ``exp_avg_sq`` / ``step``) are keyed by the parameter's INDEX in
# ``model.parameters()`` order — and ``scheduler.bin`` (the HF
# LambdaLR state, ``last_epoch`` = completed optimizer steps).  To
# continue a reference run on TPU mid-stream, we reconstruct that
# parameter order from OUR param tree (the registration order of the
# reference modules is deterministic, see :func:`ref_param_names`),
# route each moment tensor through the same key map as the weights
# (same transposes), and inject the result into the optax state.


def _encoder_ref_param_names(name: str, tree: Dict[str, Any]) -> List[str]:
    """The reference encoder's ``named_parameters()`` order (= its
    module registration order, ref encoders.py) for one modality."""
    prefix = f"encoders.{name}"
    if "value_encoder" in tree:
        # TabularEncoder / SparseTabularEncoder (ref encoders.py:88-89,
        # :113-114): token_encoder, then ContinuousValueEncoder whose
        # submodules register dropout, linear1, activation, linear2,
        # norm (ref encoders.py:46-51)
        return [f"{prefix}.token_encoder.embedding.weight"] + [
            f"{prefix}.value_encoder.{m}.{p}"
            for m in ("linear1", "linear2", "norm")
            for p in ("weight", "bias")
        ]
    if "token_encoder" in tree:
        # SequenceEncoder (ref encoders.py:160-161; PE is a buffer)
        return [f"{prefix}.token_encoder.embedding.weight"]
    if "pos_embedding" in tree:
        # PatchEncoder (ref encoders.py:260-267): batch_to_tokens
        # Sequential [Rearrange, LayerNorm, Linear, LayerNorm] then the
        # learnable positional nn.Embedding
        return [
            f"{prefix}.batch_to_tokens.{i}.{p}"
            for i in (1, 2, 3)
            for p in ("weight", "bias")
        ] + [f"{prefix}.embedding.weight"]
    if "proj" in tree:
        # EmbeddedSequenceEncoder (ref encoders.py:187-193):
        # token_encoder Sequential [LayerNorm, Linear, LayerNorm]
        return [
            f"{prefix}.token_encoder.{i}.{p}"
            for i in (0, 1, 2)
            for p in ("weight", "bias")
        ]
    raise ValueError(
        f"unrecognised encoder param structure for modality "
        f"{name!r}: {sorted(tree)}"
    )


def ref_param_names(
    params: Dict[str, Any], modalities: List[str] | None = None
) -> List[str]:
    """Reference state_dict keys in ``model.parameters()`` order.

    torch registers a module's own ``nn.Parameter`` attributes first
    (MCA: ``fusion_tokens`` then ``return_tokens``, ref
    model.py:343-363), then children in attribute-assignment order:
    ``encoders`` (ModuleDict in encoder_configs order), ``layers``,
    ``norm``, ``attn_pool``, ``loss`` (ref model.py:339-382; EAO
    model.py:523-546 is the same minus the fusion/return tokens).
    ``modalities`` must be the encoder_configs key order of the run
    that produced the checkpoint (YAML insertion order); defaults to
    sorted, which is only correct when that matches — two
    identically-shaped encoders in a non-sorted-order checkpoint would
    silently swap moments, so the default emits a warning whenever it
    could matter.
    """
    p = params.get("params", params)
    special = {
        "fusion_tokens", "return_tokens", "final_norm", "attn_pool",
        "pool", "loss",
    }
    enc_names = [
        k for k in p if not k.startswith("layer_") and k not in special
    ]
    if modalities is not None:
        missing = set(enc_names) - set(modalities)
        if missing:
            raise ValueError(
                f"modalities {sorted(missing)} in params but not in "
                f"the given modality order {modalities}"
            )
        enc_names = [m for m in modalities if m in enc_names]
    else:
        enc_names = sorted(enc_names)
        if len(enc_names) > 1:
            import warnings

            warnings.warn(
                "ref_param_names: no modality order given — assuming "
                "sorted order "
                f"{enc_names}. The reference orders parameters by the "
                "checkpoint's encoder_configs YAML insertion order; if "
                "that differs from sorted, optimizer moments of "
                "identically-shaped encoders would be silently "
                "swapped. Pass modalities= explicitly.",
                stacklevel=2,
            )
    names: List[str] = []
    if "fusion_tokens" in p:
        names.append("fusion_tokens")
    if "return_tokens" in p:
        names.append("return_tokens")
    for m in enc_names:
        names.extend(_encoder_ref_param_names(m, p[m]))
    depth = sum(1 for k in p if k.startswith("layer_"))
    for i in range(depth):
        ff = p[f"layer_{i}"].get("ff", {})
        if isinstance(ff, dict) and "router" in ff:
            raise ValueError(
                "MoE layers have no reference counterpart; a torch "
                "optimizer state cannot be mapped onto them"
            )
        names.extend(
            [
                f"layers.{i}.attn.to_q.weight",
                f"layers.{i}.attn.to_kv.weight",
                f"layers.{i}.attn.to_out.weight",
                f"layers.{i}.ff.feedforward.0.weight",
                f"layers.{i}.ff.feedforward.2.weight",
                f"layers.{i}.norm.gamma",
            ]
        )
    if "final_norm" in p:
        names.append("norm.gamma")
    if "attn_pool" in p:
        names.extend(
            f"attn_pool.{proj}.weight"
            for proj in ("to_q", "to_kv", "to_out")
        )
    if "pool" in p:
        for sub in sorted(
            (s for s in p["pool"] if s.startswith("proj_")),
            key=lambda s: int(s.split("_")[1]),
        ):
            names.append(f"attn_pool.proj.{sub.split('_')[1]}.weight")
            if "bias" in p["pool"][sub]:
                names.append(f"attn_pool.proj.{sub.split('_')[1]}.bias")
    if "loss" in p and "logit_scale" in p["loss"]:
        names.append("loss.loss_fn.logit_scale")
    return names


def _zeros_like_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _zeros_like_tree(v) for k, v in tree.items()}
    return np.zeros(np.shape(tree), np.float32)


def import_optimizer_state(
    opt_sd: Dict[str, Any],
    params: Dict[str, Any],
    *,
    modalities: List[str] | None = None,
    model_sd: Dict[str, Any] | None = None,
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Map a torch AdamW ``state_dict()`` onto our param structure.

    Returns ``(mu_tree, nu_tree, count)``: param-shaped trees of
    ``exp_avg`` / ``exp_avg_sq`` (transposed exactly like their
    parameters) and the optimizer step count.  Parameters the torch
    state has no entry for (never received a gradient) get zero
    moments — matching what torch AdamW would lazily create.

    ``model_sd`` (the model state_dict saved next to the optimizer)
    disambiguates the ``no_fusion`` case, where the reference still
    registers a zero-size ``fusion_tokens`` parameter (ref
    model.py:316, :343) that consumes an optimizer index but has no
    counterpart in our tree.
    """
    p = params.get("params", params)
    names = ref_param_names(params, modalities=modalities)
    if (
        model_sd is not None
        and "fusion_tokens" in model_sd
        and "fusion_tokens" not in p
    ):
        names = ["fusion_tokens"] + names
    idxs = [
        i
        for g in opt_sd.get("param_groups", [])
        for i in g.get("params", [])
    ]
    if idxs and len(idxs) != len(names):
        raise ValueError(
            f"optimizer state covers {len(idxs)} parameters but the "
            f"model maps {len(names)} — wrong config or modality "
            "order for this checkpoint?"
        )
    key_map = {
        key: (path, kind)
        for path, key, kind in build_key_map({"params": p})
    }
    mu = _zeros_like_tree(p)
    nu = _zeros_like_tree(p)
    state = opt_sd.get("state", {})
    count = 0
    for i, name in enumerate(names):
        st = state.get(i, state.get(str(i)))
        if st is None:
            continue
        if "step" in st:
            count = max(count, int(_to_numpy(st["step"]).item()))
        if name not in key_map:
            continue  # zero-size fusion_tokens placeholder
        path, kind = key_map[name]
        for torch_key, tree in (("exp_avg", mu), ("exp_avg_sq", nu)):
            v = _to_numpy(st[torch_key]).astype(np.float32)
            if kind == "linear":
                v = v.T
            dst_shape = np.shape(_get(p, path))
            if v.shape != dst_shape:
                if v.size == 1 and int(np.prod(dst_shape)) == 1:
                    v = v.reshape(dst_shape)
                else:
                    raise ValueError(
                        f"moment shape mismatch for {name}: "
                        f"{v.shape} vs {dst_shape}"
                    )
            _set(tree, path, v)
    return mu, nu, count


def load_accelerate_dir(
    path: str, *, load_model: bool = True
) -> Dict[str, Any]:
    """Load an ``accelerator.save_state`` directory.

    Returns ``{"model": state_dict or None, "optimizer":
    opt_state_dict or None, "scheduler_step": int or None}``.
    ``scheduler_step`` is the HF scheduler's ``last_epoch`` — the
    number of completed optimizer steps (ref train_accel_gpu.py:84-86
    creates the scheduler; save_state snapshots it as
    ``scheduler.bin``).  ``load_model=False`` skips the (large)
    weights file when the caller already holds it.
    """
    import torch

    out: Dict[str, Any] = {
        "model": load_torch_state_dict(path) if load_model else None,
        "optimizer": None,
        "scheduler_step": None,
    }
    opt_path = os.path.join(path, "optimizer.bin")
    if os.path.exists(opt_path):
        out["optimizer"] = torch.load(
            opt_path, map_location="cpu", weights_only=True
        )
    sched_path = os.path.join(path, "scheduler.bin")
    if os.path.exists(sched_path):
        sched = torch.load(
            sched_path, map_location="cpu", weights_only=True
        )
        if isinstance(sched, dict) and "last_epoch" in sched:
            out["scheduler_step"] = int(sched["last_epoch"])
    return out


def fill_adam_state(
    opt_state: Any,
    mu_tree: Dict[str, Any],
    nu_tree: Dict[str, Any],
    count: int,
) -> Any:
    """Inject imported AdamW moments + step count into an optax state.

    Works on every state layout this framework uses: the fused/flat
    single-vector apparatus (``make_flat_apparatus`` — moments are one
    raveled, possibly zero-padded vector), the ``optax.flatten``-ed
    tree optimizer, and the per-leaf FSDP tree state.  The ``count``
    is written to every ``count`` field (scale_by_adam's bias
    correction and scale_by_schedule's LR step — torch AdamW's
    per-param ``step`` and the HF scheduler's ``last_epoch`` advance
    in lockstep with both).  Moment leaves are cast to the template's
    dtypes, so ``moment_dtype: bf16`` states import (lossily) too.
    """
    import jax
    import jax.numpy as jnp
    import optax.tree_utils as otu
    from jax.flatten_util import ravel_pytree

    cur_mu = otu.tree_get(opt_state, "mu")

    def _like(tree, cur):
        if hasattr(cur, "ndim") and cur.ndim == 1:
            flat = ravel_pytree(
                jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
            )[0]
            pad = int(cur.shape[0]) - int(flat.shape[0])
            if pad < 0:
                raise ValueError(
                    f"flat moment vector ({flat.shape[0]}) exceeds the "
                    f"optimizer state's ({cur.shape[0]})"
                )
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,), flat.dtype)]
                )
            return flat.astype(jnp.asarray(cur).dtype)
        # per-leaf tree states (fsdp / fuse_optimizer: false) keep the
        # flax {'params': ...} wrapper in their moment trees; the
        # imported mu/nu trees are the inner dict — re-wrap to match
        if (
            isinstance(cur, dict)
            and "params" in cur
            and not (isinstance(tree, dict) and "params" in tree)
        ):
            tree = {"params": tree}
        return jax.tree.map(
            lambda t, c: jnp.asarray(t, jnp.asarray(c).dtype), tree, cur
        )

    cur_nu = otu.tree_get(opt_state, "nu")
    filled = otu.tree_set(
        opt_state,
        mu=_like(mu_tree, cur_mu),
        nu=_like(nu_tree, cur_nu),
        count=jnp.asarray(count, jnp.int32),
    )
    # tree_set inserts the SAME count array at every count site; the
    # donated train step rejects aliased leaves — copy to distinct
    # buffers (one-time import cost)
    return jax.tree.map(jnp.array, filled)
