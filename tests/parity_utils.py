"""Shared helpers for reference-parity tests: import the (read-only)
reference with stubbed deps, and transplant torch weights into our flax
param tree."""

import sys
import types

import jax
import numpy as np


def import_reference_model(reference_path, faithful_loss=False):
    """Import /root/reference/model.py.

    ``faithful_loss=True`` substitutes a working single-process CLIP
    loss for the missing torchmultimodal dependency (needed for
    training parity); otherwise a bare stub (mask parity only).
    """
    import torch

    if faithful_loss:
        import math

        class ContrastiveLossWithTemperature(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.logit_scale = torch.nn.Parameter(
                    torch.ones([]) * math.log(1 / 0.07)
                )

            def forward(self, a, b, mask=None, **kw):
                self.logit_scale.data.clamp_(0.0, math.log(100.0))
                t = torch.exp(self.logit_scale)
                logits_a = a @ b.t() * t
                logits_b = b @ a.t() * t
                labels = torch.arange(a.shape[0], device=a.device)
                if mask is not None:
                    logits_a = logits_a[mask]
                    logits_b = logits_b[mask]
                    labels = labels[mask]
                ce = torch.nn.functional.cross_entropy
                return (
                    ce(logits_a, labels) + ce(logits_b, labels)
                ) / 2

        loss_cls = ContrastiveLossWithTemperature
    else:

        class loss_cls(torch.nn.Module):  # noqa: N801
            pass

    stub = types.ModuleType(
        "torchmultimodal.modules.losses.contrastive_loss_with_temperature"
    )
    stub.ContrastiveLossWithTemperature = loss_cls
    for name in (
        "torchmultimodal",
        "torchmultimodal.modules",
        "torchmultimodal.modules.losses",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules[stub.__name__] = stub
    sys.path.insert(0, reference_path)
    try:
        import importlib

        ref_model = importlib.import_module("model")
        ref_model = importlib.reload(ref_model)
    finally:
        sys.path.remove(reference_path)
    return ref_model


def transplant(ref_sd, our_params, names, depth):
    """Copy a reference MCA state_dict into our flax param tree."""
    p = jax.tree.map(lambda x: np.asarray(x).copy(), our_params)[
        "params"
    ]

    def t(key):
        return ref_sd[key].detach().numpy()

    for m in names:
        enc = p[m]
        enc["token_encoder"]["embedding"] = t(
            f"encoders.{m}.token_encoder.embedding.weight"
        )
        ve = enc["value_encoder"]
        ve["linear1"]["kernel"] = t(
            f"encoders.{m}.value_encoder.linear1.weight"
        ).T
        ve["linear1"]["bias"] = t(
            f"encoders.{m}.value_encoder.linear1.bias"
        )
        ve["linear2"]["kernel"] = t(
            f"encoders.{m}.value_encoder.linear2.weight"
        ).T
        ve["linear2"]["bias"] = t(
            f"encoders.{m}.value_encoder.linear2.bias"
        )
        ve["norm"]["scale"] = t(
            f"encoders.{m}.value_encoder.norm.weight"
        )
        ve["norm"]["bias"] = t(f"encoders.{m}.value_encoder.norm.bias")
    for i in range(depth):
        layer = p[f"layer_{i}"]
        layer["attn"]["to_q"]["kernel"] = t(
            f"layers.{i}.attn.to_q.weight"
        ).T
        layer["attn"]["to_kv"]["kernel"] = t(
            f"layers.{i}.attn.to_kv.weight"
        ).T
        layer["attn"]["to_out"]["kernel"] = t(
            f"layers.{i}.attn.to_out.weight"
        ).T
        layer["ff"]["w_in"]["kernel"] = t(
            f"layers.{i}.ff.feedforward.0.weight"
        ).T
        layer["ff"]["w_out"]["kernel"] = t(
            f"layers.{i}.ff.feedforward.2.weight"
        ).T
        layer["norm"]["LayerNorm_0"]["scale"] = t(
            f"layers.{i}.norm.gamma"
        )
    p["final_norm"]["LayerNorm_0"]["scale"] = t("norm.gamma")
    if "loss" in p and "loss.loss_fn.logit_scale" in ref_sd:
        p["loss"]["logit_scale"] = t("loss.loss_fn.logit_scale")
    p["fusion_tokens"] = t("fusion_tokens")
    if "return_tokens" in p:
        p["return_tokens"] = t("return_tokens")
        p["attn_pool"]["to_q"]["kernel"] = t("attn_pool.to_q.weight").T
        p["attn_pool"]["to_kv"]["kernel"] = t(
            "attn_pool.to_kv.weight"
        ).T
        p["attn_pool"]["to_out"]["kernel"] = t(
            "attn_pool.to_out.weight"
        ).T
    return {"params": p}
