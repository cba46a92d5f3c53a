"""EAO forward parity vs the reference via weight transplant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.losses import combo_key
from mca_tpu.models import build_model
from tests.parity_utils import import_reference_model


def _transplant_eao(ref_sd, our_params, names, depth):
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
        for lin in ("linear1", "linear2"):
            ve[lin]["kernel"] = t(
                f"encoders.{m}.value_encoder.{lin}.weight"
            ).T
            ve[lin]["bias"] = t(
                f"encoders.{m}.value_encoder.{lin}.bias"
            )
        ve["norm"]["scale"] = t(
            f"encoders.{m}.value_encoder.norm.weight"
        )
        ve["norm"]["bias"] = t(f"encoders.{m}.value_encoder.norm.bias")
    for i in range(depth):
        layer = p[f"layer_{i}"]
        for proj in ("to_q", "to_kv", "to_out"):
            layer["attn"][proj]["kernel"] = t(
                f"layers.{i}.attn.{proj}.weight"
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
    return {"params": p}


def test_eao_forward_parity(reference_path, tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    ref_mod = import_reference_model(reference_path)
    monkeypatch.chdir(tmp_path)

    widths = {"a": 6, "b": 5, "c": 4, "d": 3}
    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=widths,
            batch_size=4,
            eao=True,
            no_fusion=True,
            mean_pool=True,
            num_fusion_tokens=0,
            fusion_combos=[2],
            fcl_root=[0, 1],
        )
    )
    mc = get_model_config(cfg)
    names = list(widths)

    torch.manual_seed(1)
    ref = ref_mod.EAO(
        encoder_configs={
            m: dict(c, embedding_dim=mc["dim"])
            for m, c in mc["encoder_configs"].items()
        },
        dim=mc["dim"],
        depth=mc["depth"],
        dim_head=mc["dim_head"],
        heads=mc["heads"],
        ff_mult=mc["ff_mult"],
        num_fusion_tokens=0,
        batch_size=4,
        fcl=mc["fcl"],
        fcl_root=mc["fcl_root"],
        fusion_combos=mc["fusion_combos"],
        no_fusion=True,
        mean_pool=True,
    )
    ref.eval()

    ours = build_model(mc)
    batch_np = MultimodalCollator(cfg.modality_config.to_plain())(
        make_tcga_like(4, widths=widths, p_missing=0.3, seed=7)
    )
    batch = jax.tree.map(jnp.asarray, batch_np)
    params = jax.jit(ours.init)(jax.random.key(0), batch)
    params = _transplant_eao(
        ref.state_dict(), params, names, mc["depth"]
    )
    out_ours = jax.jit(
        lambda p, b: ours.apply(p, b, no_loss=True)
    )(params, batch)

    batch_torch = {
        m: {
            k: torch.from_numpy(np.asarray(v))
            for k, v in fields.items()
        }
        for m, fields in batch_np.items()
    }
    with torch.no_grad():
        out_ref = ref(batch_torch, no_loss=True)

    for m in names:
        np.testing.assert_allclose(
            np.asarray(out_ours[m]),
            out_ref[m].numpy(),
            atol=2e-4,
            err_msg=f"modality {m}",
        )
    for combo in ref.fusion_combos:
        np.testing.assert_allclose(
            np.asarray(out_ours[combo_key(combo)]),
            out_ref[combo].numpy(),
            atol=2e-4,
            err_msg=f"combo {sorted(combo)}",
        )


@pytest.mark.slow
def test_eao_channel_grouping_exact():
    """group_channels=True (equal-length channels stacked on the batch
    axis) must be bit-equivalent in fp32 to the sequential per-channel
    passes; the canonical TCGA-EAO channel set actually groups."""
    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            # gene/methylation equal-width -> groupable channels
            widths={"gene": 12, "protein": 8, "methylation": 12, "mirna": 6},
            batch_size=4,
            eao=True,
            no_fusion=True,
            mean_pool=True,
            num_fusion_tokens=0,
            fusion_combos=[2],
            fcl_root=[0, 1],
            fcl=True,
            precision="fp32",
            attention_impl="dense",
        )
    )
    mc = get_model_config(cfg)
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(4, widths=widths, p_missing=0.25, seed=0)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)

    grouped = build_model(dict(mc, group_channels=True))
    sequential = build_model(dict(mc, group_channels=False))
    params = jax.jit(grouped.init)(jax.random.key(0), batch)
    out_g = jax.jit(lambda p, b: grouped.apply(p, b))(params, batch)
    out_s = jax.jit(lambda p, b: sequential.apply(p, b))(params, batch)
    # not bit-identical: XLA fuses/orders reductions differently at
    # the stacked batch size; per-sample math is unchanged
    np.testing.assert_allclose(
        np.asarray(out_g["loss"]), np.asarray(out_s["loss"]), rtol=1e-5
    )
    for k in out_g["losses"]:
        np.testing.assert_allclose(
            np.asarray(out_g["losses"][k]),
            np.asarray(out_s["losses"][k]),
            rtol=5e-5,
        )
