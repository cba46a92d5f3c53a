"""Torch-checkpoint interop (mca_tpu.interop + the import CLI).

Pins: the generated key map reproduces the hand-written transplant
oracle exactly (TCGA family); forward parity through the importer for
the CMU/EmbeddedSequence family (new coverage — the hand-written
transplants only covered tabular); state_dict round-trip through
export; and the file-format loader + CLI end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_cmu_like, tiny_config
from mca_tpu.interop import (
    export_state_dict,
    import_state_dict,
    load_torch_state_dict,
)
from mca_tpu.models import build_model

from tests.parity_utils import import_reference_model, transplant


def _tcga_setup(reference_path, batch_size=4):
    torch = pytest.importorskip("torch")
    ref_mod = import_reference_model(reference_path, faithful_loss=True)
    widths = {"a": 6, "b": 3, "c": 5, "d": 4}
    cfg = training_config_from_dict(
        tiny_config("tcga", widths=widths, batch_size=batch_size)
    )
    mc = get_model_config(cfg)
    torch.manual_seed(0)
    ref_enc = {
        m: dict(c, embedding_dim=mc["dim"])
        for m, c in mc["encoder_configs"].items()
    }
    ref = ref_mod.MCA(
        encoder_configs=ref_enc,
        dim=mc["dim"],
        depth=mc["depth"],
        dim_head=mc["dim_head"],
        heads=mc["heads"],
        ff_mult=mc["ff_mult"],
        num_fusion_tokens=mc["num_fusion_tokens"],
        batch_size=batch_size,
        fcl=mc["fcl"],
        fcl_root=mc["fcl_root"],
        fusion_combos=mc["fusion_combos"],
        bimodal_contrastive=mc["bimodal_contrastive"],
        non_fusion_fcl=mc["non_fusion_fcl"],
    )
    ref.eval()
    return cfg, mc, ref, list(widths)


def test_import_matches_handwritten_transplant(
    reference_path, tmp_path, monkeypatch
):
    monkeypatch.chdir(tmp_path)
    cfg, mc, ref, names = _tcga_setup(reference_path)
    from tests.test_model import make_batch

    batch, _ = make_batch(cfg, n=4, p_missing=0.2, seed=1)
    ours = build_model(mc)
    params = jax.jit(ours.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batch)
    )
    oracle = transplant(ref.state_dict(), params, names, mc["depth"])
    imported, report = import_state_dict(ref.state_dict(), params)
    assert not report["missing"]
    flat_a = jax.tree_util.tree_leaves_with_path(oracle)
    flat_b = jax.tree_util.tree_leaves_with_path(imported)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=jax.tree_util.keystr(pa),
        )


def test_export_roundtrip(reference_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg, mc, ref, names = _tcga_setup(reference_path)
    from tests.test_model import make_batch

    batch, _ = make_batch(cfg, n=4, seed=1)
    ours = build_model(mc)
    params = jax.jit(ours.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batch)
    )
    imported, report = import_state_dict(ref.state_dict(), params)
    sd = export_state_dict(imported)
    ref_sd = ref.state_dict()
    assert set(sd) == set(report["matched"])
    for k, v in sd.items():
        np.testing.assert_array_equal(
            v, ref_sd[k].detach().numpy(), err_msg=k
        )


def test_cmu_family_forward_parity_via_importer(
    reference_path, tmp_path, monkeypatch
):
    """EmbeddedSequenceEncoder model imported through interop matches
    the reference forward on pooled embeddings."""
    torch = pytest.importorskip("torch")
    monkeypatch.chdir(tmp_path)
    ref_mod = import_reference_model(reference_path, faithful_loss=True)
    shapes = {"COVAREP": (6, 20), "FACET": (4, 12)}
    cfg = training_config_from_dict(
        tiny_config(
            "cmu",
            shapes=shapes,
            batch_size=4,
            num_fusion_tokens=21,
            fusion_combos=[2, 1],
            fcl_root=[0, 1],
            bimodal_contrastive=False,
            non_fusion_fcl=False,
        )
    )
    mc = get_model_config(cfg)
    torch.manual_seed(0)
    ref_enc = {
        m: dict(c, embedding_dim=mc["dim"])
        for m, c in mc["encoder_configs"].items()
    }
    ref = ref_mod.MCA(
        encoder_configs=ref_enc,
        dim=mc["dim"],
        depth=mc["depth"],
        dim_head=mc["dim_head"],
        heads=mc["heads"],
        ff_mult=mc["ff_mult"],
        num_fusion_tokens=mc["num_fusion_tokens"],
        batch_size=4,
        fcl=mc["fcl"],
        fcl_root=mc["fcl_root"],
        fusion_combos=mc["fusion_combos"],
        bimodal_contrastive=mc["bimodal_contrastive"],
        non_fusion_fcl=mc["non_fusion_fcl"],
    )
    ref.eval()

    samples = make_cmu_like(4, shapes=shapes, p_missing=0.3, seed=3)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch_j = jax.tree.map(jnp.asarray, batch)
    ours = build_model(mc)
    params = jax.jit(ours.init)(jax.random.key(0), batch_j)
    params, report = import_state_dict(ref.state_dict(), params)
    assert not report["missing"]

    out_ours = jax.jit(lambda p, b: ours.apply(p, b, no_loss=True))(
        params, batch_j
    )
    batch_t = {
        m: {k: torch.from_numpy(np.asarray(v)) for k, v in f.items()}
        for m, f in batch.items()
    }
    with torch.no_grad():
        out_ref = ref(batch_t, no_loss=True)
    for m in shapes:
        np.testing.assert_allclose(
            np.asarray(out_ours[m]), out_ref[m].numpy(), atol=2e-4,
            err_msg=f"modality {m}",
        )
    np.testing.assert_allclose(
        np.asarray(out_ours["fusion"]), out_ref["fusion"].numpy(),
        atol=2e-4,
    )


@pytest.mark.slow
def test_train_emits_reference_safetensors(tmp_path, monkeypatch):
    """The training final save also writes a reference-named
    model.safetensors (ref train_accel_gpu.py:187 save_model format)
    consistent with the Orbax params."""
    monkeypatch.chdir(tmp_path)
    from mca_tpu import checkpoint as ckpt_mod
    from mca_tpu.config import dump_configs
    from mca_tpu.data.synthetic import make_tcga_like, to_hf_dataset
    from mca_tpu.train import train

    widths = {"a": 6, "b": 3, "c": 5, "d": 4}
    samples = make_tcga_like(16, widths=widths, seed=0, n_classes=3)
    ds_path = str(tmp_path / "ds")
    to_hf_dataset(samples).save_to_disk(ds_path)
    cfg = training_config_from_dict(
        tiny_config("tcga", widths=widths, batch_size=4, epochs=1)
    )
    cfg.dataset = ds_path
    cfg.output_dir = str(tmp_path / "out")
    cfg.run_eval_loop = False
    dump_configs(cfg, cfg.output_dir)
    train(cfg)

    sd = load_torch_state_dict(str(tmp_path / "out"))
    assert "layers.0.attn.to_q.weight" in sd
    assert "fusion_tokens" in sd
    params = ckpt_mod.load_params(cfg.output_dir)
    np.testing.assert_allclose(
        sd["fusion_tokens"],
        np.asarray(params["params"]["fusion_tokens"]),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        sd["layers.0.ff.feedforward.0.weight"].T,
        np.asarray(
            params["params"]["layer_0"]["ff"]["w_in"]["kernel"]
        ),
        rtol=0, atol=0,
    )


def test_cli_import_and_export(reference_path, tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.chdir(tmp_path)
    cfg, mc, ref, names = _tcga_setup(reference_path)
    import yaml

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            tiny_config(
                "tcga", widths={"a": 6, "b": 3, "c": 5, "d": 4}
            ),
            f,
        )
    ckpt_path = tmp_path / "pytorch_model.bin"
    torch.save(ref.state_dict(), ckpt_path)

    from mca_tpu import checkpoint as ckpt_mod
    from mca_tpu.tools.import_checkpoint import main

    out_dir = tmp_path / "orbax"
    exp_path = tmp_path / "roundtrip.safetensors"
    assert (
        main(
            [
                str(cfg_path),
                str(ckpt_path),
                str(out_dir),
                "--export",
                str(exp_path),
            ]
        )
        == 0
    )
    params = ckpt_mod.load_params(str(out_dir))
    np.testing.assert_array_equal(
        np.asarray(params["params"]["fusion_tokens"]),
        ref.state_dict()["fusion_tokens"].numpy(),
    )
    sd = load_torch_state_dict(str(exp_path))
    np.testing.assert_array_equal(
        sd["layers.0.attn.to_q.weight"],
        ref.state_dict()["layers.0.attn.to_q.weight"].numpy(),
    )

    # directory form: the loader finds the file inside
    sd2 = load_torch_state_dict(str(tmp_path))
    assert "fusion_tokens" in sd2
