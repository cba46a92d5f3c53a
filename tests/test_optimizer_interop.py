"""Mid-training continuation from a reference checkpoint.

The reference checkpoints with ``accelerator.save_state`` (ref
train_accel_gpu.py:122-123, :133-134): model weights plus
``optimizer.bin`` (torch AdamW ``exp_avg``/``exp_avg_sq``/``step`` per
parameter, keyed by the parameter's position in ``model.parameters()``)
and ``scheduler.bin`` (HF scheduler, ``last_epoch``).  These tests pin
the full import path: the reconstructed parameter ORDER against torch's
own ``named_parameters()``, and a train-k-steps / save / import /
continue-both-sides trajectory that must coincide to the
test_train_parity tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.train import (
    make_flat_apparatus,
    make_optimizer,
    make_train_step,
)

N_TOTAL = 7
K_SAVE = 3  # torch steps before save_state
LR = 1e-3
WARMUP = 2
CLIP = 2.0
WIDTHS = {"a": 6, "b": 5, "c": 4, "d": 3}


def _tiny_cfg():
    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=WIDTHS,
            batch_size=4,
            num_fusion_tokens=22,
            lr=LR,
            num_warmup_steps=WARMUP,
        )
    )
    cfg.clip = CLIP
    return cfg


def _build_ref(ref_model_mod, mc, seed=0):
    import torch

    torch.manual_seed(seed)
    return ref_model_mod.MCA(
        encoder_configs={
            m: dict(c, embedding_dim=mc["dim"])
            for m, c in mc["encoder_configs"].items()
        },
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
        zorro=False,
    )


def test_ref_param_order_matches_torch(reference_path):
    """ref_param_names must reproduce torch's parameters() order —
    the contract that lets optimizer.bin's integer ids be decoded
    without the torch model present."""
    pytest.importorskip("torch")
    from tests.parity_utils import import_reference_model

    from mca_tpu.interop import ref_param_names

    cfg = _tiny_cfg()
    mc = get_model_config(cfg)
    ref = _build_ref(
        import_reference_model(reference_path, faithful_loss=True), mc
    )
    torch_order = [name for name, _ in ref.named_parameters()]

    ours = build_model(mc)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(
        make_tcga_like(4, widths=WIDTHS, p_missing=0.3, seed=7)
    )
    params = jax.jit(ours.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batch)
    )
    names = ref_param_names(params, modalities=list(WIDTHS))
    assert names == torch_order


def test_flat_state_moment_injection():
    """fill_adam_state on the flat single-vector apparatus: moments
    land raveled (zero tail under padding), counts on every count."""
    import optax.tree_utils as otu
    from jax.flatten_util import ravel_pytree

    from mca_tpu.interop import fill_adam_state

    cfg = _tiny_cfg()
    mc = get_model_config(cfg)
    model = build_model(mc)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(
        make_tcga_like(4, widths=WIDTHS, p_missing=0.3, seed=7)
    )
    batch = jax.tree.map(jnp.asarray, batch)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    flat0, unravel, flat_tx = make_flat_apparatus(
        cfg, N_TOTAL, params, pad_to_multiple=8
    )
    opt0 = flat_tx.init(flat0)
    rng = np.random.default_rng(3)
    mu = jax.tree.map(
        lambda x: rng.standard_normal(np.shape(x)).astype(np.float32),
        params.get("params", params),
    )
    nu = jax.tree.map(lambda x: np.abs(x), mu)
    filled = fill_adam_state(opt0, mu, nu, count=K_SAVE)
    got_mu = np.asarray(otu.tree_get(filled, "mu"))
    want = np.asarray(ravel_pytree(mu)[0])
    np.testing.assert_allclose(got_mu[: want.size], want, rtol=1e-6)
    assert np.all(got_mu[want.size:] == 0)  # padded tail inert
    # EVERY count field (scale_by_adam bias correction AND
    # scale_by_schedule) must land on the imported step
    counts = otu.tree_get_all_with_path(filled, "count")
    assert counts and all(int(v) == K_SAVE for _, v in counts)


def test_tree_state_moment_injection():
    """fill_adam_state on the PER-LEAF tree optimizer (fsdp /
    fuse_optimizer: false): the state's moment trees carry the flax
    {'params': ...} wrapper while the imported mu/nu are the inner
    dict — the wrapper must be re-applied, not crash (code-review r4
    finding)."""
    import optax.tree_utils as otu

    from mca_tpu.interop import fill_adam_state

    cfg = _tiny_cfg()
    cfg.fuse_optimizer = False
    mc = get_model_config(cfg)
    model = build_model(mc)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(
        make_tcga_like(4, widths=WIDTHS, p_missing=0.3, seed=7)
    )
    params = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batch)
    )
    tx = make_optimizer(cfg, N_TOTAL)
    opt0 = tx.init(params)
    rng = np.random.default_rng(5)
    mu = jax.tree.map(
        lambda x: rng.standard_normal(np.shape(x)).astype(np.float32),
        params["params"],
    )
    nu = jax.tree.map(lambda x: np.abs(x), mu)
    filled = fill_adam_state(opt0, mu, nu, count=K_SAVE)
    got = otu.tree_get(filled, "mu")
    assert isinstance(got, dict) and "params" in got
    np.testing.assert_allclose(
        np.asarray(got["params"]["fusion_tokens"]),
        mu["fusion_tokens"],
        rtol=1e-6,
    )
    counts = otu.tree_get_all_with_path(filled, "count")
    assert counts and all(int(v) == K_SAVE for _, v in counts)


@pytest.mark.slow
def test_midstream_continuation_matches_reference(
    reference_path, tmp_path
):
    """Train the torch reference K steps, save_state (accelerate file
    layout), import weights+moments+step, continue BOTH sides — the
    continued loss trajectories must coincide (VERDICT r3 item 3)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tests.parity_utils import import_reference_model

    from mca_tpu.interop import (
        fill_adam_state,
        import_optimizer_state,
        import_state_dict,
        load_accelerate_dir,
    )

    ref_model_mod = import_reference_model(
        reference_path, faithful_loss=True
    )
    cfg = _tiny_cfg()
    mc = get_model_config(cfg)

    batches = [
        MultimodalCollator(cfg.modality_config.to_plain())(
            make_tcga_like(4, widths=WIDTHS, p_missing=0.3, seed=100 + s)
        )
        for s in range(N_TOTAL)
    ]

    # ---- torch side: K_SAVE steps, save, continue ------------------
    ref = _build_ref(ref_model_mod, mc)
    ref.train()
    opt = torch.optim.AdamW(ref.parameters(), lr=LR)
    sched = transformers.get_scheduler(
        "cosine",
        optimizer=opt,
        num_warmup_steps=WARMUP,
        num_training_steps=N_TOTAL,
    )
    real_save = torch.save
    torch.save = lambda *a, **k: None  # ref's per-forward debug save
    ref_losses = []
    save_dir = tmp_path / "ckpt"
    save_dir.mkdir()
    try:
        for s, batch in enumerate(batches):
            if s == K_SAVE:
                # accelerate save_state file layout
                real_save(
                    ref.state_dict(), save_dir / "pytorch_model.bin"
                )
                real_save(
                    opt.state_dict(), save_dir / "optimizer.bin"
                )
                real_save(
                    sched.state_dict(), save_dir / "scheduler.bin"
                )
            tb = {
                m: {
                    k: torch.from_numpy(np.asarray(v))
                    for k, v in fields.items()
                }
                for m, fields in batch.items()
            }
            loss = ref(tb)["loss"]
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
            opt.step()
            sched.step()
            ref_losses.append(float(loss))
    finally:
        torch.save = real_save

    # ---- our side: import at K_SAVE, continue ----------------------
    saved = load_accelerate_dir(str(save_dir))
    assert saved["optimizer"] is not None
    assert saved["scheduler_step"] == K_SAVE

    ours = build_model(mc)
    batch0 = jax.tree.map(jnp.asarray, batches[0])
    params = jax.jit(ours.init)(jax.random.key(1), batch0)
    params, report = import_state_dict(saved["model"], params)
    assert not report["missing"]
    mu, nu, opt_count = import_optimizer_state(
        saved["optimizer"],
        params,
        modalities=list(WIDTHS),
        model_sd=saved["model"],
    )
    assert opt_count == K_SAVE
    # every torch moment must be non-trivially imported: after 3 AdamW
    # steps no parameter's second moment is exactly zero
    assert all(
        float(np.abs(x).max()) > 0 for x in jax.tree.leaves(nu)
    )

    tx = make_optimizer(cfg, N_TOTAL)
    opt_state = fill_adam_state(
        tx.init(params), mu, nu, saved["scheduler_step"]
    )
    state = {
        "params": jax.tree.map(jnp.asarray, params),
        "opt_state": opt_state,
        "step": jnp.asarray(saved["scheduler_step"], jnp.int32),
    }
    from mca_tpu.train import hf_lr_schedule

    step_fn = make_train_step(
        ours, tx, hf_lr_schedule("cosine", LR, WARMUP, N_TOTAL)
    )
    our_losses = []
    for batch in batches[K_SAVE:]:
        state, metrics = step_fn(
            state, jax.tree.map(jnp.asarray, batch)
        )
        our_losses.append(float(metrics["total_loss"]))

    np.testing.assert_allclose(
        our_losses,
        ref_losses[K_SAVE:],
        rtol=2e-3,
        err_msg=(
            f"continued ours={our_losses} "
            f"ref={ref_losses[K_SAVE:]} (pre-save {ref_losses[:K_SAVE]})"
        ),
    )
    assert abs(our_losses[-1] - our_losses[0]) > 1e-4


def test_import_checkpoint_tool_with_optimizer(tmp_path):
    """End-to-end CLI wiring: a synthesized accelerate save_state dir
    (reference-named weights + torch AdamW state dict + scheduler)
    imports into a restorable full train-state checkpoint."""
    torch = pytest.importorskip("torch")
    import yaml

    import optax.tree_utils as otu

    from mca_tpu import checkpoint as ckpt
    from mca_tpu.data.synthetic import tiny_config
    from mca_tpu.interop import export_state_dict, ref_param_names
    from mca_tpu.tools.import_checkpoint import main as tool_main

    cfg_dict = tiny_config(
        "tcga", widths=WIDTHS, batch_size=4, num_fusion_tokens=22
    )
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))

    cfg = training_config_from_dict(cfg_dict)
    mc = get_model_config(cfg)
    model = build_model(mc)
    batch = MultimodalCollator(cfg.modality_config.to_plain())(
        make_tcga_like(4, widths=WIDTHS, p_missing=0.3, seed=7)
    )
    params = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batch)
    )

    # synthesize the accelerate dir from OUR params
    sd = export_state_dict(params)
    save_dir = tmp_path / "acc"
    save_dir.mkdir()
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        save_dir / "pytorch_model.bin",
    )
    names = ref_param_names(params, modalities=list(WIDTHS))
    rng = np.random.default_rng(0)
    opt_sd = {
        "state": {
            i: {
                "step": torch.tensor(5.0),
                "exp_avg": torch.from_numpy(
                    np.asarray(
                        rng.standard_normal(sd[n].shape), np.float32
                    )
                ),
                "exp_avg_sq": torch.from_numpy(
                    np.asarray(
                        np.abs(rng.standard_normal(sd[n].shape)),
                        np.float32,
                    )
                ),
            }
            for i, n in enumerate(names)
        },
        "param_groups": [
            {"params": list(range(len(names))), "lr": LR}
        ],
    }
    torch.save(opt_sd, save_dir / "optimizer.bin")
    torch.save({"last_epoch": 5}, save_dir / "scheduler.bin")

    out_dir = tmp_path / "orbax"
    rc = tool_main(
        [
            str(cfg_path),
            str(save_dir),
            str(out_dir),
            "--with-optimizer",
        ]
    )
    assert rc == 0
    restored = ckpt.load_state(str(out_dir))
    assert int(np.asarray(restored["step"])) == 5
    counts = otu.tree_get_all_with_path(restored["opt_state"], "count")
    assert counts and all(int(v) == 5 for _, v in counts)
    mu_flat = np.asarray(otu.tree_get(restored["opt_state"], "mu"))
    # the first named parameter is fusion_tokens — its exp_avg must
    # sit at the head of the raveled moment vector iff tree order and
    # ravel order agree
    from jax.flatten_util import ravel_pytree

    want_first = np.asarray(
        opt_sd["state"][names.index("fusion_tokens")]["exp_avg"]
    ).ravel()
    flat_params, _ = ravel_pytree(params)
    assert mu_flat.shape == flat_params.shape
    # locate fusion_tokens' offset in the ravel order
    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(params)
    off = 0
    for path, leaf in leaves:
        if "fusion_tokens" in jtu.keystr(path):
            break
        off += int(np.size(leaf))
    np.testing.assert_allclose(
        mu_flat[off : off + want_first.size], want_first, rtol=1e-6
    )
