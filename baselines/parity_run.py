"""Full-pipeline cross-implementation parity harness (VERDICT r1 item 2).

Runs BOTH implementations end-to-end on the IDENTICAL clustered-synthetic
TCGA dataset and compares:

1. pretraining loss trajectories (same transplanted init, same batch
   sequence, same AdamW/cosine/clip — ref train_accel_gpu.py:80-134),
2. inference embeddings (each side's own pipeline writes reference-format
   ``.pt`` files — ref infer_accel_gpu.py:131-136),
3. probe metrics, 2x2: {our probe.py, faithful torch re-enactment of
   lp_accel_gpu.py} x {our embeddings, torch embeddings}, with the
   CANONICAL TCGA probe hyperparameters (linear head, BCE, task=-1,
   lr 1e-4, epochs 10001, batch 1024 — ref configs/TCGA_60i_eval.yaml +
   utils/config.py:129-153 defaults), plus the ridge head for context.

The reference's real datasets are unavailable (no egress), so this is
the strongest available parity pin: identical data, full pipelines,
metric tables ours-vs-torch.  Writes ``parity_results.json`` and the
tables for PARITY_RUN.md.

Run on CPU (forced in-process):
    python baselines/parity_run.py [--steps-scale 1.0] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from mca_tpu.config import (  # noqa: E402
    get_model_config,
    training_config_from_dict,
)
from mca_tpu.data.collators import MultimodalCollator  # noqa: E402
from mca_tpu.data.synthetic import make_tcga_like, tiny_config  # noqa: E402
from mca_tpu.infer import _save, _save_array  # noqa: E402
from mca_tpu.metrics import binary_metrics  # noqa: E402
from mca_tpu.models import build_model  # noqa: E402
from parity_utils import import_reference_model, transplant  # noqa: E402

# ---------------------------------------------------------------------------
# Scales: mid-size model the torch CPU can train in ~15 min
# ---------------------------------------------------------------------------
WIDTHS = {"gene": 120, "protein": 60, "methylation": 100, "mirna": 80}
N_SAMPLES = 2048
SPLIT = 0.25  # eval fraction
BATCH = 16
EPOCHS = 4
LR = 1e-4
WARMUP = 40
CLIP = 2.0
DIM, LAYERS, HEADS, DIM_HEAD, FUSION = 128, 3, 4, 32, 22

PROBE = {  # canonical TCGA probe (ref TCGA_60i_eval.yaml + defaults)
    "model_type": "linear",
    "loss_type": "BCE",
    "task": -1,
    "lr": 1e-4,
    "epochs": 10001,
    "batch_size": 1024,
    "lr_scheduler_type": "cosine",
    "num_warmup_steps": 1000,
    "clip": 2.0,
    "seed": 42,
}


def build_dataset():
    samples = make_tcga_like(
        N_SAMPLES,
        widths=WIDTHS,
        p_missing=0.25,
        seed=0,
        n_classes=5,
        clustered=True,
    )
    n_eval = int(N_SAMPLES * SPLIT)
    return samples[n_eval:], samples[:n_eval]


def collate_all(samples, collator, batch_size, order=None):
    idx = np.arange(len(samples)) if order is None else order
    batches = []
    for s in range(len(idx) // batch_size):  # drop_last (ref infer :70)
        chunk = [samples[i] for i in idx[s * batch_size : (s + 1) * batch_size]]
        batches.append(collator(chunk))
    return batches


def to_torch(batch):
    return {
        m: {k: torch.from_numpy(np.asarray(v)) for k, v in f.items()}
        for m, f in batch.items()
    }


def split_labels(batch):
    batch = dict(batch)
    labels = batch.pop("Labels")
    return batch, np.asarray(labels["values"])


# ---------------------------------------------------------------------------
# Torch reference pipeline (its model/loss/opt/schedule, driver re-enacted)
# ---------------------------------------------------------------------------


def build_ref_model(mc, ref_mod):
    torch.manual_seed(0)
    return ref_mod.MCA(
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
        batch_size=BATCH,
        fcl=mc["fcl"],
        fcl_root=mc["fcl_root"],
        fusion_combos=mc["fusion_combos"],
        bimodal_contrastive=mc["bimodal_contrastive"],
        non_fusion_fcl=mc["non_fusion_fcl"],
        zorro=False,
    )


def torch_train(ref, train_batches, n_steps):
    import transformers

    ref.train()
    opt = torch.optim.AdamW(ref.parameters(), lr=LR)
    sched = transformers.get_scheduler(
        "cosine",
        optimizer=opt,
        num_warmup_steps=WARMUP,
        num_training_steps=n_steps,
    )
    losses = []
    real_save = torch.save
    torch.save = lambda *a, **k: None  # ref model.py per-forward debug save
    try:
        t0 = time.time()
        for step, (batch, _) in enumerate(train_batches):
            out = ref(to_torch(batch))
            loss = out["loss"]
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
            opt.step()
            sched.step()
            losses.append(float(loss))
            if step % 32 == 0:
                print(
                    f"[torch train] step {step}/{n_steps} "
                    f"loss {losses[-1]:.4f} "
                    f"({(time.time() - t0) / (step + 1):.2f}s/step)",
                    flush=True,
                )
    finally:
        torch.save = real_save
    return losses


def torch_infer(ref, batches, out_dir, split):
    """Re-enact infer_accel_gpu.py:97-136 with the torch model."""
    from collections import defaultdict

    ref.eval()
    embeddings, masks, labels = defaultdict(list), defaultdict(list), []
    real_save = torch.save
    torch.save = lambda *a, **k: None
    try:
        with torch.no_grad():
            for batch, y in batches:
                out = ref(to_torch(batch))
                out.pop("loss")
                out.pop("losses")
                out.pop("fcl_loss", None)
                out.pop("no-fcl_loss", None)
                mm = out.pop("modality_sample_mask")
                for k, v in out.items():
                    embeddings[k].append(v.detach().cpu())
                for k, v in mm.items():
                    masks[k].append(v.detach().cpu())
                labels.append(torch.from_numpy(y))
    finally:
        torch.save = real_save
    torch.save(
        {k: torch.cat(v) for k, v in masks.items()},
        f"{out_dir}/{split}_masks.pt",
    )
    torch.save(
        {k: torch.cat(v) for k, v in embeddings.items()},
        f"{out_dir}/{split}_embeddings.pt",
    )
    torch.save(torch.cat(labels), f"{out_dir}/{split}_labels.pt")


def torch_probe(emb_dir):
    """Faithful re-enactment of lp_accel_gpu.py:57-231 (linear/BCE/task -1),
    metrics via our tested numpy suite (torchmetrics not installed)."""
    import transformers

    cfg = PROBE
    e_train = torch.load(
        f"{emb_dir}/train_embeddings.pt", map_location="cpu",
        weights_only=False,
    )
    s_train = torch.load(
        f"{emb_dir}/train_labels.pt", map_location="cpu",
        weights_only=False,
    ).squeeze()
    e_test = torch.load(
        f"{emb_dir}/eval_embeddings.pt", map_location="cpu",
        weights_only=False,
    )
    s_test = torch.load(
        f"{emb_dir}/eval_labels.pt", map_location="cpu",
        weights_only=False,
    ).squeeze()

    torch.manual_seed(cfg["seed"])

    class FineTuneDataset(torch.utils.data.Dataset):
        def __init__(self, embeddings, labels, key="fusion", index=0):
            self.embeddings = embeddings[key]
            self.labels = labels if index == -1 else labels[:, index]

        def __len__(self):
            return self.labels.shape[0]

        def __getitem__(self, idx):
            return self.embeddings[idx], self.labels[idx]

    train_dl = torch.utils.data.DataLoader(
        FineTuneDataset(e_train, s_train, index=cfg["task"]),
        batch_size=cfg["batch_size"],
        shuffle=True,
    )
    eval_dl = torch.utils.data.DataLoader(
        FineTuneDataset(e_test, s_test, index=cfg["task"]),
        batch_size=cfg["batch_size"],
    )
    e, l = next(iter(train_dl))
    num_labels = l.shape[1] if l.ndim > 1 else 1
    model = torch.nn.Linear(e.shape[1], num_labels)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    n_steps = cfg["epochs"] * len(train_dl)
    opt = torch.optim.AdamW(model.parameters(), lr=cfg["lr"])
    sched = transformers.get_scheduler(
        cfg["lr_scheduler_type"],
        optimizer=opt,
        num_warmup_steps=cfg["num_warmup_steps"],
        num_training_steps=n_steps,
    )
    for epoch in range(cfg["epochs"]):
        model.train()
        for emb, lab in train_dl:
            pred = model(emb).squeeze()
            loss = loss_fn(pred, lab)
            opt.zero_grad()
            loss.backward()
            if cfg["clip"]:
                torch.nn.utils.clip_grad_norm_(
                    model.parameters(), cfg["clip"]
                )
            opt.step()
            sched.step()
    model.eval()
    with torch.no_grad():
        tr = model(e_train["fusion"]).squeeze().numpy()
        te = model(e_test["fusion"]).squeeze().numpy()
    out = {}
    for split, lg, y in (
        ("train", tr, s_train.numpy()),
        ("eval", te, s_test.numpy()),
    ):
        m = binary_metrics(lg, y)
        out.update({f"{split}_{k}": v for k, v in m.items() if k != "cm"})
    return out


# ---------------------------------------------------------------------------
# Our pipeline
# ---------------------------------------------------------------------------


def our_train(cfg, model, params0, train_batches, n_steps):
    from mca_tpu.train import (
        hf_lr_schedule,
        make_optimizer,
        make_train_step,
    )

    tx = make_optimizer(cfg, n_steps)
    schedule = hf_lr_schedule("cosine", LR, WARMUP, n_steps)
    state = {
        "params": jax.tree.map(jnp.asarray, params0),
        "opt_state": tx.init(params0),
        "step": jnp.zeros((), jnp.int32),
    }
    step_fn = make_train_step(model, tx, schedule)
    losses = []
    t0 = time.time()
    for step, (batch, _) in enumerate(train_batches):
        state, metrics = step_fn(state, jax.tree.map(jnp.asarray, batch))
        losses.append(float(metrics["total_loss"]))
        if step % 32 == 0:
            print(
                f"[ours train] step {step}/{n_steps} "
                f"loss {losses[-1]:.4f} "
                f"({(time.time() - t0) / (step + 1):.2f}s/step)",
                flush=True,
            )
    return state["params"], losses


def our_infer(model, params, batches, out_dir, split):
    """Mirror of mca_tpu.infer's collection on pre-collated batches."""
    from collections import defaultdict

    from mca_tpu.infer import combo_str_to_frozenset

    apply = jax.jit(lambda p, b: model.apply(p, b))
    embeddings, masks, labels = defaultdict(list), defaultdict(list), []
    for batch, y in batches:
        out = jax.device_get(apply(params, jax.tree.map(jnp.asarray, batch)))
        mm = out.pop("modality_sample_mask")
        for k in ("loss", "losses", "fcl_loss", "no-fcl_loss"):
            out.pop(k, None)
        for k, v in out.items():
            key = (
                combo_str_to_frozenset(k)
                if str(k).startswith("combo:")
                else k
            )
            embeddings[key].append(np.asarray(v))
        for k, v in mm.items():
            masks[k].append(np.asarray(v))
        labels.append(y)
    _save(
        {k: np.concatenate(v) for k, v in masks.items()},
        f"{out_dir}/{split}_masks",
    )
    _save(
        {k: np.concatenate(v) for k, v in embeddings.items()},
        f"{out_dir}/{split}_embeddings",
    )
    _save_array(np.concatenate(labels), f"{out_dir}/{split}_labels")


def our_probe(emb_dir, model_type="linear"):
    from mca_tpu.config import get_cfg_defaults_embedding_eval
    from mca_tpu.probe import probe

    pcfg = get_cfg_defaults_embedding_eval()
    pcfg.embedding_dir = emb_dir
    pcfg.output_dir = os.path.join(emb_dir, f"probe_{model_type}")
    for k, v in PROBE.items():
        setattr(pcfg, k, v)
    pcfg.model_type = model_type
    pcfg.rank_metrics = False
    return probe(pcfg)


# ---------------------------------------------------------------------------


def main():
    global N_SAMPLES
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity_run")
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="tiny fast pass to validate harness plumbing",
    )
    args = ap.parse_args()
    if args.smoke:
        N_SAMPLES = 128
        PROBE["epochs"] = 20
        PROBE["num_warmup_steps"] = 5
        args.steps_scale = min(args.steps_scale, 0.25)
    os.makedirs(args.out, exist_ok=True)
    ours_dir = os.path.join(args.out, "ours")
    ref_dir = os.path.join(args.out, "torch")
    os.makedirs(ours_dir, exist_ok=True)
    os.makedirs(ref_dir, exist_ok=True)

    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=WIDTHS,
            batch_size=BATCH,
            hidden=DIM,
            heads=HEADS,
            dim_head=DIM_HEAD,
            layers=LAYERS,
            num_fusion_tokens=FUSION,
            lr=LR,
            num_warmup_steps=WARMUP,
        )
    )
    cfg.clip = CLIP
    cfg.output_dir = args.out
    mc = get_model_config(cfg)
    collator = MultimodalCollator(
        cfg.modality_config.to_plain(), labels="Labels"
    )

    train_samples, eval_samples = build_dataset()
    epochs = max(int(EPOCHS * args.steps_scale), 1)
    rng = np.random.default_rng(7)
    train_batches = []
    for _ in range(epochs):
        order = rng.permutation(len(train_samples))
        train_batches += [
            (b, split_labels(b)[1])
            for b in collate_all(train_samples, collator, BATCH, order)
        ]
    # strip Labels from the model inputs, keep them for infer
    train_batches = [
        (split_labels(b)[0], y) for b, y in train_batches
    ]
    infer_train = [
        (split_labels(b)[0], split_labels(b)[1])
        for b in collate_all(train_samples, collator, BATCH)
    ]
    infer_eval = [
        (split_labels(b)[0], split_labels(b)[1])
        for b in collate_all(eval_samples, collator, BATCH)
    ]
    n_steps = len(train_batches)
    print(f"dataset: {len(train_samples)} train / {len(eval_samples)} eval, "
          f"{n_steps} steps", flush=True)

    ref_mod = import_reference_model("/root/reference", faithful_loss=True)
    ref = build_ref_model(mc, ref_mod)
    ref_init = build_ref_model(mc, ref_mod)  # same manual_seed -> same init

    # ---- our side: transplant the SAME initial weights ----
    ours = build_model(mc)
    batch0 = jax.tree.map(jnp.asarray, train_batches[0][0])
    params = jax.jit(ours.init)(jax.random.key(0), batch0)
    params = transplant(
        ref_init.state_dict(), params, list(WIDTHS), mc["depth"]
    )

    print("=== our training ===", flush=True)
    t0 = time.time()
    our_params, our_losses = our_train(cfg, ours, params, train_batches, n_steps)
    our_train_time = time.time() - t0
    print("=== our inference ===", flush=True)
    our_infer(ours, our_params, infer_train, ours_dir, "train")
    our_infer(ours, our_params, infer_eval, ours_dir, "eval")

    print("=== torch training ===", flush=True)
    t0 = time.time()
    ref_losses = torch_train(ref, train_batches, n_steps)
    ref_train_time = time.time() - t0
    print("=== torch inference ===", flush=True)
    torch_infer(ref, infer_train, ref_dir, "train")
    torch_infer(ref, infer_eval, ref_dir, "eval")

    # ---- trajectory comparison ----
    ol, rl = np.asarray(our_losses), np.asarray(ref_losses)
    rel = np.abs(ol - rl) / np.abs(rl)
    traj = {
        "n_steps": n_steps,
        "first_loss": [float(ol[0]), float(rl[0])],
        "final_loss": [float(ol[-1]), float(rl[-1])],
        "max_rel_diff_first_50": float(rel[:50].max()),
        "mean_rel_diff": float(rel.mean()),
        "final_rel_diff": float(rel[-1]),
        "our_train_time_s": our_train_time,
        "torch_train_time_s": ref_train_time,
    }
    print(json.dumps(traj, indent=2), flush=True)

    # ---- probes: 2x2 + ridge ----
    results = {"trajectory": traj, "probes": {}}
    for emb_name, emb_dir in (("ours", ours_dir), ("torch", ref_dir)):
        print(f"=== probes on {emb_name} embeddings ===", flush=True)
        results["probes"][f"our_sgd_on_{emb_name}"] = our_probe(
            emb_dir, "linear"
        )
        results["probes"][f"torch_sgd_on_{emb_name}"] = torch_probe(emb_dir)
        results["probes"][f"our_ridge_on_{emb_name}"] = our_probe(
            emb_dir, "ridge"
        )
    with open(os.path.join(args.out, "parity_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("WROTE", os.path.join(args.out, "parity_results.json"), flush=True)

    for name, m in results["probes"].items():
        keep = {
            k: round(float(v), 4)
            for k, v in m.items()
            if any(s in k for s in ("accuracy", "f1", "auroc", "loss"))
        }
        print(name, keep, flush=True)


if __name__ == "__main__":
    main()
