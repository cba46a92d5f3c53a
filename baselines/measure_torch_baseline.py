"""Measure the PyTorch reference's training throughput on available
hardware (CPU in this image; no torch-xla, no GPU).

The reference repo ships no benchmark numbers (BASELINE.md), so the
throughput baseline must be measured.  This harness imports the
reference's own ``model.py`` (read-only) with its missing
``torchmultimodal`` dependency replaced by a faithful local CLIP-loss
implementation, builds the canonical TCGA_config1 model (dim 512,
5 layers, batch 8, packed seq 2548), and times forward+backward+AdamW
steps on a synthetic batch.

Methodology notes (recorded in the output JSON):
- the reference's per-forward ``torch.save`` debug call
  (ref model.py:94) is patched out — timing it would unfairly slow the
  baseline;
- torch runs with its default CPU threading; this image exposes ONE
  CPU core (verified: os.sched_getaffinity == {0}), so 1 torch thread
  IS every core the machine has — there is no multi-threaded
  configuration to measure;
- a best-effort ``torch.compile`` variant is also attempted
  (--compile / second positional arg); the stronger of the two numbers
  becomes ``tokens_per_sec`` with both recorded.

Usage: python baselines/measure_torch_baseline.py [n_steps] [--compile]
Writes BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def install_stub(torch):
    """Minimal single-process CLIP loss standing in for torchmultimodal."""

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
            return (ce(logits_a, labels) + ce(logits_b, labels)) / 2

    stub = types.ModuleType(
        "torchmultimodal.modules.losses.contrastive_loss_with_temperature"
    )
    stub.ContrastiveLossWithTemperature = ContrastiveLossWithTemperature
    for name in (
        "torchmultimodal",
        "torchmultimodal.modules",
        "torchmultimodal.modules.losses",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules[stub.__name__] = stub


def main(n_steps: int = 3, try_compile: bool = False) -> dict:
    import numpy as np
    import torch

    install_stub(torch)
    # patch out the reference's per-forward debug torch.save
    # (model.py:94) so the baseline is not unfairly slowed
    real_save = torch.save
    torch.save = lambda *a, **k: None
    sys.path.insert(0, REFERENCE)
    import importlib

    ref_model = importlib.import_module("model")

    widths = {"gene": 800, "protein": 198, "methylation": 800, "mirna": 662}
    encoder_configs = {
        m: {
            "type": "TabularEncoder",
            "num_embeddings": w,
            "max_tokens": w,
            "max_value": 100,
        }
        for m, w in widths.items()
    }
    batch_size = 8
    model = ref_model.MCA(
        encoder_configs=encoder_configs,
        dim=512,
        depth=5,
        dim_head=64,
        heads=8,
        num_fusion_tokens=88,
        batch_size=batch_size,
        fcl=True,
        fcl_root=[0, 1, 2, 3],
        fusion_combos=[4, 3, 2],
        bimodal_contrastive=True,
        non_fusion_fcl=True,
        zorro=False,
    )
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

    rng = np.random.default_rng(0)
    batch = {}
    for m, w in widths.items():
        vals = rng.normal(size=(batch_size, w)).astype(np.float32)
        batch[m] = {
            "values": torch.from_numpy(vals),
            "attention_mask": torch.zeros(
                batch_size, w, dtype=torch.long
            ),
        }

    seq_len = sum(widths.values()) + 88
    tokens_per_step = batch_size * seq_len

    def timed_steps(step_fn, tag):
        times = []
        for i in range(n_steps + 1):
            t0 = time.perf_counter()
            loss = step_fn()
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
            print(
                f"{tag} step {i}: {dt:.2f}s loss={float(loss):.4f}",
                flush=True,
            )
        return float(np.median(times))

    def eager_step():
        out = model(batch)
        loss = out["loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    step_time = timed_steps(eager_step, "eager")
    compiled_step_time = None
    if try_compile:
        try:
            cmodel = torch.compile(model)

            def compiled_step():
                out = cmodel(batch)
                loss = out["loss"]
                opt.zero_grad()
                loss.backward()
                opt.step()
                return loss

            compiled_step_time = timed_steps(compiled_step, "compiled")
        except Exception as e:  # inductor may not support this graph
            print(f"torch.compile attempt failed: {e!r}", flush=True)
    torch.save = real_save
    best_time = min(
        t for t in (step_time, compiled_step_time) if t is not None
    )
    import os as _os

    result = {
        "metric": "TCGA_config1 train tokens/sec (PyTorch reference)",
        "hardware": (
            f"CPU, {len(_os.sched_getaffinity(0))} core(s) — all this "
            "image exposes (no GPU / torch-xla)"
        ),
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_cores": len(_os.sched_getaffinity(0)),
        "batch_size": batch_size,
        "seq_len": seq_len,
        "step_time_s": best_time,
        "eager_step_time_s": step_time,
        "compiled_step_time_s": compiled_step_time,
        "tokens_per_sec": tokens_per_step / best_time,
        "n_steps_timed": n_steps,
        "methodology": (
            "reference model.py imported read-only with a faithful "
            "local CLIP-loss stub for the missing torchmultimodal dep; "
            "per-forward debug torch.save patched out (model.py:94); "
            "synthetic TCGA-shaped batch, fwd+bwd+AdamW, median of "
            "timed steps after 1 warmup; best of eager and "
            "torch.compile; the single torch thread is every core "
            "this image has, so this IS the strongest CPU baseline "
            "measurable here"
        ),
    }
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--compile"]
    main(
        int(args[0]) if args else 3,
        try_compile="--compile" in sys.argv[1:],
    )
