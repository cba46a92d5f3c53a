"""Round-2 measurement pack (run on the TPU, one process at a time).

Produces the PERF.md evidence for:
- eval-epoch and infer wall time at TCGA scale with the single-sync
  packed paths (VERDICT r1 item 8),
- CMU-scale training throughput with the streaming loader
  (preload=False + prefetch) vs preloaded (item 6),
- flash-attention batch-scaling at batch 64/128 (item 10) is covered
  by bench.py env overrides (BENCH_BATCH), run separately.

Usage: python baselines/measure_r2.py [--part eval|infer|cmu_stream]
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def tcga_setup(n_eval_batches=32):
    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like
    from mca_tpu.models import build_model

    cfg = training_config_from_dict(ge._tcga_config())
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    samples = make_tcga_like(
        cfg.batch_size * n_eval_batches,
        widths=widths,
        p_missing=0.25,
        seed=0,
        clustered=True,
    )
    collator = MultimodalCollator(cfg.modality_config.to_plain())
    batches = [
        collator(samples[i * cfg.batch_size : (i + 1) * cfg.batch_size])
        for i in range(n_eval_batches)
    ]
    return cfg, model, batches, samples


def part_eval():
    """Eval-epoch wall time: packed single-sync loop at TCGA scale."""
    from mca_tpu.config import get_model_config
    from mca_tpu.parallel.mesh import make_mesh
    from mca_tpu.train import (
        eval_output_names,
        make_eval_step,
        make_eval_step_scan,
        run_eval_epoch,
    )
    from mca_tpu.utils.logging import JSONLLogger

    cfg, model, batches, _ = tcga_setup(n_eval_batches=64)
    mesh = make_mesh(1, 1)
    params = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batches[0])
    )
    names = eval_output_names(
        model, get_model_config(cfg), params, batches[0]
    )
    K = 32
    eval_step = (
        make_eval_step(model, *names),
        make_eval_step_scan(model, *names),
        names,
        K,
    )

    class _DL:
        def __iter__(self):
            return iter(batches)

    out_dir = "/tmp/measure_eval"
    os.makedirs(out_dir, exist_ok=True)
    mc = get_model_config(cfg)
    # warm-up (compile) epoch, then timed epochs
    log = JSONLLogger(out_dir)
    run_eval_epoch(cfg, mc, eval_step, params, _DL(), mesh, log, 0)
    t0 = time.perf_counter()
    n = 2
    for i in range(n):
        run_eval_epoch(cfg, mc, eval_step, params, _DL(), mesh, log, i)
    dt = (time.perf_counter() - t0) / n
    log.close()
    print(json.dumps({
        "part": "eval_epoch",
        "n_batches": len(batches),
        "batch": cfg.batch_size,
        "wall_s_per_epoch": round(dt, 3),
        "ms_per_batch": round(dt / len(batches) * 1000, 2),
    }), flush=True)


def part_infer():
    """Infer wall time at TCGA scale (single-sync per split)."""
    from mca_tpu import checkpoint as ckpt
    from mca_tpu.data.synthetic import to_hf_dataset
    from mca_tpu.infer import infer

    cfg, model, batches, samples = tcga_setup(n_eval_batches=64)
    root = "/tmp/measure_infer"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    ds = to_hf_dataset(samples)
    ds.save_to_disk(f"{root}/dataset")
    params = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(jnp.asarray, batches[0])
    )
    ckpt.save_params(params, f"{root}/model")
    cfg.dataset = f"{root}/dataset"
    cfg.restart = f"{root}/model"
    cfg.output_dir = f"{root}/out"
    cfg.split = 0.25
    os.makedirs(cfg.output_dir, exist_ok=True)
    t0 = time.perf_counter()
    infer(cfg)
    dt = time.perf_counter() - t0
    n_batches = 64  # 48 train + 16 eval at batch 8 (drop_last)
    print(json.dumps({
        "part": "infer_both_splits",
        "n_samples": len(samples),
        "wall_s": round(dt, 2),
        "ms_per_batch_incl_compile": round(dt / n_batches * 1000, 1),
    }), flush=True)


def part_cmu_stream():
    """CMU-scale train throughput: streaming loader vs preloaded."""
    from mca_tpu.config import training_config_from_dict
    from mca_tpu.data.synthetic import make_cmu_like, to_hf_dataset, tiny_config
    from mca_tpu.train import train

    shapes = {
        "COVAREP": (74, 1500),
        "FACET": (35, 450),
        "OpenFace": (713, 450),
        "glove_vectors": (300, 50),
    }
    root = "/tmp/measure_cmu"
    ds_path = f"{root}/dataset"
    # enough samples for several launches per epoch: the sliding-window
    # meter needs a steady-state tail clear of compile + cold pages
    n_samples = 1280  # 0.8*1280/8 = 128 batches = exactly 4 scan launches
    if not os.path.isdir(ds_path) or len(
        __import__("datasets").load_from_disk(ds_path)
    ) != n_samples:
        os.makedirs(root, exist_ok=True)
        samples = make_cmu_like(
            n_samples, shapes=shapes, p_missing=0.2, seed=0
        )
        to_hf_dataset(samples).save_to_disk(ds_path)

    results = {}
    for mode, preload in (
        ("stream", False),
        # stage_dtype=fp16: half the bytes over the H2D relay (the
        # measured bottleneck, PERF.md) — VERDICT r2 item 7
        ("stream_fp16", False),
        ("preload", True),
    ):
        cfg = training_config_from_dict(
            tiny_config(
                "cmu",
                shapes=shapes,
                batch_size=8,
                hidden=512,
                heads=8,
                dim_head=64,
                layers=5,
                num_fusion_tokens=88,
                epochs=3,
                lr=1e-4,
                precision="bf16",
                attention_impl="auto",
            )
        )
        cfg.dataset = ds_path
        cfg.split = 0.2
        cfg.run_eval_loop = False
        cfg.preload_dataset = preload
        if mode.endswith("_fp16"):
            cfg.stage_dtype = "fp16"
        cfg.output_dir = f"{root}/out_{mode}"
        shutil.rmtree(cfg.output_dir, ignore_errors=True)
        train(cfg)
        recs = [
            json.loads(l)
            for l in open(f"{cfg.output_dir}/metrics.jsonl")
            if "tokens_per_sec" in l
        ]
        # last epoch's steady-state throughput
        tail = [r["tokens_per_sec"] for r in recs[-16:]]
        results[mode] = round(float(np.mean(tail)), 1)
        print(json.dumps({
            "part": f"cmu_{mode}",
            "tokens_per_sec_tail16": results[mode],
        }), flush=True)
    print(json.dumps({
        "part": "cmu_stream_vs_preload",
        "stream": results["stream"],
        "stream_fp16": results.get("stream_fp16"),
        "preload": results["preload"],
        "ratio": round(results["stream"] / results["preload"], 4),
    }), flush=True)


def part_tcga_e2e():
    """TCGA-scale throughput of the REAL train() loop (bench.py stages
    synthetic batches once; this exercises loader -> collate -> stack
    -> H2D -> launch end-to-end)."""
    import __graft_entry__ as ge
    from mca_tpu.config import training_config_from_dict
    from mca_tpu.data.synthetic import make_tcga_like, to_hf_dataset
    from mca_tpu.train import train

    root = "/tmp/measure_tcga_e2e"
    ds_path = f"{root}/dataset"
    # 1024 train batches = 32 scan launches/epoch: the sliding window
    # sees a steady-state tail with epoch boundaries amortised
    n_samples = 10240
    if not os.path.isdir(ds_path):
        os.makedirs(root, exist_ok=True)
        cfg0 = training_config_from_dict(ge._tcga_config())
        widths = {
            m: c["pad_len"] for m, c in cfg0.modality_config.items()
        }
        samples = make_tcga_like(
            n_samples, widths=widths, p_missing=0.25, seed=0
        )
        to_hf_dataset(samples).save_to_disk(ds_path)
    cfg = training_config_from_dict(
        ge._tcga_config(epochs=2)
    )
    cfg.dataset = ds_path
    cfg.split = 0.2
    cfg.run_eval_loop = False
    cfg.output_dir = f"{root}/out"
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    train(cfg)
    recs = [
        json.loads(l)
        for l in open(f"{cfg.output_dir}/metrics.jsonl")
        if "tokens_per_sec" in l
    ]
    tps = [r["tokens_per_sec"] for r in recs if r["tokens_per_sec"]]
    tail = sorted(tps[len(tps) // 2 :])
    print(json.dumps({
        "part": "tcga_e2e_train_loop",
        "tokens_per_sec_last_window": round(tps[-1], 1),
        "tokens_per_sec_median_2nd_half": round(
            tail[len(tail) // 2], 1
        ),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--part",
        choices=["eval", "infer", "cmu_stream", "tcga_e2e", "all"],
        default="all",
    )
    args = ap.parse_args()
    if args.part in ("eval", "all"):
        part_eval()
    if args.part in ("infer", "all"):
        part_infer()
    if args.part in ("cmu_stream", "all"):
        part_cmu_stream()
    if args.part in ("tcga_e2e", "all"):
        part_tcga_e2e()
