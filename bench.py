"""Benchmark: MCA pretraining throughput on the canonical TCGA config.

Runs the full jit-compiled training step (forward + contrastive loss
graph + backward + AdamW update) at the reference's canonical
TCGA_config1 scale — dim 512, 5 layers, 8 heads, 88 fusion tokens,
packed sequence 2548, batch 8 — on synthetic TCGA-shaped data, on
whatever accelerator `jax.devices()` provides (the real TPU chip under
the driver).

Prints ONE JSON line per metric; the PRIMARY (TCGA MCA train) line is
always first and lands even if the budget expires before the
secondaries (CMU train, zorro train, TCGA batch inference, EAO train):
  {"metric": ..., "value": tokens/sec/chip, "unit": ...,
   "vs_baseline": value / measured PyTorch-reference throughput}

The baseline denominator comes from BASELINE_MEASURED.json (produced
by baselines/measure_torch_baseline.py — the reference repo publishes
no numbers, see BASELINE.md).  Extra context fields ride along; the
driver reads the four required keys.  Secondaries run only for the
canonical un-overridden primary configuration and skip gracefully
when the remaining wall-clock budget is tight (VERDICT r4 item 2:
non-TCGA perf must stop being builder-attested only).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

_T0 = time.time()
_PHASE = ["init"]  # mutated as the run advances; read by the watchdog
_N_EMITTED = [0]  # lines already printed; watchdog falls back only at 0
# untracked scratch dir (.bench/ is gitignored): the last-good record
# churns on every run and must not generate repo diff noise
_LAST_GOOD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench",
    "BENCH_LAST_GOOD.json",
)
# pre-move location (tracked until round 5); read-only fallback
_LAST_GOOD_LEGACY = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_GOOD.json"
)


def _note(phase: str) -> None:
    """Phase progress to stderr (stdout is reserved for the JSON
    lines the driver parses)."""
    _PHASE[0] = phase
    print(f"[bench +{time.time() - _T0:.0f}s] {phase}", file=sys.stderr, flush=True)


def _fallback_record(reason: str) -> dict:
    """Honest-zero record with the last real measurement attached.

    Emitted when the accelerator is unreachable or the wall-clock
    budget expires BEFORE the primary metric landed (round 3 lost its
    official bench record to an unbounded device wait + driver kill —
    VERDICT.md r3 item 1)."""
    rec = {
        "metric": "mca_tcga_pretrain_throughput",
        "value": 0.0,
        "unit": "tokens/sec/chip",
        "vs_baseline": 0.0,
        "error": reason,
    }
    for path in (_LAST_GOOD, _LAST_GOOD_LEGACY):
        try:
            with open(path) as f:
                rec["last_measured"] = json.load(f)
            break
        except Exception:
            pass
    return rec


def _emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)
    _N_EMITTED[0] += 1


def _arm_watchdog(done: threading.Event) -> float:
    """Hard wall-clock budget for the WHOLE bench: if anything (device
    wait, cold remote compile, a hung collective) would push past it,
    print a parsed fallback JSON line (unless the primary already
    printed) and exit 0 — the official record must never be an empty
    rc=124 slot again."""
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))

    def _watch() -> None:
        if not done.wait(max(0.0, _T0 + budget - time.time())):
            if _N_EMITTED[0] == 0:
                _emit(
                    _fallback_record(
                        f"bench exceeded its {budget:.0f}s wall-clock "
                        f"budget during phase '{_PHASE[0]}'; last real "
                        "measurement attached as last_measured"
                    )
                )
            else:
                _note(
                    f"budget {budget:.0f}s expired during "
                    f"'{_PHASE[0]}' — {_N_EMITTED[0]} metric(s) "
                    "already emitted; exiting clean"
                )
            os._exit(0)

    threading.Thread(target=_watch, daemon=True).start()
    return budget


def _budget_remaining() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "480")) - (
        time.time() - _T0
    )


_CMU_SHAPES = {
    "COVAREP": (74, 1500),
    "FACET": (35, 450),
    "OpenFace": (713, 450),
    "glove_vectors": (300, 50),
}


def _cmu_overrides() -> dict:
    return {
        "encoder_configs": {
            m: {
                "type": "EmbeddedSequenceEncoder",
                "input_size": d,
                "max_tokens": t,
            }
            for m, (d, t) in _CMU_SHAPES.items()
        },
        "modality_config": {
            m: {
                "type": "embedded_sequence",
                "pad_len": t,
                "data_col_name": "data",
                "pad_token": -10000,
                "embedding_size": d,
            }
            for m, (d, t) in _CMU_SHAPES.items()
        },
        "bimodal_contrastive": False,
        "non_fusion_fcl": False,
    }


def _build_cfg_and_batch(dataset: str, overrides: dict):
    """(cfg, model, batch, widths) for a dataset at canonical scale
    plus ``overrides``."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like
    from mca_tpu.models import build_model

    if dataset == "cmu":
        overrides = dict(_cmu_overrides(), **overrides)
    cfg = training_config_from_dict(ge._tcga_config(**overrides))
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    if dataset == "cmu":
        from mca_tpu.data.synthetic import make_cmu_like

        samples = make_cmu_like(
            cfg.batch_size,
            shapes={
                m: (e["input_size"], e["max_tokens"])
                for m, e in cfg.encoder_configs.to_plain().items()
            },
            p_missing=0.25,
            seed=0,
        )
    else:
        samples = make_tcga_like(
            cfg.batch_size, widths=widths, p_missing=0.25, seed=0
        )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)
    return cfg, model, batch, widths


def _measure_train(
    dataset: str,
    variant: str,
    overrides: dict,
    scale_overrides: dict,
    with_baseline: bool,
) -> dict:
    """Time the production flat-state K-step scan; returns the record."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mca_tpu.config import get_model_config
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_flat_apparatus,
        make_flat_train_step_scan,
        make_optimizer,
        step_metric_names,
    )

    cfg, model, batch, widths = _build_cfg_and_batch(dataset, overrides)

    tx = make_optimizer(cfg, num_training_steps=1000)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 1000
    )
    state = init_state(model, tx, batch, seed=0)
    # flat-state scan: K steps per launch, single-vector params/AdamW —
    # the production loop's fast path (see mca_tpu.train)
    K = int(os.environ.get("BENCH_K", "32"))
    names = step_metric_names(model, tx, schedule, state, batch)
    flat0, unravel, flat_tx = make_flat_apparatus(
        cfg, 1000, state["params"]
    )
    state = {
        "flat": flat0,
        "opt_state": flat_tx.init(flat0),
        "step": state["step"],
    }
    train_steps = make_flat_train_step_scan(
        model, flat_tx, schedule, unravel, names
    )

    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )

    # BENCH_XLA_OPTS="k=v;k=v": per-compile XLA options A/B (e.g.
    # xla_tpu_scoped_vmem_limit_kib=65536).  compiler_options ride the
    # compile REQUEST, so they reach the remote compiler — unlike
    # client-side XLA_FLAGS env, which the relay does not forward.
    if os.environ.get("BENCH_XLA_OPTS"):

        def _coerce(v):
            if v.lower() in ("true", "false"):
                return v.lower() == "true"
            try:
                return int(v)
            except ValueError:
                return v

        opts = {
            k: _coerce(v)
            for k, v in (
                kv.split("=", 1)
                for kv in os.environ["BENCH_XLA_OPTS"].split(";")
                if kv
            )
        }
        train_steps = train_steps.lower(state, stacked).compile(
            compiler_options=opts
        )

    # compile + warmup
    _note(
        f"[{dataset}/{variant or 'mca'}] compiling + warmup launch "
        "(cached compiles take seconds; a cold remote compile past "
        "the budget trips the watchdog)"
    )
    state, packed = train_steps(state, stacked)
    jax.block_until_ready(packed)
    _note(f"[{dataset}/{variant or 'mca'}] compiled; timing")

    n_calls = 2
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, packed = train_steps(state, stacked)
    jax.block_until_ready(packed)
    n_steps = n_calls * K
    dt = (time.perf_counter() - t0) / n_steps

    metrics = dict(zip(names, np.asarray(jax.device_get(packed))[-1]))

    seq_len = sum(widths.values()) + cfg.num_fusion_tokens
    tokens_per_step = cfg.batch_size * seq_len
    tokens_per_sec = tokens_per_step / dt

    # MFU from an analytic FLOP model (XLA cost_analysis does not see
    # inside pallas custom calls). Counts projections, GEGLU FF, value
    # encoders, and the attention tiles the block-sparse kernel
    # actually visits; bwd = 2x fwd for matmuls. 2*M*N*K convention.
    # v5e bf16 peak: 197 TFLOP/s/chip.
    flops_per_step = mfu = None
    try:
        from mca_tpu import masks as masks_lib

        mc = get_model_config(cfg)
        D = mc["dim"]
        B, depth = cfg.batch_size, mc["depth"]
        H, dh = mc["heads"], mc["dim_head"]
        token_dims = [
            int(e["max_tokens"])
            for e in cfg.encoder_configs.values()
        ]
        inner = int(D * mc["ff_mult"] * 2 / 3)

        def stack_fwd_flops(T, n_unmasked):
            """One transformer pass over a packed length-T sequence.
            Counts projections, useful attention score entries only
            (QK^T + AV over unmasked pairs), and the GEGLU FF."""
            proj = 2 * B * T * D * (H * dh * 4)
            attn = B * H * 4 * dh * n_unmasked
            ff = 2 * B * T * (D * 2 * inner + inner * D)
            return proj + attn + ff

        enc = 2 * B * sum(token_dims) * D * (D + 2)  # value encoders
        if variant == "eao":
            # one unmasked pass per unimodal channel + per combo
            # (ref model.py:571-596); grouping equal-length channels
            # changes launches, not FLOPs
            combos = masks_lib.adjusted_powerset(
                range(len(token_dims)), list(cfg.fusion_combos)
            )
            channels = [(i,) for i in range(len(token_dims))] + [
                tuple(c) for c in combos
            ]
            fwd = enc
            for ch in channels:
                T = sum(token_dims[i] for i in ch)
                fwd += depth * stack_fwd_flops(T, T * T)
        else:
            ms = masks_lib.build_masks(
                token_dims,
                int(cfg.num_fusion_tokens),
                list(cfg.fusion_combos),
                zorro=bool(cfg.zorro),
                fcl=bool(cfg.get("fcl", False)),
                no_fusion=bool(cfg.get("no_fusion", False)),
            )
            T = ms.seq_len
            # useful attention FLOPs only (unmasked score entries) —
            # block-independent, so bigger tiles don't inflate MFU
            # with the wasted compute they carry
            n_unmasked = int((~np.asarray(ms.attn_mask, bool)).sum())
            fwd = depth * stack_fwd_flops(T, n_unmasked) + enc
        flops_per_step = 3.0 * fwd  # fwd + bwd(2x)
        if "v5 lite" in str(jax.devices()[0]):
            mfu = flops_per_step / dt / 197e12
    except Exception:  # analytic model is best-effort, never fail bench
        pass

    vs_baseline = None
    baseline_note = "no measured baseline available"
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BASELINE_MEASURED.json",
    )
    if scale_overrides:
        # a non-canonical model scale is not comparable to the
        # canonical-scale PyTorch baseline measurement
        baseline_note = (
            "model scale overridden "
            f"({scale_overrides}); no comparable baseline"
        )
        baseline_path = ""
    if not with_baseline:
        baseline_note = (
            "measured torch baseline exists for TCGA MCA train only"
        )
        baseline_path = ""
    if baseline_path and os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("tokens_per_sec"):
            vs_baseline = tokens_per_sec / base["tokens_per_sec"]
            baseline_note = (
                f"PyTorch reference measured at "
                f"{base['tokens_per_sec']:.0f} tok/s on "
                f"{base.get('hardware', 'unknown')}"
            )
            if base.get("compiled_step_time_s") is not None:
                baseline_note += " (best of eager / torch.compile)"

    return {
        "metric": (
            f"{dataset.upper()}_config1 "
            f"{variant.upper() or 'MCA'} pretrain "
            f"throughput (fwd+loss+bwd+AdamW, batch "
            f"{cfg.batch_size}, seq {seq_len}"
            + (f", scale {scale_overrides}" if scale_overrides else "")
            + ")"
        ),
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": (
            round(vs_baseline, 2) if vs_baseline is not None else None
        ),
        "step_time_ms": round(dt * 1000, 2),
        "device": str(jax.devices()[0]),
        "precision": cfg.precision,
        "attention_impl": cfg.attention_impl,
        "loss_value": float(metrics["total_loss"]),
        "tflops_per_step": (
            round(flops_per_step / 1e12, 3) if flops_per_step else None
        ),
        "mfu": round(mfu, 4) if mfu else None,
        "baseline_note": baseline_note,
    }


def _measure_infer(dataset: str = "tcga") -> dict:
    """Batch-inference throughput: the production packed forward scan
    (mca_tpu.infer), the analogue of baselines/measure_infer.py.

    Identical-args launches return cached results on the remote relay,
    so a loss-dependent params perturbation chains through each launch
    (same executable, different argument values — see
    baselines/measure_infer.py for the two failure modes this guards)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from mca_tpu.infer import make_packed_forward, split_output_keys

    cfg, model, batch, widths = _build_cfg_and_batch(dataset, {})
    K = int(os.environ.get("BENCH_K", "32"))

    params = jax.jit(model.init)(jax.random.key(0), batch)
    shapes_out = jax.eval_shape(
        lambda p, b: model.apply(p, b), params, batch
    )
    emb_keys, mask_keys = split_output_keys(shapes_out)
    packed_forward = make_packed_forward(model, emb_keys, mask_keys)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )

    @partial(jax.jit, donate_argnums=0)
    def timed_scan(params, batches):
        def body(carry, b):
            return carry, packed_forward(params, b)

        _, outs = jax.lax.scan(body, None, batches)
        eps = 1e-6 * outs[2].mean().astype(jnp.float32)
        params = jax.tree.map(
            lambda p: p * (1.0 + eps).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
        )
        return params, outs

    _note(f"[{dataset}/infer] compiling + warmup launch")
    params, out = timed_scan(params, stacked)
    float(jax.device_get(out[2]).mean())
    params, out = timed_scan(params, stacked)
    float(jax.device_get(out[2]).mean())
    _note(f"[{dataset}/infer] compiled; timing")

    # per-launch device_get drains the relay pipeline so the number is
    # honest end-to-end launch time (block_until_ready alone measures
    # ~0 on back-to-back chained launches — measure_infer.py history)
    repeats = 3
    t0 = time.perf_counter()
    for _ in range(repeats):
        params, out = timed_scan(params, stacked)
        float(jax.device_get(out[2]).mean())
    dt = time.perf_counter() - t0
    n_fwd = repeats * K
    seq_len = sum(widths.values()) + int(cfg.num_fusion_tokens)
    tok_s = n_fwd * cfg.batch_size * seq_len / dt
    return {
        "metric": (
            f"{dataset.upper()}_config1 MCA batch-inference "
            f"throughput (packed forward scan, batch "
            f"{cfg.batch_size}, seq {seq_len})"
        ),
        "value": round(tok_s, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": None,
        "ms_per_forward": round(1e3 * dt / n_fwd, 2),
        "samples_per_sec": round(n_fwd * cfg.batch_size / dt, 1),
        "device": str(jax.devices()[0]),
        "emb_keys": len(emb_keys),
        "baseline_note": (
            "no torch inference baseline measured (reference "
            "infer_accel_gpu.py is single-GPU-only)"
        ),
    }


def main() -> None:
    """Env overrides: BENCH_DATASET=tcga|cmu, BENCH_BATCH, BENCH_K,
    BENCH_BUDGET_S (whole-run wall clock), BENCH_DEVICE_WAIT_S,
    BENCH_SECONDARIES=0 to disable the secondary metrics."""
    done = threading.Event()
    budget = _arm_watchdog(done)
    _note(f"start (budget {budget:.0f}s)")

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # skip the 5-15 min remote cold compile on reruns

    import __graft_entry__ as ge

    # the remote TPU backend blocks INDEFINITELY in a connect-retry
    # loop when the tunnel is down (observed round 3) — probe in a
    # bounded subprocess first, re-probing briefly (outages have been
    # transient), and emit an honest zero-valued JSON line rather than
    # hanging the driver if the accelerator never appears.  The probe
    # window stays well inside the whole-run budget so a down tunnel
    # still leaves time to print.
    wait_s = float(os.environ.get("BENCH_DEVICE_WAIT_S", "150"))
    _note(f"probing accelerator (<= {wait_s:.0f}s)")
    deadline = time.time() + wait_s
    n_dev = ge._probed_device_count(timeout=60.0)
    while n_dev == 0 and time.time() < deadline:
        time.sleep(15)
        n_dev = ge._probed_device_count(timeout=60.0)
    if n_dev == 0:
        _emit(
            _fallback_record(
                "accelerator unreachable (remote TPU tunnel down) "
                f"after {int(wait_s)}s of bounded probes; last real "
                "measurement attached as last_measured"
            )
        )
        done.set()
        return
    _note(f"{n_dev} device(s) up; building model + batch")

    dataset = os.environ.get("BENCH_DATASET", "tcga")
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    overrides = {"batch_size": batch_size}
    overrides["attention_impl"] = os.environ.get("BENCH_ATTN", "auto")
    # model-scale knobs (default = canonical TCGA_config1 scale): used
    # to measure MFU vs model width — e.g. BENCH_DIM=1024
    # BENCH_DIM_HEAD=128 doubles MXU contraction depth (PERF.md r3,
    # "MFU ceiling is the model scale")
    scale_overrides = {}
    for env, key in (
        ("BENCH_DIM", "hidden_size"),
        ("BENCH_DEPTH", "layers"),
        ("BENCH_HEADS", "heads"),
        ("BENCH_DIM_HEAD", "dim_head"),
    ):
        if os.environ.get(env):
            scale_overrides[key] = int(os.environ[env])
    overrides.update(scale_overrides)
    # BENCH_MOMENT_DTYPE=bf16: half-width AdamW moments A/B (PERF.md
    # round 3: memory 3P->2P, throughput-neutral at canonical scale)
    if os.environ.get("BENCH_MOMENT_DTYPE"):
        overrides["moment_dtype"] = os.environ["BENCH_MOMENT_DTYPE"]
    # BENCH_MOE=E: mixture-of-experts FF A/B (extension,
    # mca_tpu.models.moe — expert-choice routing; the dense GEGLU is
    # replaced by E experts, ~E/cf x the FF params at cf x the FF
    # token-FLOPs).  The analytic MFU model counts the dense-FF
    # FLOPs only, so tok/s is the honest cross-arm metric.
    if os.environ.get("BENCH_MOE"):
        overrides["moe_experts"] = int(os.environ["BENCH_MOE"])
    variant = os.environ.get("BENCH_VARIANT", "")  # "" | zorro | eao
    if variant == "zorro":
        overrides["zorro"] = True
    elif variant == "eao":
        overrides.update(_eao_overrides())
    # activations at batch 128 exceed HBM without rematerialisation
    # (measured: 30.8G vs 15.75G); batch 64 still fits and runs 28%
    # faster without remat (320k vs 250k tok/s) — see PERF.md.  The
    # 128 threshold is MCA-calibrated; EAO's ~4x activations may need
    # BENCH_REMAT=1 at mid-size batches.  An explicit BENCH_REMAT
    # always wins; the auto heuristic only fills the gap
    if os.environ.get("BENCH_REMAT", "auto") != "auto":
        overrides["remat"] = os.environ["BENCH_REMAT"] == "1"
    else:
        overrides.setdefault("remat", batch_size >= 128)

    rec = _measure_train(
        dataset,
        variant,
        overrides,
        scale_overrides,
        with_baseline=(dataset == "tcga" and not variant),
    )

    canonical = (
        dataset == "tcga"
        and not variant
        and not scale_overrides
        and batch_size == 8
        and not os.environ.get("BENCH_MOE")
    )
    # persist as the last-known-good record the fallback line attaches
    # (only the canonical, un-overridden configuration qualifies)
    if canonical:
        try:
            os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
            with open(_LAST_GOOD, "w") as f:
                json.dump(
                    dict(rec, measured_at=time.strftime("%Y-%m-%d %H:%M:%S")),
                    f,
                    indent=1,
                )
                f.write("\n")
        except Exception:
            pass
    _emit(rec)  # PRIMARY line is out — watchdog now exits clean

    # --- secondary metrics (VERDICT r4 item 2) -----------------------
    # Each needs its own compile; budget-check before each so the run
    # never ends mid-measure with a half-printed record.  ~110s covers
    # a warm-cached compile + timing; a cold compile may trip the
    # watchdog, which exits clean now that the primary landed.
    if canonical and os.environ.get("BENCH_SECONDARIES", "1") != "0":
        est_s = float(os.environ.get("BENCH_SECONDARY_EST_S", "110"))
        secondaries = [
            (
                "cmu train",
                lambda: _measure_train(
                    "cmu",
                    "",
                    {
                        "batch_size": 8,
                        "attention_impl": overrides["attention_impl"],
                        "remat": False,
                    },
                    {},
                    with_baseline=False,
                ),
            ),
            (
                "zorro train",
                lambda: _measure_train(
                    "tcga",
                    "zorro",
                    {
                        "batch_size": 8,
                        "attention_impl": overrides["attention_impl"],
                        "remat": False,
                        "zorro": True,
                    },
                    {},
                    with_baseline=False,
                ),
            ),
            ("tcga infer", lambda: _measure_infer("tcga")),
            (
                "eao train",
                lambda: _measure_train(
                    "tcga",
                    "eao",
                    dict(
                        _eao_overrides(),
                        batch_size=8,
                        attention_impl=overrides["attention_impl"],
                        remat=False,
                    ),
                    {},
                    with_baseline=False,
                ),
            ),
        ]
        for name, fn in secondaries:
            left = _budget_remaining()
            if left < est_s:
                _note(
                    f"skipping secondary '{name}': {left:.0f}s left "
                    f"< {est_s:.0f}s estimate"
                )
                continue
            try:
                _emit(fn())
            except Exception as e:  # a secondary must never kill the run
                _note(f"secondary '{name}' failed: {e!r}")
    done.set()


def _eao_overrides() -> dict:
    return dict(
        eao=True, no_fusion=True, mean_pool=True,
        num_fusion_tokens=0, fusion_combos=[2], fcl_root=[0, 1],
        # remat measured 34% slower where the 10 noremat passes
        # still fit (batch 8: 207.6 vs 154.7 ms/step, PERF.md r3);
        # the auto heuristic handles large batches, and an
        # explicit BENCH_REMAT always wins
        # BENCH_EAO_GROUP=1 measures the batched equal-length
        # channel passes (measured negative, PERF.md r3) for A/B
        eao_group_channels=(
            os.environ.get("BENCH_EAO_GROUP", "0") == "1"
        ),
    )


if __name__ == "__main__":
    main()
