"""EAO roofline: per-pass-class bounds vs measured (VERDICT r4 item 3).

EAO re-runs the transformer stack once per unimodal channel and once
per modality combo (ref model.py:571-596; canonical TCGA EAO =
``fusion_combos: [2]`` -> 4 unimodal + 6 pair passes = 10 passes,
lengths {198, 662, 800} x1 + {800} x1 ... see ``eao_channels``), each
pass DENSE (mask None -> the flash kernel visits every tile).  MCA's
fwd/bwd are closed against measured platform bounds (PERF.md round 4);
this tool produces the same accounting for EAO:

1. per PASS CLASS (distinct packed length T): analytic MXU/VPU/HBM
   counts for the dense kernel (roofline.attention_counts on an
   all-unmasked [T, T] mask) + the pass's projection/FF GEMMs;
2. measured rates at the kernel's own tile shapes
   (roofline.measure_rates);
3. measured per-pass time two ways: the attention kernel alone
   (roofline.measure_attention) and the WHOLE pass (depth x MCALayer +
   masked mean pool, fwd and fwd+bwd) via a standalone PassProbe
   module running the production layer code;
4. the full-step check: sum of per-pass bounds (with channel
   multiplicity) + encoder GEMMs + optimizer traffic vs the measured
   EAO train step (bench.py's flat-scan path, BENCH_VARIANT=eao).

A pass class is CLOSED when its measured whole-pass time is <= 1.2x
its serial bound (sum of the attention serial bound and the GEMM time
at the measured big-dot rate — Mosaic never co-issues MXU/VPU, so
compute-unit time adds; probe_overlap.py round 4/5).

Usage: python baselines/roofline_eao.py [--k 16] [--out file.jsonl]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import roofline as R  # the MCA roofline harness (counts + rates)


def eao_channels(token_dims, fusion_combos):
    """(channel tuples, packed length per channel) — mirrors
    models/eao.py __call__ (unimodal first, then combos)."""
    from mca_tpu.masks import adjusted_powerset

    combos = adjusted_powerset(
        range(len(token_dims)), list(fusion_combos)
    )
    channels = [(i,) for i in range(len(token_dims))] + [
        tuple(sorted(c)) for c in combos
    ]
    lengths = [sum(token_dims[i] for i in c) for c in channels]
    return channels, lengths


def build_eao_case():
    """Canonical TCGA EAO shapes (ref configs/TCGA_config1_EAO.yaml:
    fusion_combos [2], fcl_root [0,1], eao/no_fusion/mean_pool)."""
    import __graft_entry__ as ge
    from mca_tpu.config import get_model_config, training_config_from_dict

    overrides = dict(
        eao=True, no_fusion=True, mean_pool=True,
        num_fusion_tokens=0, fusion_combos=[2], fcl_root=[0, 1],
        remat=False,
    )
    cfg = training_config_from_dict(ge._tcga_config(**overrides))
    mc = get_model_config(cfg)
    token_dims = [
        int(e["max_tokens"]) for e in cfg.encoder_configs.values()
    ]
    channels, lengths = eao_channels(
        token_dims, list(cfg.fusion_combos)
    )
    return {
        "cfg": cfg,
        "channels": channels,
        "lengths": lengths,
        "token_dims": token_dims,
        "cfg_like": {
            "dim": mc["dim"], "depth": mc["depth"],
            "heads": mc["heads"], "dim_head": mc["dim_head"],
            "ff_mult": mc["ff_mult"], "batch": cfg.batch_size,
            "enc_tokens": sum(token_dims),
        },
    }


def pass_gemm_flops(cl, T):
    """Projection + GEGLU-FF MXU flops for ONE pass forward (no
    encoders — those run once per step, not per pass)."""
    D = cl["dim"]
    B = cl["batch"]
    H, dh = cl["heads"], cl["dim_head"]
    inner = int(D * cl["ff_mult"] * 2 / 3)
    proj = 2 * B * T * D * (H * dh * 4)
    ff = 2 * B * T * (D * 2 * inner + inner * D)
    return cl["depth"] * (proj + ff)


def measure_pass(T, cl, k=12):
    """Whole-pass time (fwd, fwd+bwd) for one dense pass of length T:
    depth x MCALayer + masked mean pool — the production layer code,
    chained-scan timed with full-minus-half subtraction."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mca_tpu.models.layers import MCALayer
    from mca_tpu.models.pool import MeanTokenProjectionPool

    class PassProbe(nn.Module):
        @nn.compact
        def __call__(self, x, padding):
            for i in range(cl["depth"]):
                x = MCALayer(
                    dim=cl["dim"], dim_head=cl["dim_head"],
                    heads=cl["heads"], ff_mult=cl["ff_mult"],
                    dtype=jnp.bfloat16, attn_impl="auto",
                    name=f"layer_{i}",
                )(x, None, padding)
            x = x.astype(jnp.float32)
            return MeanTokenProjectionPool(
                token_types=None, in_dim=cl["dim"],
                out_dim=cl["dim"], projection=False,
                name="pool",
            )(x, padding)

    B = cl["batch"]
    model = PassProbe()
    key = jax.random.key(0)
    x0 = jax.random.normal(
        key, (B, T, cl["dim"]), jnp.float32
    ) * 0.1
    pad = jnp.zeros((B, T), bool)
    params = jax.jit(model.init)(key, x0, pad)

    def fwd_chain(length):
        @partial(jax.jit, donate_argnums=1)
        def run(p, x):
            def body(c, _):
                o = model.apply(p, c, pad)  # [B, 1, D]
                return c + o.astype(c.dtype) * 1e-6, None

            return jax.lax.scan(body, x, None, length=length)[0]

        return lambda x: run(params, x)

    def bwd_chain(length):
        def loss(p, x):
            return model.apply(p, x, pad).sum()

        @partial(jax.jit, donate_argnums=1)
        def run(p, x):
            def body(c, _):
                g = jax.grad(loss, argnums=1)(p, c)
                return (c + g * 1e-6).astype(c.dtype), None

            return jax.lax.scan(body, x, None, length=length)[0]

        return lambda x: run(params, x)

    def per_iter_ms(chain):
        t_full = R._timed_chain(chain(k), x0, 1)
        t_half = R._timed_chain(chain(k // 2), x0, 1)
        return (t_full - t_half) / (k - k // 2) * 1e3

    fwd_ms = per_iter_ms(fwd_chain)
    fb_ms = per_iter_ms(bwd_chain)
    return {"fwd_ms": fwd_ms, "fwd_bwd_ms": fb_ms}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "roofline_eao_results.jsonl",
        ),
    )
    ap.add_argument("--skip-step", action="store_true",
                    help="skip the full-train-step measurement")
    args = ap.parse_args()

    import jax

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from mca_tpu.ops.flash_attention import _auto_blocks

    case = build_eao_case()
    cl = case["cfg_like"]
    lengths = case["lengths"]
    dist = sorted(set(lengths))
    mult = {T: lengths.count(T) for T in dist}
    print(
        f"device={jax.devices()[0]} passes={len(lengths)} "
        f"classes={[(T, mult[T]) for T in dist]}",
        flush=True,
    )

    # tile shapes the dense kernel picks per class feed the rate bench
    masks = {T: np.zeros((T, T), bool) for T in dist}
    shapes = sorted({_auto_blocks(masks[T]) for T in dist})
    rates = R.measure_rates(
        shapes=shapes, dim_head=cl["dim_head"], k=args.k
    )
    for name, v in rates.items():
        if isinstance(v, dict):
            for s, r in v.items():
                print(f"  rate {name}[{s}] = {r / 1e12:.2f} T/s",
                      flush=True)
        else:
            print(f"  rate {name} = {v / 1e12:.3f} T/s", flush=True)

    rows = []
    step_bound_ms = 0.0
    step_meas_ms = 0.0
    for T in dist:
        counts = R.attention_counts(
            masks[T], None, batch=cl["batch"], heads=cl["heads"],
            dim_head=cl["dim_head"],
        )
        meas_attn = R.measure_attention(
            masks[T], batch=cl["batch"], heads=cl["heads"],
            dim_head=cl["dim_head"], k=max(16, 3 * args.k),
        )
        meas_pass = measure_pass(T, cl, k=12)
        # whole-pass serial bound: depth x attention serial + the
        # pass GEMMs at the measured big-dot rate (bwd = 2x fwd)
        ls_f = R.light_ms(counts["fwd"], rates)
        ls_b = R.light_ms(counts["bwd"], rates)
        gemm_ms = (
            pass_gemm_flops(cl, T) / rates["mxu_big_flops_s"] * 1e3
        )
        pass_fwd_bound = cl["depth"] * ls_f["serial_ms"] + gemm_ms
        pass_fb_bound = (
            cl["depth"] * (ls_f["serial_ms"] + ls_b["serial_ms"])
            + 3 * gemm_ms
        )
        row = {
            "pass_class_T": T,
            "multiplicity": mult[T],
            "attn_fwd_per_layer_ms": round(meas_attn["fwd_ms"], 3),
            "attn_fwd_serial_ms": round(ls_f["serial_ms"], 3),
            "attn_fwd_x_serial": round(
                meas_attn["fwd_ms"] / ls_f["serial_ms"], 2
            ),
            "attn_bwd_per_layer_ms": round(meas_attn["bwd_ms"], 3),
            "attn_bwd_serial_ms": round(ls_b["serial_ms"], 3),
            "attn_bwd_x_serial": round(
                meas_attn["bwd_ms"] / ls_b["serial_ms"], 2
            ),
            "gemm_fwd_ms": round(gemm_ms, 3),
            "pass_fwd_ms": round(meas_pass["fwd_ms"], 3),
            "pass_fwd_bound_ms": round(pass_fwd_bound, 3),
            "pass_fwd_x_bound": round(
                meas_pass["fwd_ms"] / pass_fwd_bound, 2
            ),
            "pass_fwd_bwd_ms": round(meas_pass["fwd_bwd_ms"], 3),
            "pass_fwd_bwd_bound_ms": round(pass_fb_bound, 3),
            "pass_fwd_bwd_x_bound": round(
                meas_pass["fwd_bwd_ms"] / pass_fb_bound, 2
            ),
            "closed": bool(
                meas_pass["fwd_bwd_ms"] <= 1.2 * pass_fb_bound
            ),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        step_bound_ms += mult[T] * pass_fb_bound
        step_meas_ms += mult[T] * meas_pass["fwd_bwd_ms"]

    # step-level additions: encoders (fwd+bwd), optimizer traffic
    enc_f = 2 * cl["batch"] * cl["enc_tokens"] * cl["dim"] * (
        cl["dim"] + 2
    )
    enc_ms = 3 * enc_f / rates["mxu_big_flops_s"] * 1e3
    opt_ms = (
        R.optimizer_bytes(16_600_000) / rates["hbm_bytes_s"] * 1e3
    )
    step_bound_ms += enc_ms + opt_ms

    step_row = {
        "component": "eao_step_sum",
        "sum_pass_fwd_bwd_ms": round(step_meas_ms, 2),
        "bound_ms": round(step_bound_ms, 2),
        "enc_ms": round(enc_ms, 3),
        "opt_ms": round(opt_ms, 3),
    }
    if not args.skip_step:
        import bench

        rec = bench._measure_train(
            "tcga", "eao",
            dict(
                eao=True, no_fusion=True, mean_pool=True,
                num_fusion_tokens=0, fusion_combos=[2],
                fcl_root=[0, 1], remat=False, batch_size=8,
                attention_impl="auto",
            ),
            {}, with_baseline=False,
        )
        step_row["measured_step_ms"] = rec["step_time_ms"]
        step_row["step_x_bound"] = round(
            rec["step_time_ms"] / step_bound_ms, 2
        )
        step_row["throughput_tok_s"] = rec["value"]
    print(json.dumps(step_row), flush=True)

    report = {
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "channels": [list(c) for c in case["channels"]],
        "rows": rows,
        "step": step_row,
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(report) + "\n")
    print(f"appended to {args.out}", flush=True)


if __name__ == "__main__":
    main()
