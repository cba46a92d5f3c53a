"""Mosaic lowering smoke: AOT-compile every flash-kernel variant on TPU.

Interpret-mode tests validate kernel ALGORITHMS but not the Mosaic
lowering: the bf16 prob-dtype mode passed every CPU test yet died
on hardware with "'tpu.matmul' op Expected matmul acc to be 32-bit"
(PERF.md round 3).  This guard compiles — `.lower().compile()`, no
execution, no data movement — the fwd + backward kernels for every
knob combination the framework exposes, at a small mask so the sweep
stays fast, and fails loudly on any Mosaic verification error.

Run (TPU tunnel up, nothing else on the host):
    python baselines/tpu_lowering_smoke.py
Appends one JSON line per case to baselines/tpu_lowering_smoke.jsonl.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "baselines", "tpu_lowering_smoke.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu import masks as M
from mca_tpu.ops.flash_attention import flash_masked_attention

ms = M.build_masks([96, 64], 66, [2, 1])
T = ms.seq_len
B, H, D = 2, 2, 64
SCALE = D ** -0.5
pad = np.zeros((B, T), bool)
pad[0, 96:130] = True
pad_j = jnp.asarray(pad)

# one-at-a-time from the production default (select/fused/f32/exp2=0,
# bf16 inputs, masked), plus the unmasked (EAO) path and fp32 inputs
CASES = [
    # (tag, masked, dtype, bwd, mask_mode, exp2, prob_dtype)
    ("default", True, "bf16", "fused", "select", False, "f32"),
    ("split-bwd", True, "bf16", "split", "select", False, "f32"),
    ("mask-add", True, "bf16", "fused", "add", False, "f32"),
    ("mask-skip", True, "bf16", "fused", "skip", False, "f32"),
    ("exp2", True, "bf16", "fused", "select", True, "f32"),
    ("prob-bf16", True, "bf16", "fused", "select", False, "bf16"),
    ("prob-bf16-split", True, "bf16", "split", "select", False, "bf16"),
    ("unmasked", False, "bf16", "fused", "select", False, "f32"),
    ("unmasked-prob-bf16", False, "bf16", "fused", "select", False, "bf16"),
    ("fp32-inputs", True, "fp32", "fused", "select", False, "f32"),
]


def compile_case(masked, dtype_name, bwd, mask_mode, exp2, prob_dtype):
    os.environ["MCA_FLASH_MASK_MODE"] = mask_mode
    os.environ["MCA_FLASH_EXP2"] = "1" if exp2 else "0"
    os.environ["MCA_FLASH_PROB_DTYPE"] = prob_dtype
    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    mask = ms.attn_mask if masked else None

    # fresh function object per case: jit reuses traces of the SAME
    # function object with the same avals, which would silently skip
    # re-reading the env knobs (see PERF.md round 3)
    def loss(q, k, v):
        o = flash_masked_attention(
            q, k, v, scale=SCALE, attn_mask=mask,
            key_padding_mask=pad_j, bwd_impl=bwd,
        )
        return o.astype(jnp.float32).sum()

    shape = jax.ShapeDtypeStruct((B, H, T, D), dtype)
    # compile-only: Mosaic verification happens here, nothing executes
    jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(
        shape, shape, shape
    ).compile()


def main():
    print("device:", jax.devices()[0], flush=True)
    failures = []
    for tag, *args in CASES:
        t0 = time.time()
        rec = {"tag": tag, "T": int(T), "device": str(jax.devices()[0])}
        try:
            compile_case(*args)
            rec["ok"] = True
        except Exception as e:  # noqa: BLE001 — record and continue
            rec["ok"] = False
            rec["error"] = str(e)[-800:]
            failures.append(tag)
        rec["compile_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print("FAILURES:" if failures else "ALL LOWERED", failures, flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
