"""On-chip flash-kernel parity: Mosaic-compiled Pallas vs dense, on TPU.

The test suite pins the kernels against the dense oracle in interpret
mode on CPU (tests/test_flash_attention.py) — which validates the
algorithm but never the Mosaic lowering actually used in production.

On the chip, BOTH paths deviate from the true answer because fp32
MXU matmuls run at reduced precision by DEFAULT and bf16 quantises
operands; comparing flash directly to same-dtype dense conflates the
kernel's error with the baseline's.  So this script builds ONE
high-precision reference — dense attention, fp32 inputs, under
``jax.default_matmul_precision('highest')`` — and measures every
(path, dtype, bwd, exp2) combination against it.  The pass criterion
is relative: at equal dtype, the compiled flash kernel must be no
worse than ~2x the dense path's own deviation from the reference
(i.e. the kernel adds no error beyond what the dtype/MXU already
costs).  Appends JSON lines to baselines/tpu_kernel_parity.jsonl.

Run (serially with nothing else on the host):
    python baselines/tpu_kernel_parity.py
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "baselines", "tpu_kernel_parity.jsonl")

from mca_tpu import masks as M
from mca_tpu.ops.attention import dense_masked_attention
from mca_tpu.ops.flash_attention import flash_masked_attention

# canonical TCGA mask (token widths from TCGA_config1) at a reduced
# batch*heads so the dense [B, H, T, T] reference fits comfortably
ms = M.build_masks([800, 198, 800, 662], 88, [4, 3, 2])
T = ms.seq_len
B, H, D = 2, 2, 64
SCALE = D ** -0.5

rng = np.random.default_rng(0)
q0 = rng.normal(size=(B, H, T, D)).astype(np.float32)
k0 = rng.normal(size=(B, H, T, D)).astype(np.float32)
v0 = rng.normal(size=(B, H, T, D)).astype(np.float32)
pad = np.zeros((B, T), bool)
pad[0, :800] = True          # modality 0 missing in sample 0
pad[1, 800 + 150 : 998] = True  # partial padding in sample 1
pad_j = jnp.asarray(pad)
mask_j = jnp.asarray(ms.attn_mask)

blocked = np.asarray(ms.attn_mask)[None] | pad[:, None, :]
live = jnp.asarray(~blocked.all(axis=2))  # [B, T]
w = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
sel = np.asarray(live)[:, None, :, None]


def run_path(path, dtype_name, bwd_impl="fused", exp2=False,
             precision=None, prob_dtype="f32"):
    """Returns (out, dq, dk, dv) as fp32 numpy, live rows only for out."""
    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    os.environ["MCA_FLASH_EXP2"] = "1" if exp2 else "0"
    os.environ["MCA_FLASH_PROB_DTYPE"] = prob_dtype
    q, k, v = (jnp.asarray(x, dtype) for x in (q0, k0, v0))

    def obj(q, k, v):
        if path == "dense":
            o = dense_masked_attention(
                q, k, v, scale=SCALE, attn_mask=mask_j,
                key_padding_mask=pad_j,
            )
        else:
            o = flash_masked_attention(
                q, k, v, scale=SCALE, attn_mask=ms.attn_mask,
                key_padding_mask=pad_j, bwd_impl=bwd_impl,
            )
        return (
            o.astype(jnp.float32) * w * live[:, None, :, None]
        ).sum(), o

    def compute(q, k, v):
        (dq, dk, dv), o = jax.grad(
            obj, argnums=(0, 1, 2), has_aux=True
        )(q, k, v)
        return o, dq, dk, dv

    if precision:
        with jax.default_matmul_precision(precision):
            outs = jax.jit(compute)(q, k, v)
    else:
        outs = jax.jit(compute)(q, k, v)
    outs = jax.block_until_ready(outs)
    return tuple(np.asarray(x, np.float32) for x in outs)


def errs_vs(ref, got):
    """max |err| over mean |ref|, per tensor (out masked to live rows)."""
    names = ("out", "dq", "dk", "dv")
    out = {}
    for i, n in enumerate(names):
        r, g = ref[i], got[i]
        m = sel if n == "out" else np.ones_like(r, bool)
        denom = max(np.abs(r[np.broadcast_to(m, r.shape)]).mean(), 1e-9)
        out[n] = float(np.abs((g - r) * m).max() / denom)
    return out


print("building fp32/HIGHEST dense reference...", flush=True)
ref = run_path("dense", "fp32", precision="highest")

cases = [
    ("dense", "fp32", "fused", False, "f32"),
    ("flash", "fp32", "fused", False, "f32"),
    ("dense", "bf16", "fused", False, "f32"),
    ("flash", "bf16", "fused", False, "f32"),
    ("flash", "bf16", "split", False, "f32"),
    ("flash", "bf16", "fused", True, "f32"),
    # looser-numerics A/B knobs (exp2 above, bf16 score/prob tiles
    # below) get a 3x budget instead of 2x — both round the [bq, bk]
    # softmax chain, documented as ~2x the dtype's own error class
    ("flash", "bf16", "fused", False, "bf16"),
]
results = {}
for path, dt, bwd, exp2, pdt in cases:
    got = run_path(path, dt, bwd, exp2, prob_dtype=pdt)
    e = errs_vs(ref, got)
    results[(path, dt, bwd, exp2, pdt)] = e
    rec = {
        "path": path, "dtype": dt, "bwd_impl": bwd, "exp2": exp2,
        "prob_dtype": pdt,
        "T": int(T), "device": str(jax.devices()[0]),
        "max_err_over_mean_abs_vs_highest_ref": e,
    }
    print(rec, flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

# pass criterion: at equal dtype, flash adds no error beyond ~2x what
# the dense path itself deviates from the high-precision reference
ok = True
for dt in ("fp32", "bf16"):
    base = results[("dense", dt, "fused", False, "f32")]
    for key, e in results.items():
        if key[0] != "flash" or key[1] != dt:
            continue
        # exp2 / bf16-prob trade softmax-chain precision for speed by
        # design: 3x budget; exact-semantics kernels stay at 2x
        mult = 3.0 if (key[3] or key[4] != "f32") else 2.0
        for n in e:
            lim = mult * max(base[n], 1e-4)
            if e[n] > lim:
                ok = False
                print(
                    f"FAIL {key} {n}: {e[n]:.4g} > {mult}x dense "
                    f"{base[n]:.4g}", flush=True,
                )
verdict = {
    "criterion": "flash <= 2x same-dtype dense error "
    "(3x for the exp2 / bf16-prob knobs)",
    "ok": ok,
}
with open(OUT, "a") as f:
    f.write(json.dumps(verdict) + "\n")
print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
