"""On-chip smoke + parity for the row-band decomposition.

Interpret-mode tests validate the banded composition's algorithm but
not the Mosaic lowering of the band-fitted block shapes (e.g. the
88-row fusion band's bq=88, and 1152/1280-wide kv tiles) — see PERF.md
round 3 ("interpret-green != Mosaic-valid").  This probe, at the REAL
TCGA and CMU mask scales on the real chip:

1. compiles fwd + fused bwd with MCA_FLASH_BANDS=1 (Mosaic
   verification happens at compile);
2. executes both banded and single-kernel paths on identical inputs
   and requires values + grads to agree within the same-dtype
   tolerance used by tpu_kernel_parity.py.

Run (TPU tunnel up):  python baselines/probe_bands_tpu.py
Appends JSON lines to baselines/probe_bands_tpu.jsonl.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "baselines", "probe_bands_tpu.jsonl")

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu import masks as M
from mca_tpu.ops import flash_attention as F

B, H, D = 8, 8, 64
SCALE = D ** -0.5

FAMILIES = {
    "tcga": ([800, 198, 800, 662], 88, [4, 3, 2]),
    "cmu": ([1500, 450, 450, 50], 88, [4, 3, 2]),
}


def run_family(name, dims, nf, powers):
    ms = M.build_masks(dims, nf, powers)
    mask = np.asarray(ms.attn_mask)
    t = mask.shape[0]
    bands = F.plan_bands(mask)
    rec = {"family": name, "T": int(t),
           "bands": [list(b) for b in (bands or [])]}
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, t, D)).astype(np.float32),
                    jnp.bfloat16)
        for _ in range(3)
    )
    pad = np.zeros((B, t), bool)
    pad[0, : dims[0]] = True  # one sample missing modality 0
    pad_j = jnp.asarray(pad)

    def make_obj(banded):
        # fresh fn per arm — trace-cache reuse would skip the env read
        def loss(q, k, v):
            os.environ["MCA_FLASH_BANDS"] = "1" if banded else "0"
            o = F.flash_masked_attention(
                q, k, v, scale=SCALE, attn_mask=mask,
                key_padding_mask=pad_j,
            )
            return (o.astype(jnp.float32) ** 2).sum(), o

        def both(q, k, v):
            (l, o), g = jax.value_and_grad(
                loss, argnums=(0, 1, 2), has_aux=True
            )(q, k, v)
            return l, o, g

        return jax.jit(both)

    results = {}
    for arm in ("banded", "single"):
        t0 = time.time()
        fn = make_obj(arm == "banded")
        l, o, g = fn(q, k, v)
        jax.block_until_ready(l)
        results[arm] = (np.asarray(o, np.float32),
                        [np.asarray(x, np.float32) for x in g])
        rec[f"{arm}_compile_s"] = round(time.time() - t0, 1)

    o_b, g_b = results["banded"]
    o_s, g_s = results["single"]
    live = ~(mask[None] | pad[:, None, :]).all(axis=2)  # [B, T]
    scale_ref = np.abs(o_s).max()
    rec["out_maxdiff_rel"] = float(
        np.abs((o_b - o_s))[live.nonzero()[0], :, live.nonzero()[1]].max()
        / max(scale_ref, 1e-9)
    )
    for nm, a, b in zip(("dq", "dk", "dv"), g_b, g_s):
        rec[f"{nm}_maxdiff_rel"] = float(
            np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        )
    # bf16 inputs: the two paths differ only in accumulation grouping;
    # 2% of max magnitude is the tpu_kernel_parity-style envelope
    rec["ok"] = all(
        rec[f"{nm}_maxdiff_rel"] < 0.02
        for nm in ("out", "dq", "dk", "dv")
        if f"{nm}_maxdiff_rel" in rec
    ) and rec["out_maxdiff_rel"] < 0.02
    return rec


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = True
    for name, (dims, nf, powers) in FAMILIES.items():
        rec = run_family(name, dims, nf, powers)
        rec["device"] = str(jax.devices()[0])
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: v for k, v in rec.items()
                          if k != "bands"}), flush=True)
        print("  bands:", rec["bands"], flush=True)
        ok &= rec["ok"]
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
