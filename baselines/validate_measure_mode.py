"""On-hardware validation of MCA_FLASH_TUNE=measure (VERDICT r2 item 6).

Runs the measure-at-first-use tuner for a NOVEL mask (a
generated-corpus-style 3-modality config not in the measured table),
checks that:
- the micro-sweep runs on the TPU and picks a block shape,
- the disk cache is written and a second process-level call hits it,
- the pick is reported alongside the pure cost-model pick.

Usage: MCA_FLASH_TUNE_CACHE=/tmp/blocktune_val.json python
       baselines/validate_measure_mode.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("MCA_FLASH_TUNE_CACHE", "/tmp/blocktune_val.json")
os.environ["MCA_FLASH_TUNE"] = "measure"

import numpy as np
import jax
import jax.numpy as jnp

from mca_tpu import masks as M
from mca_tpu.ops.flash_attention import (
    _auto_blocks,
    flash_masked_attention,
)

cache_path = os.environ["MCA_FLASH_TUNE_CACHE"]
if os.path.exists(cache_path):
    os.remove(cache_path)

# novel 3-modality corpus-style mask (dNN grammar scale), not tabled
ms = M.build_masks([512, 384, 640], 64, [3, 2], fcl=True)
mask = np.asarray(ms.attn_mask, bool)
t = mask.shape[0]
print(f"novel mask: T={t}, model pick={_auto_blocks(mask)}", flush=True)

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(8, 8, t, 64)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(8, 8, t, 64)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(8, 8, t, 64)), jnp.bfloat16)

t0 = time.time()
out = flash_masked_attention(q, k, v, scale=0.125, attn_mask=mask)
jax.block_until_ready(out)
first = time.time() - t0
assert os.path.exists(cache_path), "tune cache not written"
cache = json.load(open(cache_path))
(key, entry), = cache.items()
print(
    json.dumps(
        {
            "part": "measure_mode",
            "first_call_s": round(first, 1),
            "cache_key": key,
            "measured_pick": entry[:2],
            "measured_ms": round(entry[2], 3),
            "model_pick": list(_auto_blocks(mask)),
        }
    ),
    flush=True,
)

# second call must reuse the cache (same pick, no re-sweep): time it
t0 = time.time()
out2 = flash_masked_attention(q, k, v, scale=0.125, attn_mask=mask)
jax.block_until_ready(out2)
print(
    json.dumps(
        {"part": "measure_mode_cached", "second_call_s": round(time.time() - t0, 2)}
    ),
    flush=True,
)
np.testing.assert_allclose(
    np.asarray(out, np.float32), np.asarray(out2, np.float32)
)
print("MEASURE MODE OK", flush=True)
