"""Device-side serving-forward A/B, fp vs int8 (mca_tpu.ops.quant):
K=32 chained forwards inside ONE executable (dispatch amortised,
results chained so nothing is cached - PERF.md methodology).
Measured on the v5e (PERF.md round 3): fp 22.99 -> int8 18.73
ms/forward, x1.23 - attention stays bf16; the five projections run
s8xs8->s32.  Through the remote relay the ONLINE serving path is
dispatch-bound (~90 ms/launch, baselines/serve_bench.py), so int8 is
latency-neutral there; the device-side win shows on attached hosts."""
sys.path.insert(0, "/root/.axon_site")
import jax, jax.numpy as jnp, numpy as np
from mca_tpu.config import training_config_from_dict, get_model_config
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like
from mca_tpu.models import build_model
from mca_tpu.ops.quant import quantize_params
import __graft_entry__ as ge

K = 32
cfg = training_config_from_dict(ge._tcga_config())
mc = get_model_config(cfg)
mods = cfg.modality_config.to_plain()
widths = {m: c["pad_len"] for m, c in mods.items()}
batch = MultimodalCollator(mods)(
    make_tcga_like(8, widths=widths, p_missing=0.25, seed=0)
)
batch = jax.tree.map(jnp.asarray, batch)
mod0 = sorted(mods)[0]
field0 = mods[mod0].get("data_col_name", "values")

model_fp = build_model(mc)
params_fp = jax.jit(model_fp.init)(jax.random.key(0), batch)
model_q = build_model(dict(mc, quant="int8"))
params_q = quantize_params(params_fp)

def run(model, params, label):
    def one(c, _):
        b = dict(batch)
        b[mod0] = dict(batch[mod0])
        b[mod0][field0] = batch[mod0][field0] + c * jnp.asarray(1e-6, batch[mod0][field0].dtype)
        out = model.apply(params, b, no_loss=True)
        key = sorted(k for k in out if k != "modality_sample_mask")[0]
        return jnp.mean(out[key]).astype(jnp.float32), None
    @jax.jit
    def scan_k(c):
        c, _ = jax.lax.scan(one, c, None, length=K)
        return c
    c = jnp.float32(0.0)
    c = scan_k(c); jax.block_until_ready(c)         # compile + warm
    t0 = time.perf_counter()
    for _ in range(3):
        c = scan_k(c + jnp.float32(1e-9))
    jax.block_until_ready(c)
    ms = (time.perf_counter() - t0) / (3 * K) * 1000
    print(f"{label}: {ms:.3f} ms/forward (batch 8, K={K} chained x3)")
    return ms

fp = run(model_fp, params_fp, "fp (bf16)")
q = run(model_q, params_q, "int8")
print(f"speedup x{fp/q:.3f}")
