"""Worker process for tests/test_multihost.py.

Usage: python _multihost_worker.py <pid> <nproc> <port> <outdir> [mode]

Each OS process contributes 2 virtual CPU devices to a global
jax.distributed runtime, runs ONE data-parallel train step over the
global ('data',) mesh — feeding only its own rows via
mca_tpu.parallel.multihost.global_batch — and process 0 writes the
loss and updated parameters for the parent test to compare against
the single-process oracle.  mode 'toy' (default) is a tanh-regression
SGD step; mode 'mca' is the REAL tiny-MCA train step (AdamW, the
production _step_body).
"""

import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)
mode = sys.argv[5] if len(sys.argv) > 5 else "toy"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env var

from mca_tpu.parallel.multihost import (  # noqa: E402
    global_batch,
    init_multihost,
    is_primary,
    local_rows,
)

assert init_multihost(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def run_mca():
    """The real thing: one MCA train step (AdamW) on a global mesh
    spanning both processes, batch rows fed per-process."""
    from mca_tpu.config import (
        get_model_config,
        training_config_from_dict,
    )
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_tcga_like, tiny_config
    from mca_tpu.models import build_model
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    B = 8
    cfg = training_config_from_dict(
        tiny_config(
            "tcga", batch_size=B, precision="fp32",
            attention_impl="dense",
        )
    )
    widths = {
        m: c["pad_len"] for m, c in cfg.modality_config.items()
    }
    samples = make_tcga_like(
        B, widths=widths, p_missing=0.25, seed=0
    )
    batch_np = MultimodalCollator(cfg.modality_config.to_plain())(
        samples
    )
    mc = get_model_config(cfg)
    model = build_model(mc)
    tx = make_optimizer(cfg, 10)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 10
    )
    # init on host-identical values (same seed on every process), then
    # place replicated over the GLOBAL mesh
    state = init_state(
        model, tx, jax.tree.map(jnp.asarray, batch_np), seed=0
    )
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(jax.device_get(x))
        ),
        state,
    )
    rows = local_rows(B)
    gbatch = global_batch(
        jax.tree.map(lambda x: x[rows], batch_np), mesh
    )
    step = make_train_step(model, tx, schedule)
    state, metrics = step(state, gbatch)
    if is_primary():
        flat = {
            f"p{i}": np.asarray(jax.device_get(leaf))
            for i, leaf in enumerate(jax.tree.leaves(state["params"]))
        }
        np.savez(
            os.path.join(outdir, "result.npz"),
            loss=np.asarray(jax.device_get(metrics["total_loss"])),
            **flat,
        )


def run_train():
    """The FULL production train() loop under jax.distributed: both
    processes run the same loop over the same deterministic loader,
    each staging its own rows; rank 0 writes metrics.jsonl; Orbax
    checkpoints coordinate across processes."""
    from mca_tpu.config import training_config_from_dict
    from mca_tpu.data.synthetic import tiny_config
    from mca_tpu.train import train

    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    cfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=widths,
            batch_size=8,
            epochs=2,
            lr=2e-3,
            num_warmup_steps=2,
        )
    )
    cfg.dataset = os.path.join(outdir, "dataset")
    cfg.output_dir = os.path.join(outdir, "out_mh")
    cfg.split = 0.25
    train(cfg)

    # then multi-host batch inference from the trained checkpoint:
    # every process stages its rows; rank 0 writes the .pt files
    from mca_tpu.infer import infer

    icfg = training_config_from_dict(
        tiny_config(
            "tcga",
            widths=widths,
            batch_size=8,
            epochs=2,
            lr=2e-3,
            num_warmup_steps=2,
        )
    )
    icfg.dataset = cfg.dataset
    icfg.restart = os.path.join(cfg.output_dir, "1")
    icfg.output_dir = os.path.join(outdir, "out_mh_infer")
    icfg.split = 0.25
    infer(icfg)


if mode == "mca":
    run_mca()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker_done")
    print("WORKER_OK", pid)
    sys.exit(0)

if mode == "train":
    run_train()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker_done")
    print("WORKER_OK", pid)
    sys.exit(0)

B, D, LR = 8, 16, 0.1

# identical on every process (same seed) — like the shared data loader
rng = np.random.default_rng(0)
w0 = jnp.asarray(rng.normal(size=(D, D)) * 0.3, jnp.float32)
x_global = rng.normal(size=(B, D)).astype(np.float32)
t_global = rng.normal(size=(B, D)).astype(np.float32)

mesh = Mesh(np.asarray(jax.devices()), ("data",))
rows = local_rows(B)
batch = global_batch(
    {"x": x_global[rows], "t": t_global[rows]}, mesh
)
w0 = jax.device_put(w0, NamedSharding(mesh, P()))


def loss_fn(w, b):
    return jnp.mean((jnp.tanh(b["x"] @ w) - b["t"]) ** 2)


@jax.jit
def step(w, b):
    loss, g = jax.value_and_grad(loss_fn)(w, b)
    return loss, w - LR * g


loss, w1 = step(w0, batch)
if is_primary():
    np.savez(
        os.path.join(outdir, "result.npz"),
        loss=np.asarray(jax.device_get(loss)),
        w1=np.asarray(jax.device_get(w1)),
    )
# all processes exit together (distributed shutdown needs everyone)
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("worker_done")
print("WORKER_OK", pid)
