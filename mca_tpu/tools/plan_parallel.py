"""Parallelism planner: pick a (dp, tp, pp, fsdp, grad_accum, remat)
plan for a config and a device fleet, from XLA's own memory model.

``python -m mca_tpu.tools.plan_parallel <config.yaml> --devices 8
[--hbm-gb 16] [--topk 5] [--exact] [--json]``

The reference's OOM story is try-it-and-see (torch reports allocator
stats only after a run dies); ``tools.memory_report`` already answers
"does THIS config fit?" — this tool answers the planning question one
level up: "how should I spread this config over N chips?".  It:

1. **enumerates** every legal plan: ``dp*tp*pp == devices``, batch
   divisible by ``dp*grad_accum``, ``heads % tp == 0``,
   ``layers % pp == 0``, fsdp only with ``dp > 1``;
2. **screens analytically**: per-device state bytes are EXACT (the
   real partition specs from ``mca_tpu.parallel.sharding`` applied to
   the real parameter/optimizer shape tree — the same rules the train
   step runs under), activation bytes come from an affine model
   ``temp(rows) = c0 + c1*rows`` fitted to two single-device XLA
   compiles per remat setting (XLA's compile-time memory analysis,
   measured near-linear in PERF.md: 22.84/5.96/3.13 GB at
   microbatch 8/2/1 rows of the canonical config);
3. **ranks** feasible plans by an estimated step time: compute spread
   over all chips, measured overhead factors (remat x1.28 — PERF.md
   batch-scaling table; GPipe bubble (M+S-1)/M), and an ICI term for
   the per-layer tensor-parallel all-reduces and the fsdp
   gather/scatter of the parameter vector;
4. optionally (``--exact``) **verifies** the top plans by actually
   compiling the sharded train step on a virtual CPU mesh of the
   requested size and reporting XLA's per-device memory analysis —
   the same numbers the real fleet would see for the same plan
   (exact per backend; CPU and TPU agree on operand/state bytes,
   workspace details differ).

Reference counterpart: none (the reference is DDP-only,
ref train_accel_gpu.py:93-95, and plans nothing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# hardware model (defaults are TPU v5e-class; override per fleet)
# ---------------------------------------------------------------------------

#: measured remat throughput cost at canonical scale (PERF.md: 28%)
REMAT_COST = 1.28
#: assumed achievable MFU for the compute term (measured 0.24-0.43
#: depending on model scale, PERF.md round 3) — only RELATIVE plan
#: ranking matters, so a constant is fine
ASSUMED_MFU = 0.25
#: bf16 peak per v5e chip
PEAK_FLOPS = 197e12
#: ICI all-reduce bandwidth per chip (v5e-class, ring collectives)
ICI_BYTES_PER_S = 9e10
#: leave headroom for XLA fragmentation/workspace on top of the
#: analytic peak when declaring a plan feasible
HBM_SAFETY = 0.92


def _divisors(n: int) -> List[int]:
    return [d for d in range(1, n + 1) if n % d == 0]


@dataclass
class Plan:
    dp: int
    tp: int
    pp: int = 1
    fsdp: bool = False
    grad_accum: int = 1
    remat: bool = False
    seq_shard: bool = False
    # filled by the scorer
    state_bytes: int = 0
    act_bytes: int = 0
    batch_bytes: int = 0
    peak_bytes: int = 0
    fits: bool = False
    est_step_ms: float = 0.0
    exact: Optional[Dict[str, int]] = field(default=None)

    def config_stanza(self) -> Dict[str, Any]:
        """The YAML keys that realise this plan in ``mca_tpu.train``."""
        out: Dict[str, Any] = {
            "mesh_data": self.dp,
            "mesh_model": self.tp,
        }
        if self.pp > 1:
            out["mesh_pipe"] = self.pp
        if self.fsdp:
            out["fsdp"] = True
        if self.grad_accum > 1:
            out["grad_accum"] = self.grad_accum
        if self.remat:
            out["remat"] = True
        if self.seq_shard:
            out["seq_shard"] = True
        return out


class _SpecMesh:
    """Duck-typed stand-in for a Mesh: the sharding rules only read
    ``mesh.shape`` (an axis-name -> size mapping), so plan memory can
    be computed without allocating dp*tp devices."""

    def __init__(self, dp: int, tp: int):
        self.shape = {"data": dp, "model": tp}


def _sharded_bytes(shapes, dp: int, tp: int, fsdp: bool) -> int:
    """Exact per-device bytes of a parameter/optimizer shape tree under
    the REAL partition rules (``mca_tpu.parallel.sharding``)."""
    import jax
    import numpy as np

    from mca_tpu.parallel.sharding import (
        FSDP_MIN_SIZE,
        _fsdp_extend,
        _spec_for_path,
    )

    mesh = _SpecMesh(dp, tp)
    total = 0

    def add(path, leaf):
        nonlocal total
        shape = tuple(getattr(leaf, "shape", ()))
        dtype = getattr(leaf, "dtype", None)
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        spec = _spec_for_path(path, shape, mesh)
        if fsdp:
            spec = _fsdp_extend(spec, shape, mesh, FSDP_MIN_SIZE)
        denom = 1
        for axis in spec:
            if axis is not None:
                denom *= mesh.shape[axis]
        if (
            fsdp
            and denom == 1
            and len(shape) == 1
            and size >= FSDP_MIN_SIZE
        ):
            # the fused optimizer's flat moment vectors rarely divide
            # dp exactly, but the flat apparatus PADS to divisibility
            # (make_flat_apparatus pad_to_multiple) and shards them
            # P('data') — model that, not the unpadded remainder
            denom = mesh.shape["data"]
        itemsize = np.dtype(dtype).itemsize if dtype is not None else 4
        total += -(-size * itemsize // denom)
        return leaf

    jax.tree_util.tree_map_with_path(add, shapes)
    return total


# ---------------------------------------------------------------------------
# model-shape facts from the config (for the memory/comm estimates)
# ---------------------------------------------------------------------------


def _synthetic_batch(config):
    """A collated synthetic batch at the config's batch size (numpy) —
    same recipe as ``tools.memory_report``."""
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like

    mod_cfg = config.modality_config.to_plain()
    if any("embedded" in c.get("type", "") for c in mod_cfg.values()):
        samples = make_cmu_like(
            config.batch_size,
            shapes={
                m: (e["input_size"], e["max_tokens"])
                for m, e in config.encoder_configs.to_plain().items()
            },
            p_missing=0.25,
            seed=0,
        )
    else:
        samples = make_tcga_like(
            config.batch_size,
            widths={m: c["pad_len"] for m, c in mod_cfg.items()},
            p_missing=0.25,
            seed=0,
        )
    return MultimodalCollator(mod_cfg)(samples)


def _model_facts(config) -> Dict[str, Any]:
    mods = config.modality_config.to_plain()
    # packed sequence length: sum of per-modality pad lengths plus the
    # fusion channel (n_fusion_tokens per combo is model-internal; the
    # dominant term is the modality tokens — this feeds only the tp
    # comm ESTIMATE, never a feasibility decision)
    tokens = sum(int(c.get("pad_len", 0)) for c in mods.values())
    return {
        "layers": int(config.layers),
        "heads": int(config.heads),
        "dim": int(config.hidden_size),
        "tokens_per_sample": tokens,
        "batch": int(config.batch_size),
    }


# ---------------------------------------------------------------------------
# activation model: temp(rows) = c0 + c1 * rows, fitted per remat mode
# from two single-device compiles (XLA memory analysis)
# ---------------------------------------------------------------------------


def fit_activation_model(
    config, remat: bool, probe_batches: Optional[Tuple[int, int]] = None
) -> Tuple[float, float]:
    """Fit ``temp(rows) = c0 + c1*rows`` from two single-device
    compiles at different batch sizes (XLA's exact compile-time temp
    bytes; near-linear in practice, PERF.md grad-accum table)."""
    b = int(config.batch_size)
    if probe_batches is None:
        lo = max(1, b // 4)
        probe_batches = (lo, b) if lo < b else (b, 2 * b)
    b1, b2 = probe_batches
    t1 = _temp_at_batch(config, b1, remat)
    t2 = _temp_at_batch(config, b2, remat)
    c1 = (t2 - t1) / float(b2 - b1)
    c0 = t1 - c1 * b1
    return max(c0, 0.0), max(c1, 0.0)


def _temp_at_batch(config, batch: int, remat: bool) -> int:
    from mca_tpu.tools.memory_report import step_memory_analysis

    cfg = type(config).from_dict(
        dict(config.to_plain(), batch_size=int(batch))
    )
    return step_memory_analysis(cfg, grad_accum=1, remat=remat)[
        "temp_size_in_bytes"
    ]


# ---------------------------------------------------------------------------
# enumeration + scoring
# ---------------------------------------------------------------------------


def enumerate_plans(
    config,
    n_devices: int,
    max_grad_accum: int = 16,
    allow_pp: bool = True,
) -> List[Plan]:
    facts = _model_facts(config)
    batch = facts["batch"]
    plans: List[Plan] = []
    for dp in _divisors(n_devices):
        if batch % dp:
            continue
        for tp in _divisors(n_devices // dp):
            if facts["heads"] % tp:
                continue
            pp_max = n_devices // (dp * tp)
            for pp in _divisors(pp_max):
                if dp * tp * pp != n_devices:
                    continue  # never leave chips idle
                if pp > 1 and (
                    not allow_pp or facts["layers"] % pp
                ):
                    continue
                per_dp = batch // dp
                gas = [
                    g
                    for g in (1, 2, 4, 8, 16)
                    if g <= max_grad_accum and per_dp % g == 0
                ]
                for ga in gas:
                    for remat in (False, True):
                        for fsdp in (
                            (False, True) if dp > 1 else (False,)
                        ):
                            plans.append(
                                Plan(
                                    dp=dp,
                                    tp=tp,
                                    pp=pp,
                                    fsdp=fsdp,
                                    grad_accum=ga,
                                    remat=remat,
                                    seq_shard=tp > 1,
                                )
                            )
    return plans


def score_plans(
    plans: List[Plan],
    config,
    *,
    hbm_bytes: float,
    act_models: Dict[bool, Tuple[float, float]],
    state_shapes,
    batch_bytes_full: int,
    flops_per_step: float,
) -> List[Plan]:
    """Fill memory + step-time estimates in-place; return plans sorted
    best-first (feasible plans first, then fastest estimate)."""
    facts = _model_facts(config)
    tokens = facts["tokens_per_sample"]
    layers = facts["layers"]
    for p in plans:
        p.state_bytes = _sharded_bytes(state_shapes, p.dp, p.tp, p.fsdp)
        c0, c1 = act_models[p.remat]
        rows = facts["batch"] // (p.dp * p.grad_accum)
        act = c0 + c1 * rows
        if p.pp > 1:
            # per-stage layer slice (1/pp of the blocks); with the
            # default M = S microbatches, each microbatch carries
            # rows/M activations and S of them are live at the bubble
            # peak — the two factors cancel, leaving ~act/pp.  Rough
            # estimate: verify pp plans with the pipeline harness.
            act = act / p.pp
        if p.seq_shard and p.tp > 1:
            # megatron-SP shards the between-block activations over tp;
            # attention workspace doesn't shrink — only halve the
            # linear term's share conservatively
            act = c0 + (c1 * rows) * (0.5 + 0.5 / p.tp)
        p.act_bytes = int(act)
        p.batch_bytes = batch_bytes_full // p.dp
        p.peak_bytes = p.state_bytes + p.act_bytes + p.batch_bytes
        p.fits = p.peak_bytes <= hbm_bytes * HBM_SAFETY

        # step-time estimate (relative ranking, not a promise)
        compute_s = flops_per_step / (
            p.dp * p.tp * p.pp * PEAK_FLOPS * ASSUMED_MFU
        )
        if p.remat:
            compute_s *= REMAT_COST
        if p.pp > 1:
            micro = max(p.pp, 1)  # pipeline_microbatches default: S
            compute_s *= (micro + p.pp - 1) / micro
        comm_s = 0.0
        if p.tp > 1:
            # 2 all-reduces per layer (fwd+bwd double it) of the local
            # activation block [rows*tokens, dim] in bf16
            bytes_ar = 4 * layers * (
                facts["batch"] // p.dp
            ) * tokens * facts["dim"] * 2
            comm_s += bytes_ar * (p.tp - 1) / p.tp / ICI_BYTES_PER_S
        if p.fsdp:
            # all-gather params fwd + reduce-scatter grads bwd vs DP's
            # all-reduce: ~same bytes; count the gather once
            param_bytes = _sharded_bytes(
                state_shapes["params"], 1, 1, False
            )
            comm_s += param_bytes / ICI_BYTES_PER_S
        # grad_accum re-spends the same FLOPs over ga scanned
        # microbatches inside one step — no extra compute, negligible
        # launch cost (the microbatch loop is a lax.scan)
        p.est_step_ms = (compute_s + comm_s) * 1e3
    plans.sort(key=lambda p: (not p.fits, p.est_step_ms, p.peak_bytes))
    return plans


# ---------------------------------------------------------------------------
# exact verification: compile the sharded step on a virtual mesh
# ---------------------------------------------------------------------------


def exact_plan_memory(
    config, plan: Plan, fsdp_min_size: Optional[int] = None
) -> Dict[str, int]:
    """Compile the real sharded train step for ``plan`` on a mesh of
    ``dp*tp`` local devices and return XLA's per-device memory
    analysis.  pp plans are not supported here (the pipeline step has
    its own harness, ``mca_tpu.parallel.pipeline``)."""
    import jax
    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mca_tpu.config import get_model_config
    from mca_tpu.models import build_model
    from mca_tpu.parallel.mesh import make_mesh
    from mca_tpu.parallel.sharding import (
        opt_state_shardings,
        param_shardings,
    )
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_optimizer,
        make_train_step,
    )

    assert plan.pp == 1, "exact verification covers dp/tp/fsdp plans"
    n = plan.dp * plan.tp
    assert len(jax.devices()) >= n, (
        f"need {n} local devices for exact verification — run under "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n} (the "
        "CLI does this for you with --exact)"
    )
    mesh = make_mesh(plan.dp, plan.tp)
    batch = jax.tree.map(jnp.asarray, _synthetic_batch(config))

    mc = get_model_config(config)
    if plan.seq_shard and plan.tp > 1:
        mc = dict(mc, seq_shard=True, seq_shard_mesh=mesh)
    model = build_model(mc)
    tx = make_optimizer(config, 1000)
    schedule = hf_lr_schedule(
        config.lr_scheduler_type, config.lr,
        config.num_warmup_steps, 1000,
    )
    state_shapes = jax.eval_shape(
        lambda b: init_state(model, tx, b, seed=0), batch
    )
    from mca_tpu.parallel.sharding import FSDP_MIN_SIZE

    min_size = (
        FSDP_MIN_SIZE if fsdp_min_size is None else fsdp_min_size
    )
    shardings = {
        "params": param_shardings(
            state_shapes["params"], mesh, fsdp=plan.fsdp,
            fsdp_min_size=min_size,
        ),
        "opt_state": opt_state_shardings(
            state_shapes["opt_state"], mesh, fsdp=plan.fsdp,
            fsdp_min_size=min_size,
        ),
        "step": NamedSharding(mesh, P()),
    }
    state_sds = jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        state_shapes,
        shardings,
    )
    bshard = NamedSharding(mesh, P("data"))
    batch_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=bshard),
        batch,
    )
    step = make_train_step(
        model,
        tx,
        schedule,
        n_accum=plan.grad_accum,
        out_shardings=(shardings, NamedSharding(mesh, P())),
    )
    compiled = step.lower(state_sds, batch_sds).compile()
    ma = compiled.memory_analysis()
    out = {}
    for f in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
    ):
        v = getattr(ma, f, None)
        if v is not None:
            out[f] = int(v)
    out["peak_estimate_bytes"] = (
        out.get("argument_size_in_bytes", 0)
        + out.get("output_size_in_bytes", 0)
        + out.get("temp_size_in_bytes", 0)
        - out.get("alias_size_in_bytes", 0)
    )
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def plan(
    config,
    n_devices: int,
    hbm_gb: float = 16.0,
    topk: int = 5,
    exact: bool = False,
    max_grad_accum: int = 16,
    allow_pp: bool = True,
) -> List[Plan]:
    """Rank parallelism plans for ``config`` on ``n_devices`` chips
    with ``hbm_gb`` HBM each; optionally verify the top dp/tp/fsdp
    plans with a real sharded compile."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mca_tpu.config import get_model_config
    from mca_tpu.models import build_model
    from mca_tpu.train import init_state, make_optimizer

    batch = _synthetic_batch(config)
    batch_bytes = int(
        sum(np.asarray(x).nbytes for x in jax.tree.leaves(batch))
    )
    model = build_model(get_model_config(config))
    tx = make_optimizer(config, 1000)
    state_shapes = jax.eval_shape(
        lambda b: init_state(model, tx, b, seed=0),
        jax.tree.map(jnp.asarray, batch),
    )

    # analytic FLOPs: 6 * params * tokens (fwd 2x + bwd 4x) — the
    # RELATIVE ranking between plans is what matters
    param_count = sum(
        int(np.prod(l.shape, dtype=np.int64))
        for l in jax.tree.leaves(state_shapes["params"])
    )
    facts = _model_facts(config)
    flops = 6.0 * param_count * facts["tokens_per_sample"] * facts[
        "batch"
    ]

    act_models = {
        r: fit_activation_model(config, remat=r) for r in (False, True)
    }
    plans = enumerate_plans(
        config, n_devices, max_grad_accum=max_grad_accum,
        allow_pp=allow_pp,
    )
    plans = score_plans(
        plans,
        config,
        hbm_bytes=hbm_gb * 2**30,
        act_models=act_models,
        state_shapes=state_shapes,
        batch_bytes_full=batch_bytes,
        flops_per_step=flops,
    )
    if exact:
        for p in plans[:topk]:
            if p.pp == 1 and p.dp * p.tp <= len(jax.devices()):
                p.exact = exact_plan_memory(config, p)
    return plans


def _fmt_gb(n: float) -> str:
    for div, unit in ((2**30, "G"), (2**20, "M"), (2**10, "K")):
        if n >= div:
            return f"{n / div:.2f}{unit}"
    return f"{int(n)}B"


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # --exact compiles sharded steps: needs a CPU mesh of the requested
    # size, and the flags must land before the backend initialises
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--devices", type=int, default=8)
    pre.add_argument("--exact", action="store_true")
    known, _ = pre.parse_known_args(argv)
    if known.exact and "_MCA_PLAN_REEXEC" not in os.environ:
        flags = os.environ.get("XLA_FLAGS", "")
        want = (
            f"--xla_force_host_platform_device_count={known.devices}"
        )
        if want not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} {want}".strip()
            os.environ["_MCA_PLAN_REEXEC"] = "1"
            os.execv(
                sys.executable,
                [sys.executable, "-m", "mca_tpu.tools.plan_parallel"]
                + argv,
            )
    import jax

    # planning is shape-only: never touch (or wait for) the TPU
    # tunnel — a down remote backend would hang the tool (a platform
    # list must START with cpu to be init-safe on this image)
    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--devices", type=int, default=8,
                   help="total chips to plan for")
    p.add_argument("--hbm-gb", type=float, default=16.0,
                   help="HBM per chip (v5e: 16)")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--exact", action="store_true",
                   help="verify top plans with a real sharded compile "
                        "on a virtual CPU mesh")
    p.add_argument("--no-pp", action="store_true",
                   help="exclude pipeline-parallel plans")
    p.add_argument("--max-grad-accum", type=int, default=16)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from mca_tpu.config import training_config

    config = training_config(args.config, make_output_dir=False)
    plans = plan(
        config,
        args.devices,
        hbm_gb=args.hbm_gb,
        topk=args.topk,
        exact=args.exact,
        max_grad_accum=args.max_grad_accum,
        allow_pp=not args.no_pp,
    )
    top = plans[: args.topk]
    if args.json:
        print(
            json.dumps(
                [
                    dict(asdict(t), config_stanza=t.config_stanza())
                    for t in top
                ]
            )
        )
        return
    print(
        f"plans for {args.devices} devices x {args.hbm_gb}G HBM "
        f"(batch {config.batch_size}); {len(plans)} enumerated, "
        f"{sum(p.fits for p in plans)} fit"
    )
    hdr = (
        f"{'rank':>4} {'dp':>3} {'tp':>3} {'pp':>3} {'fsdp':>5} "
        f"{'ga':>3} {'remat':>6} {'state':>8} {'acts':>8} "
        f"{'peak':>8} {'fits':>5} {'est ms':>8}"
    )
    print(hdr)
    for i, t in enumerate(top):
        row = (
            f"{i:>4} {t.dp:>3} {t.tp:>3} {t.pp:>3} "
            f"{str(t.fsdp):>5} {t.grad_accum:>3} {str(t.remat):>6} "
            f"{_fmt_gb(t.state_bytes):>8} {_fmt_gb(t.act_bytes):>8} "
            f"{_fmt_gb(t.peak_bytes):>8} {str(t.fits):>5} "
            f"{t.est_step_ms:>8.1f}"
        )
        print(row)
        if t.exact:
            print(
                f"     exact/device: args "
                f"{_fmt_gb(t.exact['argument_size_in_bytes'])} temp "
                f"{_fmt_gb(t.exact['temp_size_in_bytes'])} peak "
                f"{_fmt_gb(t.exact['peak_estimate_bytes'])}"
            )
    best = next((t for t in top if t.fits), None)
    if best is None:
        print(
            "no plan fits — raise grad_accum/remat limits, add chips, "
            "or shrink the batch"
        )
        return
    print("recommended config stanza:")
    for k, v in best.config_stanza().items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
