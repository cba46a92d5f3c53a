"""Multi-process (multi-host) runtime support.

A TPU pod slice runs ONE Python process per host, each attached to its
local chips; ``jax.distributed`` wires those processes into a single
global runtime in which ``jax.devices()`` spans every host and a
``jit`` over a global ``Mesh`` inserts the cross-host collectives
(ICI/DCN) automatically.  This is the TPU-native counterpart of the
reference's multi-GPU story (torch DDP under ``accelerate launch`` —
rank/world_size + NCCL all-gathers, ref train_accel_gpu.py:93-95 and
utils/distributed.py:23-56): instead of wrapping the model per-rank,
the SPMD program stays the single-process one and only three runtime
concerns change:

1. the distributed runtime must be initialized before the first jax
   call (:func:`init_multihost`);
2. each process feeds only ITS rows of the global batch, assembled
   into one global array (:func:`global_batch`, over
   ``jax.make_array_from_process_local_data``);
3. host-side IO — JSONL/wandb logging, checkpoint writes, metric
   prints — runs on the primary process only (:func:`is_primary`);
   Orbax checkpoint saves are internally multi-process-aware and must
   be CALLED from every process (they coordinate), which
   ``mca_tpu.checkpoint`` already does.

Validated by a real 2-process CPU-backend distributed test
(tests/test_multihost.py): a DP train step over a global mesh spanning
two OS processes matches the single-process step bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_multihost",
    "is_primary",
    "local_rows",
    "global_batch",
    "check_mesh_alignment",
    "make_stager",
]


def make_stager(mesh: Mesh, global_batch_size: Optional[int] = None):
    """Process-aware batch staging closure shared by train() and
    infer(): single-process it is exactly
    :func:`mca_tpu.parallel.mesh.shard_batch`; multi-process each
    process slices ITS rows (:func:`local_rows`) and assembles the
    global sharded array (:func:`global_batch`).
    ``leading_scan_axis=True`` for stacked ``[K, B, ...]`` launches.
    ``global_batch_size`` enables the fail-fast mesh-ownership check
    on multi-process runs."""
    from mca_tpu.parallel.mesh import shard_batch

    n_proc = jax.process_count()
    if n_proc > 1 and global_batch_size:
        check_mesh_alignment(mesh, int(global_batch_size))

    def stage(b, leading_scan_axis: bool = False):
        if n_proc == 1:
            return shard_batch(b, mesh, leading_scan_axis)
        ax = 1 if leading_scan_axis else 0
        rows = local_rows(jax.tree.leaves(b)[0].shape[ax])
        sliced = jax.tree.map(
            lambda x: x[:, rows] if ax else x[rows], b
        )
        return global_batch(sliced, mesh, leading_scan_axis)

    return stage


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    Arguments default to the ``MCA_COORDINATOR`` /
    ``MCA_NUM_PROCESSES`` / ``MCA_PROCESS_ID`` environment variables
    (mirroring ``accelerate launch``'s rank environment for the
    reference, and trivially set by any pod launcher).  A no-op —
    returning False — when no multi-process environment is configured,
    so single-host entry points call it unconditionally.  On Cloud TPU
    pods with the standard metadata environment,
    ``jax.distributed.initialize()`` auto-discovers everything, so a
    bare ``MCA_MULTIHOST=auto`` also works.
    """
    if os.environ.get("MCA_MULTIHOST", "") == "auto":
        jax.distributed.initialize()
        return True
    coordinator = coordinator or os.environ.get("MCA_COORDINATOR", "")
    if num_processes is None:
        num_processes = int(os.environ.get("MCA_NUM_PROCESSES", "0"))
    if process_id is None:
        process_id = int(os.environ.get("MCA_PROCESS_ID", "-1"))
    if not coordinator or num_processes <= 1:
        return False
    if not 0 <= int(process_id) < int(num_processes):
        raise ValueError(
            f"MCA_PROCESS_ID={process_id} must be set to a rank in "
            f"[0, {num_processes}) when MCA_COORDINATOR/"
            "MCA_NUM_PROCESSES are configured"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    return True


def is_primary() -> bool:
    """True on the process that owns host-side IO (rank 0)."""
    return jax.process_index() == 0


def local_rows(n_global: int) -> slice:
    """This process's contiguous row block of a global batch.

    The global mesh enumerates devices process-major (process 0's
    devices first), so with the batch sharded ``P('data')`` each
    process's addressable shards are one contiguous chunk of rows.
    Every process runs the same data loader (same seed, same order)
    and slices its block — identical global-batch semantics to the
    single-process run without any cross-host data exchange.
    """
    n_proc = jax.process_count()
    if n_global % n_proc:
        raise ValueError(
            f"global batch {n_global} not divisible by "
            f"{n_proc} processes"
        )
    per = n_global // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch(batch, mesh: Mesh, leading_scan_axis: bool = False):
    """Assemble per-process local rows into global sharded arrays.

    The multi-process counterpart of
    :func:`mca_tpu.parallel.mesh.shard_batch`: each leaf of ``batch``
    holds only THIS process's rows (see :func:`local_rows`);
    ``jax.make_array_from_process_local_data`` stitches them into one
    global jax.Array sharded ``P('data')`` over the global mesh
    without ever materializing the full batch on any single host.
    ``leading_scan_axis=True`` for stacked ``[K, B, ...]`` multi-step
    launches (the scan axis stays unsharded).
    """
    spec = P(None, "data") if leading_scan_axis else P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def check_mesh_alignment(mesh: Mesh, global_batch_size: int) -> None:
    """Fail fast when per-process contiguous row feeding cannot match
    the mesh's 'data'-axis ownership.

    :func:`local_rows` assumes process p owns the p-th contiguous
    block of batch rows.  That holds when the mesh spans ALL devices
    process-major, the data axis divides evenly across processes, and
    the batch shards evenly over the data axis.  ``make_mesh`` can
    silently clamp the auto data axis (batch not divisible) and drop
    devices — single-host that only idles chips, but multi-host it
    desynchronises ownership from the contiguous row blocks and the
    first ``make_array_from_process_local_data`` call fails (or
    worse).  Called by train() before the first staging."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return
    n_dev = len(jax.devices())
    data_axis = int(mesh.shape.get("data", 1))
    problems = []
    if mesh.devices.size != n_dev:
        problems.append(
            f"mesh uses {mesh.devices.size} of {n_dev} devices "
            "(clamped/partial mesh)"
        )
    if data_axis % n_proc:
        problems.append(
            f"data axis {data_axis} not divisible by {n_proc} "
            "processes"
        )
    if global_batch_size % max(data_axis, 1):
        problems.append(
            f"batch {global_batch_size} not divisible by data axis "
            f"{data_axis}"
        )
    if problems:
        raise ValueError(
            "multi-host mesh/batch misalignment: "
            + "; ".join(problems)
            + " — pick batch_size divisible by the full device count "
            "(see SCALING.md §3)"
        )
