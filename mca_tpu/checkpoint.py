"""Orbax checkpoint/resume with the reference's directory layout.

The reference saves Accelerate state per-epoch under
``output_dir/<epoch>/`` plus step checkpoints into ``output_dir``
(ref train_accel_gpu.py:122-123, 133-134) and resumes via
``config.restart`` pointing at such a directory (ref :97-99,
infer_accel_gpu.py:90-92).  We keep the same layout (so ``*_Ni``
restart configs keep working) with Orbax as the serialisation engine;
the train state is ``{params, opt_state, step, epoch}``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves() -> None:
    """Block until all asynchronous saves have committed."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_state(
    state: Any, directory: str, *, asynchronous: bool = False
) -> None:
    """Save a train-state pytree under ``directory/state``.

    ``asynchronous=True`` overlaps the disk write with subsequent
    device work (the device->host copy still happens before return, so
    donated buffers are safe to reuse); call :func:`wait_for_saves`
    before reading the checkpoint back or exiting.
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "state")
    # fully materialise on host: checkpoints must be readable anywhere
    host_state = jax.tree.map(np.asarray, jax.device_get(state))
    if asynchronous:
        _async_checkpointer().save(path, host_state, force=True)
    else:
        _checkpointer().save(path, host_state, force=True)


def load_state(directory: str, target: Optional[Any] = None) -> Any:
    """Restore a train-state pytree from ``directory/state``.

    ``target`` (an abstract or concrete pytree) restores with matching
    structure/dtypes; without it, raw arrays come back.
    """
    path = os.path.join(os.path.abspath(directory), "state")
    if target is not None:
        return _checkpointer().restore(path, item=target)
    return _checkpointer().restore(path)


def save_params(params: Any, directory: str) -> None:
    """Final model save (the reference's ``save_model`` safetensors,
    ref train_accel_gpu.py:187)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    host = jax.tree.map(np.asarray, jax.device_get(params))
    _checkpointer().save(
        os.path.join(directory, "model"), host, force=True
    )


def load_params(directory: str, target: Optional[Any] = None) -> Any:
    path = os.path.join(os.path.abspath(directory), "model")
    if target is not None:
        return _checkpointer().restore(path, item=target)
    return _checkpointer().restore(path)
