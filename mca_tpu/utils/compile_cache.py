"""Persistent XLA compilation cache for every entry point.

On this class of hardware a cold compile of the canonical train graph
through the remote-compile service costs 5-15 minutes (PERF.md); the
persistent cache stores the serialized executable client-side keyed
by HLO hash, so restarts, benchmark reruns, and repeated CLI
invocations skip compilation entirely.  Torch has no equivalent
ahead-of-run cache for the reference (inductor caches locally but the
reference never runs compiled).

Enabled by default in the CLI mains and bench.py; ``MCA_COMPILE_CACHE``
overrides the directory, ``MCA_COMPILE_CACHE=0`` disables.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "mca_tpu", "xla"
)


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache dir; returns the
    directory used, or None when disabled (``MCA_COMPILE_CACHE=0``).

    Safe to call more than once and before/after backend init."""
    import jax

    path = path or os.environ.get("MCA_COMPILE_CACHE", _DEFAULT)
    if not path or path == "0":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took measurable compile time; the
        # default (1s) already excludes trivial kernels
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:  # never let cache plumbing break a run
        logger.exception("compilation cache unavailable (non-fatal)")
        return None
    return path
