"""Step logging + throughput metering.

The reference logs per-step metrics to wandb via Accelerate
(``train_accel_gpu.py:126-130``).  Here the default sink is a local
JSONL file (one dict per line, always available, machine-readable for
the probe/bench harnesses); wandb is mirrored when installed AND
enabled in the config.  A :class:`ThroughputMeter` provides the
tokens/sec/chip numbers the TPU rebuild is benchmarked on, and
:func:`trace_context` wraps ``jax.profiler`` for on-demand traces —
the observability the reference lacked (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


def _to_scalar(v: Any) -> Any:
    try:
        import numpy as np

        if hasattr(v, "item"):
            return v.item()
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
    except Exception:
        pass
    return v


class NullLogger:
    """Metric-logger stand-in for non-primary processes in a
    multi-host run (rank 0 owns the JSONL file and the wandb stream;
    every process still participates in checkpoints/collectives)."""

    def log(self, metrics, step=None):
        pass

    def close(self):
        pass


class JSONLLogger:
    """Append-only JSONL metric log with optional wandb mirroring.

    Note: NaN pair-losses (all-samples-missing batches, see
    mca_tpu.losses) are written as bare ``NaN`` tokens — Python's
    ``json.loads`` accepts them; strict JSON parsers may not.
    """

    def __init__(
        self,
        output_dir: str,
        filename: str = "metrics.jsonl",
        wandb_config: Optional[Dict[str, Any]] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._file = open(self.path, "a", buffering=1)
        self._wandb = None
        if wandb_config:
            try:
                import wandb

                self._wandb = wandb.init(**wandb_config)
            except Exception:
                self._wandb = None  # wandb absent: JSONL only

    @property
    def wandb_id(self) -> Optional[str]:
        """The active wandb run id (None when mirroring is off) — the
        preemption marker records it so a rescheduled run resumes the
        SAME wandb run (ref train_accel_gpu.py:60-62 semantics without
        the user having to copy the id by hand)."""
        return self._wandb.id if self._wandb is not None else None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        record = {k: _to_scalar(v) for k, v in metrics.items()}
        if step is not None:
            record["step"] = int(step)
        record["time"] = time.time()
        self._file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in record.items() if k != "time"},
                step=step,
            )

    def close(self):
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


class ThroughputMeter:
    """Sliding-window tokens/sec and step-time tracking.

    Steps arrive in bursts (K per launch with scanned launches), so the
    window must span several launches; compile time is naturally
    excluded because steps are stamped when their launch RETURNS.  The
    cumulative-since-warmup variant this replaces under-reported short
    runs badly: one slow early launch (cold allocation, checkpoint
    write) depressed the average forever.
    """

    def __init__(
        self,
        tokens_per_step: int,
        warmup_steps: int = 2,
        window: int = 256,
    ):
        from collections import deque

        self.tokens_per_step = tokens_per_step
        self.warmup_steps = warmup_steps
        self._steps = 0
        # (stamp_time, steps_in_burst) per LAUNCH: stamps arriving
        # within one burst merge into the last entry, so the window
        # always starts at a launch boundary and the rate counts
        # exactly the steps completed between the first and last stamp
        # (per-step stamps made partial bursts over-report up to ~2x)
        self._times: "deque" = deque(maxlen=window + 1)

    def step(self, n: int = 1):
        """Record ``n`` completed steps (stamp once per launch)."""
        self._steps += n
        if self._steps <= self.warmup_steps:
            return
        now = time.perf_counter()
        if self._times and now - self._times[-1][0] < 0.005:
            t, c = self._times[-1]
            self._times[-1] = (t, c + n)
        else:
            self._times.append((now, n))

    @property
    def tokens_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1][0] - self._times[0][0]
        if dt <= 0:
            return 0.0
        n = sum(c for _, c in list(self._times)[1:])
        return n * self.tokens_per_step / dt

    @property
    def step_ms(self) -> float:
        if len(self._times) < 2:
            return 0.0
        n = sum(c for _, c in list(self._times)[1:])
        return (
            (self._times[-1][0] - self._times[0][0]) / max(n, 1) * 1000.0
        )


@contextmanager
def trace_context(trace_dir: Optional[str]):
    """jax.profiler trace over a block when ``trace_dir`` is set."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
