"""Worker process for tests/test_preempt.py.

Usage: python _preempt_worker.py <config.yaml> <output_dir>

Runs the real training CLI (``mca_tpu.train.main``) on the CPU backend
and self-delivers SIGTERM from a watcher thread once the JSONL shows a
couple of completed steps — the signal therefore arrives at an
arbitrary point mid-run (possibly mid-step), exactly like a TPU-VM
preemption notice, and the ``preempt_save`` guard must catch it at the
next launch boundary, checkpoint, and exit 75.
"""

import os
import signal
import sys
import threading
import time

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env var

cfg_path, out_dir = sys.argv[1], sys.argv[2]


def _sniper():
    path = os.path.join(out_dir, "metrics.jsonl")
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            with open(path) as f:
                rows = sum(1 for line in f if "total_loss" in line)
            if rows >= 2:
                os.kill(os.getpid(), signal.SIGTERM)
                return
        except FileNotFoundError:
            pass
        time.sleep(0.02)


threading.Thread(target=_sniper, daemon=True).start()

from mca_tpu.train import main  # noqa: E402

main([cfg_path])
