"""Driver-contract checks: entry() is jittable; dryrun_multichip runs
a full DP+TP train step on the virtual 8-device mesh."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    assert "dryrun_multichip OK" in capsys.readouterr().out


def test_entry_traces():
    import __graft_entry__ as ge

    fn, (params, batch) = ge.entry()
    # abstract trace only — full-scale compile is the driver's job
    shape = jax.eval_shape(fn, params, batch)
    assert shape.shape == ()


@pytest.mark.slow
def test_dryrun_self_provisions_clean_env():
    """The driver calls dryrun_multichip WITHOUT the pytest conftest env:
    it must provision its own virtual mesh (VERDICT r1 item 1)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "MCA_DRYRUN_CHILD")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


def test_bench_json_contract():
    """bench.py must emit one JSON object with the driver's keys."""
    import json
    import re

    src = open("bench.py").read()
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert f'"{key}"' in src
    assert "json.dumps" in src
