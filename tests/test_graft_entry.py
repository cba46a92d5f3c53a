"""Driver-contract checks: entry() is jittable; dryrun_multichip runs
a full DP+TP train step on the virtual 8-device mesh."""

import jax
import pytest


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


def test_bench_json_contract():
    """bench.py must emit one JSON object with the driver's keys."""
    import json
    import re

    src = open("bench.py").read()
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert f'"{key}"' in src
    assert "json.dumps" in src
