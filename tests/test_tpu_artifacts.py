"""Guards over the committed on-chip artifacts.

The real-TPU runs (kernel parity, Mosaic lowering smoke, config-family
AOT smoke) are too slow/chip-bound for CI; their committed jsonl
artifacts are the record.  These tests pin that the artifacts exist,
parse, cover every expected case, and are all-green — so a session
that regenerates them with failures (or forgets a family) fails fast
on CPU.
"""

import json
import os

import pytest

BASE = os.path.join(os.path.dirname(__file__), "..", "baselines")


def _rows(name):
    path = os.path.join(BASE, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_family_smoke_all_green():
    """Every compile-distinct config family of the reference corpus
    DSL (SURVEY.md 2.11) has a green on-chip AOT compile+launch row
    (latest row wins per family)."""
    from baselines.tpu_family_smoke import FAMILIES

    rows = _rows("tpu_family_smoke.jsonl")
    latest = {r["family"]: r for r in rows}
    missing = set(FAMILIES) - set(latest)
    assert not missing, f"families never smoked on-chip: {missing}"
    bad = [f for f, r in latest.items() if not r.get("ok")]
    assert not bad, f"families failing on-chip: {bad}"
    # the record must be from the real chip, not an interpret run
    assert all(
        "TPU" in r.get("device", "") for r in latest.values()
    )


def test_kernel_parity_verdict_ok():
    """tpu_kernel_parity.py appends a verdict row (flash <= 2x the
    same-dtype dense error vs the fp32/HIGHEST reference; 3x for the
    precision-trading exp2 / bf16-prob knobs).  The LATEST verdict on
    record must be green, and measurement rows must exist."""
    rows = _rows("tpu_kernel_parity.jsonl")
    verdicts = [r for r in rows if "criterion" in r]
    measurements = [r for r in rows if "criterion" not in r]
    assert measurements and verdicts
    assert verdicts[-1]["ok"] is True, verdicts[-1]


def test_lowering_smoke_all_ok():
    rows = _rows("tpu_lowering_smoke.jsonl")
    assert rows
    bad = [r for r in rows if r.get("ok") is False]
    assert not bad, f"lowering regressions: {bad[:3]}"
