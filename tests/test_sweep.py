"""The experiment-grid sweep (mca_tpu.tools.sweep): the committed
artifact schema guard plus a tiny end-to-end smoke of the pipeline
chaining — pretrain -> `_Ni` inference -> `_eval` probe through real
reference-DSL YAML files (ref README.md:19-42, SURVEY §2.11)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRID = os.path.join(REPO, "baselines", "sweep_grid.jsonl")

EXPECTED_CELLS = {
    "mca_d00", "mca_d15", "mca_d40",
    "zorro_d00", "zorro_d15", "zorro_d40",
    "eao_d00", "eao_d15", "eao_d40",
    "mca_d15_di60",
}


def test_sweep_grid_artifact_schema():
    """Pin the committed on-chip sweep artifact: all 10 cells present,
    every row carries the probe suite + retrieval summary."""
    if not os.path.exists(GRID):
        pytest.skip("sweep_grid.jsonl not yet produced")
    rows = {}
    with open(GRID) as f:
        for line in f:
            row = json.loads(line)
            rows[row["cell"]] = row
    assert EXPECTED_CELLS <= set(rows), (
        f"missing cells: {EXPECTED_CELLS - set(rows)}"
    )
    for cid in EXPECTED_CELLS:
        row = rows[cid]
        assert row["variant"] in ("mca", "zorro", "eao")
        assert 0.0 <= row["predrop"] <= 1.0
        p = row["probe"]
        for k in ("eval_f1", "eval_auroc", "eval_auprc", "eval_accuracy"):
            assert k in p, f"{cid} missing probe metric {k}"
            assert 0.0 <= float(p[k]) <= 1.0
        assert row["final_train_loss"] is not None
        # retrieval summary (averaged over modalities) must exist
        assert "test_r1_mean" in row["retrieval"], cid
        # the chained DSL config files are recorded
        assert set(row["configs"]) == {"train", "infer", "eval"}
    di = rows["mca_d15_di60"]
    assert di["infer_dropout"] == pytest.approx(0.60)


def test_sweep_table_renders(tmp_path):
    from mca_tpu.tools.sweep import render_table

    if not os.path.exists(GRID):
        pytest.skip("sweep_grid.jsonl not yet produced")
    rows = [json.loads(l) for l in open(GRID)]
    text = render_table(rows, str(tmp_path / "t.md"))
    assert "| cell |" in text
    for cid in EXPECTED_CELLS:
        assert cid in text


def test_sweep_cell_ids():
    from mca_tpu.tools.sweep import cell_id, default_cells

    assert {cell_id(c) for c in default_cells()} == EXPECTED_CELLS


@pytest.mark.slow
def test_sweep_tiny_end_to_end(tmp_path):
    """Run two grid cells (one MCA + the chained di60 cell) at tiny
    scale on CPU through the CLI — validates yaml generation, the
    restart-dir chaining, stage-skip resume, and the results/table
    writers."""
    out = tmp_path / "sweep"
    results = tmp_path / "grid.jsonl"
    table = tmp_path / "grid.md"
    cmd = [
        sys.executable, "-m", "mca_tpu.tools.sweep",
        "--out", str(out),
        "--tiny",
        "--epochs", "2",
        "--probe-epochs", "4",
        "--n-samples", "64",
        "--cells", "mca_d15,mca_d15_di60",
        "--results", str(results),
        "--table", str(table),
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    subprocess.run(cmd, check=True, env=env, cwd=REPO, timeout=900)
    rows = {json.loads(l)["cell"]: json.loads(l) for l in open(results)}
    assert set(rows) == {"mca_d15", "mca_d15_di60"}
    # the di60 cell reused mca_d15's pretrain: exactly ONE train dir
    assert sorted(os.listdir(out / "runs")) == [
        "mca_d15",
        "mca_d15_di60_infer",
        "mca_d15_di60_probe",
        "mca_d15_infer",
        "mca_d15_probe",
    ]
    # the generated reference-DSL configs exist and carry restart:
    import yaml

    ni = yaml.safe_load(
        open(out / "configs" / "TCGA_sweep_mca_d15_1i_di60.yaml")
    )
    assert ni["restart"].endswith(os.path.join("mca_d15", "1"))
    assert ni["predrop"] is True
    assert all(
        m["dropout"] == 0.60 for m in ni["modality_config"].values()
    )
    for row in rows.values():
        assert "eval_f1" in row["probe"]
    # re-running is a no-op resume: rows are read back, not re-trained
    p = subprocess.run(
        cmd, check=True, env=env, cwd=REPO, timeout=300,
        capture_output=True, text=True,
    )
    assert sum(1 for l in open(results)) == 2  # no duplicate rows
    assert table.exists() and "mca_d15" in open(table).read()
