"""Memory-accounting tool: XLA's compiled memory analysis of one
train step, and the validation that `grad_accum` actually shrinks
activation (temp) memory — the claim that motivates the feature."""

import jax
import pytest

from mca_tpu.config import training_config_from_dict
from mca_tpu.data.synthetic import tiny_config
from mca_tpu.tools.memory_report import step_memory_analysis


@pytest.mark.slow
def test_memory_analysis_fields_and_grad_accum_shrinks_temp():
    cfg = training_config_from_dict(
        tiny_config(
            "tcga", batch_size=8, precision="fp32",
            attention_impl="dense",
        )
    )
    base = step_memory_analysis(cfg, grad_accum=1)
    accum = step_memory_analysis(cfg, grad_accum=4)
    for out in (base, accum):
        assert out["temp_size_in_bytes"] > 0
        assert out["peak_estimate_bytes"] >= out["temp_size_in_bytes"]
    # the whole point of grad_accum: activations peak at ONE microbatch
    assert (
        accum["temp_size_in_bytes"] < 0.6 * base["temp_size_in_bytes"]
    ), (base, accum)
    # params/opt-state (arguments) are untouched by accumulation
    assert (
        accum["argument_size_in_bytes"] == base["argument_size_in_bytes"]
    )


def test_memory_report_cli(tmp_path, capsys):
    import yaml

    from mca_tpu.tools import memory_report

    cfg = tiny_config(
        "tcga", batch_size=8, precision="fp32", attention_impl="dense"
    )
    cfg["output_dir"] = str(tmp_path / "out")
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    memory_report.main([str(path), "--json"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    rec = json.loads(out)
    assert rec["backend"] == jax.default_backend()
    assert rec["temp_size_in_bytes"] > 0
