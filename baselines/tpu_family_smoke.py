"""On-chip AOT compile + one-step execution for every config FAMILY.

tpu_lowering_smoke.py covers kernel knobs; this covers the CONFIG
corpus: one representative per compile-distinct family of the
reference's 244-YAML DSL (SURVEY.md 2.11) and the generated corpus
archetypes — TCGA/CMU datasets x {MCA fcl, zorro (z), zorro+mean_pool
(j), bimodal (bm), EAO (e)} — each at its REAL canonical scale.  For
each family the production flat-state K=2 scan train step (fwd + loss
graph + bwd + AdamW) is AOT-compiled on the real TPU and executed
once; the jsonl records compile wall time, one-launch step time, and
the (finite) loss.  d/di (predrop) families change the DATA pipeline,
not the compiled graph, so they are covered by the base families here
and the predrop tests on CPU.

Usage:
  python baselines/tpu_family_smoke.py [--families tcga_mca,...]
                                       [--out tpu_family_smoke.jsonl]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CMU_SHAPES = {
    "COVAREP": (74, 1500),
    "FACET": (35, 450),
    "OpenFace": (713, 450),
    "glove_vectors": (300, 50),
}


def _cmu_overrides():
    return {
        "encoder_configs": {
            m: {
                "type": "EmbeddedSequenceEncoder",
                "input_size": d,
                "max_tokens": t,
            }
            for m, (d, t) in CMU_SHAPES.items()
        },
        "modality_config": {
            m: {
                "type": "embedded_sequence",
                "pad_len": t,
                "data_col_name": "data",
                "pad_token": -10000,
                "embedding_size": d,
            }
            for m, (d, t) in CMU_SHAPES.items()
        },
        "bimodal_contrastive": False,
        "non_fusion_fcl": False,
    }


def _eao_overrides():
    # ref EAO configs: e.g. configs/TCGA_config1_EAO.yaml
    return {
        "eao": True,
        "no_fusion": True,
        "mean_pool": True,
        "num_fusion_tokens": 0,
        "fusion_combos": [2],
        "fcl_root": [0, 1],
    }


# family -> (dataset, overrides); compile-distinct members of the
# corpus DSL (z / j / bm / e per dataset)
FAMILIES = {
    "tcga_mca": ("tcga", {}),
    "tcga_zorro": ("tcga", {"zorro": True}),
    "tcga_eao": ("tcga", _eao_overrides()),
    "cmu_mca": ("cmu", _cmu_overrides()),
    "cmu_zorro": ("cmu", dict(_cmu_overrides(), zorro=True)),
    "cmu_j": (
        "cmu",
        dict(
            _cmu_overrides(), zorro=True, mean_pool=True, fcl=False
        ),
    ),
    "cmu_bm": (
        "cmu",
        dict(
            _cmu_overrides(),
            bimodal_contrastive=True,
            non_fusion_fcl=True,
        ),
    ),
    "cmu_eao": ("cmu", dict(_cmu_overrides(), **_eao_overrides())),
}


def run_family(name: str, k: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mca_tpu.config import (
        get_model_config,
        training_config_from_dict,
    )
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.synthetic import make_cmu_like, make_tcga_like
    from mca_tpu.models import build_model
    from mca_tpu.train import (
        hf_lr_schedule,
        init_state,
        make_flat_apparatus,
        make_flat_train_step_scan,
        make_optimizer,
        step_metric_names,
    )

    dataset, overrides = FAMILIES[name]
    cfg = training_config_from_dict(
        ge._tcga_config(batch_size=8, **overrides)
    )
    model = build_model(get_model_config(cfg))
    if dataset == "cmu":
        samples = make_cmu_like(
            cfg.batch_size,
            shapes={
                m: (e["input_size"], e["max_tokens"])
                for m, e in cfg.encoder_configs.to_plain().items()
            },
            p_missing=0.25,
            seed=0,
        )
    else:
        widths = {
            m: c["pad_len"] for m, c in cfg.modality_config.items()
        }
        samples = make_tcga_like(
            cfg.batch_size, widths=widths, p_missing=0.25, seed=0
        )
    batch = MultimodalCollator(cfg.modality_config.to_plain())(samples)
    batch = jax.tree.map(jnp.asarray, batch)

    tx = make_optimizer(cfg, 1000)
    schedule = hf_lr_schedule(
        cfg.lr_scheduler_type, cfg.lr, cfg.num_warmup_steps, 1000
    )
    state = init_state(model, tx, batch, seed=0)
    names = step_metric_names(model, tx, schedule, state, batch)
    flat0, unravel, flat_tx = make_flat_apparatus(
        cfg, 1000, state["params"]
    )
    state = {
        "flat": flat0,
        "opt_state": flat_tx.init(flat0),
        "step": state["step"],
    }
    steps = make_flat_train_step_scan(
        model, flat_tx, schedule, unravel, names
    )
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch
    )
    t0 = time.perf_counter()
    compiled = steps.lower(state, stacked).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, packed = compiled(state, stacked)
    jax.block_until_ready(packed)
    launch_s = time.perf_counter() - t0
    import numpy as np

    loss = float(
        np.asarray(jax.device_get(packed))[-1][
            names.index("total_loss")
        ]
    )
    seq = (
        sum(
            e["max_tokens"]
            for e in cfg.encoder_configs.to_plain().values()
        )
        + cfg.num_fusion_tokens
    )
    rec = {
        "family": name,
        "ok": bool(np.isfinite(loss)),
        "seq_len": int(seq),
        "compile_s": round(compile_s, 1),
        "first_launch_s": round(launch_s, 2),
        "loss": round(loss, 4),
        "device": None,  # filled by caller (jax already imported)
    }
    rec["device"] = str(jax.devices()[0])
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families", default=",".join(FAMILIES), help="subset"
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tpu_family_smoke.jsonl",
        ),
    )
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ok = True
    for name in args.families.split(","):
        name = name.strip()
        if not name:
            continue
        try:
            rec = run_family(name, k=args.k)
        except Exception as e:  # record the failure, keep going
            rec = {
                "family": name,
                "ok": False,
                "error": f"{type(e).__name__}: {e}"[:500],
            }
        ok = ok and rec.get("ok", False)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
