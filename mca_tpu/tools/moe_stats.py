"""MoE routing diagnostics: ``python -m mca_tpu.tools.moe_stats``.

Expert-choice routing (``mca_tpu.models.moe``) is load-balanced by
construction — each expert always processes exactly ``C`` tokens — so
the quantity worth inspecting is the TOKEN side: which fraction of
real tokens get picked by at least one expert (a dropped token's FF
contribution is zero and the residual carries it), how many experts
pick a typical token, and how much router probability mass each expert
attracts.  These drive the ``moe_capacity_factor`` choice: coverage
near 1.0 means ``cf`` is high enough that essentially no token is
dropped; a climbing experts-per-token means experts overlap and ``cf``
could come down.

Runs one batch through a (trained or fresh) MoE checkpoint with
``mutable=["intermediates"]`` — the ``sow`` hooks in
:class:`~mca_tpu.models.moe.MoEFeedForward` are no-ops on the
training/inference hot paths and only materialise here.

Usage::

    python -m mca_tpu.tools.moe_stats config.yaml \
        [--out moe_stats.json] [--split train|test]

``config.yaml`` is a training config with ``moe_experts > 0``; with
``restart:`` set the checkpointed parameters are loaded.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Any, Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def routing_stats(
    scores: np.ndarray, token_idx: np.ndarray, gates: np.ndarray
) -> Dict[str, Any]:
    """Token-side routing statistics for one MoE call.

    ``scores`` [B, T, E] (padded tokens are all-zero rows — the module
    masks them before top_k), ``token_idx``/``gates`` [B, E, C].
    """
    B, T, E = scores.shape
    C = token_idx.shape[-1]
    real = scores.sum(-1) > 0  # [B, T]; padded rows were zeroed
    n_real = int(real.sum())

    # how many experts picked each token
    picks = np.zeros((B, T), np.int32)
    for b in range(B):
        for e in range(E):
            picks[b, token_idx[b, e]] += 1
    covered = (picks > 0) & real
    per_expert_mass = np.zeros(E)
    if n_real:
        per_expert_mass = scores[real].mean(0)  # [E]

    return {
        "experts": int(E),
        "capacity": int(C),
        "tokens_real": n_real,
        "tokens_total": int(B * T),
        "coverage_real": float(covered.sum() / max(n_real, 1)),
        "experts_per_real_token": float(
            picks[real].mean() if n_real else 0.0
        ),
        "mean_gate": float(gates.mean()),
        # balanced routing => each entry ~ 1/E
        "expert_prob_mass": [round(float(v), 6) for v in per_expert_mass],
    }


def extract_moe_stats(config, split: str = "train") -> List[Dict[str, Any]]:
    import jax
    import jax.numpy as jnp

    from mca_tpu.config import get_model_config
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.data.dataset import BatchedLoader, setup_data
    from mca_tpu.infer import _restore_params
    from mca_tpu.models import build_model

    model_config = get_model_config(config)
    assert int(model_config.get("moe_experts", 0) or 0) > 0, (
        "moe_stats needs a config with moe_experts > 0"
    )
    model = build_model(model_config)
    mc = (
        config.modality_config.to_plain()
        if hasattr(config.modality_config, "to_plain")
        else config.modality_config
    )
    datasets = setup_data(
        config.dataset,
        split=config.split,
        ds_frac=config.ds_frac,
        ds_seed=config.ds_seed,
        predrop=config.predrop,
        predrop_config=mc,
    )
    dl = BatchedLoader(
        datasets["train" if split == "train" else "test"],
        MultimodalCollator(mc),
        config.batch_size,
        preload=True,
    )
    batch = jax.tree.map(jnp.asarray, dl.first_batch())
    params = jax.jit(model.init)(jax.random.key(0), batch)
    if config.restart:
        logger.info("loading parameters from %s", config.restart)
        params = _restore_params(config.restart, params)

    _, mut = jax.jit(
        lambda p, b: model.apply(p, b, mutable=["intermediates"])
    )(params, batch)
    inter = jax.device_get(mut["intermediates"])

    rows: List[Dict[str, Any]] = []
    # {'layer_i': {'ff': {'router_scores': (call0, call1, ...), ...}}};
    # MCA sows once per layer, EAO once per channel pass per layer
    layers = sorted(
        (k for k in inter if k.startswith("layer_")),
        key=lambda k: int(k.split("_")[1]),
    )
    for lk in layers:
        ff = inter[lk]["ff"]
        calls = len(ff["router_scores"])
        for c in range(calls):
            row = routing_stats(
                np.asarray(ff["router_scores"][c]),
                np.asarray(ff["token_idx"][c]),
                np.asarray(ff["gates"][c]),
            )
            row["layer"] = lk
            if calls > 1:
                row["call"] = c
            rows.append(row)
    return rows


def main(argv=None) -> None:
    from mca_tpu.config import training_config

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--out", default="moe_stats.json")
    ap.add_argument(
        "--split", default="train", choices=("train", "test")
    )
    args = ap.parse_args(argv)
    config = training_config(args.config)
    rows = extract_moe_stats(config, split=args.split)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    for r in rows:
        logger.info(
            "%s%s: coverage %.3f, experts/token %.2f, mean gate %.3f",
            r["layer"],
            f" call {r['call']}" if "call" in r else "",
            r["coverage_real"],
            r["experts_per_real_token"],
            r["mean_gate"],
        )
    logger.info("wrote %s (%d rows)", os.path.abspath(args.out), len(rows))


if __name__ == "__main__":
    main()
