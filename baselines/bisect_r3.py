"""Bisect the round-3 kernel change pair: mask mode x custom_partitioning.

Four bench runs at TCGA auto blocks (knobs as read by
mca_tpu/ops/flash_attention.py: MCA_FLASH_MASK_MODE selects the
per-tile mask application strategy — select is the shipping default,
skip is the cond-skip variant measured slower — and
MCA_FLASH_NO_PARTITION=1 drops the custom_partitioning wrap):

  base      : mask_mode=select, partition on   (current default)
  skip      : mask_mode=skip,   partition on
  nopart    : mask_mode=select, partition off
  neither   : mask_mode=skip,   partition off
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep_r3 import run as _sweep_run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "baselines", "bisect_r3_results.jsonl")


def run(tag, env_over):
    _sweep_run(tag, env_over, out=OUT)


run("base", {})
run("skip", {"MCA_FLASH_MASK_MODE": "skip"})
run("nopart", {"MCA_FLASH_NO_PARTITION": 1})
run("neither", {"MCA_FLASH_MASK_MODE": "skip", "MCA_FLASH_NO_PARTITION": 1})
