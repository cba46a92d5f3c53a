"""Unit tests for the roofline op-counting model (baselines/roofline.py).

Only the pure counting/bounding functions are tested here (the rate
microbenchmarks need the real chip and run via the script itself, see
PERF.md for the measured report).
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "baselines"),
)

from roofline import (  # noqa: E402
    attention_counts,
    build_case,
    gemm_flops,
    light_ms,
    optimizer_bytes,
)


def test_attention_counts_unmasked_square():
    # 8x8 all-unmasked mask, one band, 4x4 blocks -> 4 tiles, all
    # "full" (no blocked entries -> no mask tile DMA)
    mask = np.zeros((8, 8), bool)
    bands = [(0, 8, 0, 8, 4, 4)]
    c = attention_counts(mask, bands, batch=1, heads=2, dim_head=4)
    bh, n_tiles, bq, bk, d = 2, 4, 4, 4, 4
    assert c["fwd"]["mxu_flops"] == bh * n_tiles * 4 * bq * bk * d
    assert c["bwd"]["mxu_flops"] == bh * n_tiles * 10 * bq * bk * d
    assert c["fwd"]["exp_elems"] == bh * n_tiles * bq * bk
    assert c["fwd"]["vpu_elems"] == 7 * c["fwd"]["exp_elems"]
    assert c["bwd"]["vpu_elems"] == 9 * c["bwd"]["exp_elems"]
    # no mask tiles are DMA'd when every tile is fully unmasked: bytes
    # = k/v per tile + q/out/lse per q-run + pad rows
    n_q_runs = 2
    expect = bh * (
        n_tiles * 2 * bk * d * 2
        + n_q_runs * bq * d * 2
        + n_q_runs * bq * (d * 2 + 4)
        + n_tiles * bk
    )
    assert c["fwd"]["hbm_bytes"] == expect


def test_attention_counts_block_diagonal_visits_fewer_tiles():
    dense = np.zeros((8, 8), bool)
    blockdiag = np.ones((8, 8), bool)
    blockdiag[:4, :4] = False
    blockdiag[4:, 4:] = False
    bands = [(0, 8, 0, 8, 4, 4)]
    cd = attention_counts(dense, bands, batch=1, heads=1, dim_head=4)
    cb = attention_counts(blockdiag, bands, batch=1, heads=1, dim_head=4)
    assert cb["fwd"]["mxu_flops"] == cd["fwd"]["mxu_flops"] / 2
    assert cb["bwd"]["mxu_flops"] == cd["bwd"]["mxu_flops"] / 2


def test_attention_counts_partially_masked_tile_pays_mask_dma():
    mask = np.zeros((4, 4), bool)
    mask[0, 0] = True  # one blocked entry -> tile not "full"
    bands = [(0, 4, 0, 4, 4, 4)]
    c = attention_counts(mask, bands, batch=1, heads=1, dim_head=4)
    full = attention_counts(
        np.zeros((4, 4), bool), bands, batch=1, heads=1, dim_head=4
    )
    assert (
        c["fwd"]["hbm_bytes"] - full["fwd"]["hbm_bytes"] == 4 * 4
    )  # one int8 mask tile


def test_gemm_flops_formula():
    cl = dict(dim=512, depth=5, heads=8, dim_head=64, ff_mult=4,
              batch=8, enc_tokens=2460)
    T = 2548
    inner = int(512 * 4 * 2 / 3)
    proj = 2 * 8 * T * 512 * (8 * 64 * 4)
    ff = 2 * 8 * T * (512 * 2 * inner + inner * 512)
    enc = 2 * 8 * 2460 * 512 * (512 + 2)
    assert gemm_flops(cl, T) == 5 * (proj + ff) + enc


def test_optimizer_bytes():
    # fp32 moments: read p+m+v+g (4 vecs) + write p+m+v (3) = 7 * 4B
    assert optimizer_bytes(100) == 100 * 28
    # bf16 moments halve the four moment transfers
    assert optimizer_bytes(100, moment_bytes=2) == 100 * 20


def test_light_ms_picks_binding_unit():
    rates = dict(mxu_flops_s=1e12, vpu_elems_s=1e12, exp_elems_s=1e12,
                 hbm_bytes_s=1e9)
    counts = dict(mxu_flops=1e9, vpu_elems=1e9, exp_elems=0.0,
                  hbm_bytes=1e9)  # 1 ms mxu, 1 ms vpu, 1000 ms hbm
    out = light_ms(counts, rates)
    assert out["bound"] == "hbm"
    assert abs(out["light_ms"] - 1000.0) < 1e-6


def test_build_case_real_masks():
    case = build_case("tcga")
    assert case["attn_mask"].shape == (2548, 2548)
    assert case["bands"], "banding should apply to the TCGA mask"
    # bands tile the rows exactly
    rows = sorted((b[0], b[1]) for b in case["bands"])
    assert rows[0][0] == 0 and rows[-1][1] == 2548
    for (a, b), (c, d) in zip(rows, rows[1:]):
        assert b == c
    counts = attention_counts(
        case["attn_mask"], case["bands"], batch=8, heads=8, dim_head=64
    )
    # visited work is well under the dense O(T^2) equivalent
    dense = 8 * 8 * 4 * 64 * 2548 * 2548
    assert counts["fwd"]["mxu_flops"] < 0.75 * dense
