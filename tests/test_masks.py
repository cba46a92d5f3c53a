"""Unit + oracle tests for the static mask constructors.

The hand-computed golden cases pin down the exact semantics; the oracle
test instantiates the reference's own (read-only) MCA model and checks
bit-for-bit equality of attention and pooling masks.
"""

import numpy as np
import pytest

from mca_tpu import masks as M


def test_adjusted_powerset_order():
    combos = M.adjusted_powerset(range(4), [4, 3, 2])
    assert len(combos) == 1 + 4 + 6
    assert combos[0] == frozenset({0, 1, 2, 3})  # FCL root comes first
    assert combos[1] == frozenset({0, 1, 2})
    assert combos[-1] == frozenset({2, 3})


def test_token_types():
    tt = M.create_token_types([2, 3], 2)
    np.testing.assert_array_equal(tt, [0, 0, 1, 1, 1, -1, -1])


def test_zorro_mask_golden():
    tt = M.create_token_types([2, 1], 2)  # [0,0,1,-1,-1]
    blocked = M.create_zorro_mask(tt)
    # allowed = same modality OR row is fusion
    expected_allowed = np.array(
        [
            [1, 1, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [0, 0, 1, 0, 0],
            [1, 1, 1, 1, 1],  # fusion rows attend everything
            [1, 1, 1, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(~blocked, expected_allowed)


def test_zorro_mask_no_fusion():
    tt = M.create_token_types([2, 1], 0)
    blocked = M.create_zorro_mask(tt, no_fusion=True)
    expected_allowed = np.array(
        [[1, 1, 0], [1, 1, 0], [0, 0, 1]], dtype=bool
    )
    np.testing.assert_array_equal(~blocked, expected_allowed)


def test_mca_mask_golden():
    # 2 modalities [2, 2], 4 fusion tokens, combos [{0,1},{0},{1}] won't
    # divide; use powers [2,1] with 6 fusion tokens -> nsubtok=2.
    tt = M.create_token_types([2, 2], 6)
    combos = M.adjusted_powerset(range(2), [2, 1])
    assert combos == [frozenset({0, 1}), frozenset({0}), frozenset({1})]
    blocked = M.create_mca_mask(tt, combos, M.create_zorro_mask(tt))
    allowed = ~blocked
    # modality rows unchanged from zorro
    np.testing.assert_array_equal(
        allowed[0], [1, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    )
    np.testing.assert_array_equal(
        allowed[2], [0, 0, 1, 1, 0, 0, 0, 0, 0, 0]
    )
    # channel 0 = combo {0,1}: attends mod0, mod1, own fusion chunk (4,5)
    np.testing.assert_array_equal(
        allowed[4], [1, 1, 1, 1, 1, 1, 0, 0, 0, 0]
    )
    np.testing.assert_array_equal(allowed[5], allowed[4])
    # channel 1 = combo {0}: attends mod0 + own chunk (6,7)
    np.testing.assert_array_equal(
        allowed[6], [1, 1, 0, 0, 0, 0, 1, 1, 0, 0]
    )
    # channel 2 = combo {1}: attends mod1 + own chunk (8,9)
    np.testing.assert_array_equal(
        allowed[8], [0, 0, 1, 1, 0, 0, 0, 0, 1, 1]
    )


def test_pooling_masks_golden():
    tt = M.create_token_types([2, 2], 6)
    combos = M.adjusted_powerset(range(2), [2, 1])
    rtt = np.asarray(
        M.make_return_token_types(
            2, len(combos), no_fusion=False, fcl=True, zorro=False
        )
    )
    np.testing.assert_array_equal(rtt, [0, 1, -1, -1, -1, -2])
    pool = M.create_zorro_pooling_mask(tt, rtt)
    allowed = ~pool
    np.testing.assert_array_equal(
        allowed[0], [1, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    )  # mod0 return
    np.testing.assert_array_equal(
        allowed[2], [0, 0, 0, 0, 1, 1, 1, 1, 1, 1]
    )  # fusion return attends all fusion pre-MCA
    np.testing.assert_array_equal(allowed[5], np.ones(10))  # global

    pool = M.create_mca_pooling_mask(tt, combos, rtt, pool)
    allowed = ~pool
    np.testing.assert_array_equal(
        allowed[2], [0, 0, 0, 0, 1, 1, 0, 0, 0, 0]
    )  # fusion return c=0 -> channel 0 chunk only
    np.testing.assert_array_equal(
        allowed[3], [0, 0, 0, 0, 0, 0, 1, 1, 0, 0]
    )
    np.testing.assert_array_equal(
        allowed[4], [0, 0, 0, 0, 0, 0, 0, 0, 1, 1]
    )


def test_return_token_types_variants():
    assert M.make_return_token_types(
        3, 4, no_fusion=True, fcl=True, zorro=False
    ) == [0, 1, 2, -2]
    assert M.make_return_token_types(
        3, 4, no_fusion=False, fcl=False, zorro=False
    ) == [0, 1, 2, -1, -2]
    assert M.make_return_token_types(
        3, 4, no_fusion=False, fcl=True, zorro=True
    ) == [0, 1, 2, -1, -2]
    assert M.make_return_token_types(
        3, 4, no_fusion=False, fcl=True, zorro=False
    ) == [0, 1, 2, -1, -1, -1, -1, -2]


def test_pooling_token_type_order():
    tt = np.array([0, 0, 1, 2, -1, -1, -2])
    assert M.pooling_token_type_order(tt) == [0, 1, 2, -1, -2]


def test_build_masks_tcga_shape():
    ms = M.build_masks([800, 198, 800, 662], 88, [4, 3, 2])
    assert ms.seq_len == 800 + 198 + 800 + 662 + 88 == 2548
    assert len(ms.fusion_combos) == 11
    assert ms.num_return_tokens == 4 + 11 + 1
    assert ms.attn_mask.shape == (2548, 2548)
    assert ms.pool_mask.shape == (16, 2548)


def test_block_mask_info():
    ms = M.build_masks([4, 4], 8, [2])  # 1 combo {0,1}, 16 tokens
    kv_index, kv_count, block_full = M.block_mask_info(
        ms.attn_mask, block_q=4, block_k=4
    )
    assert kv_index.shape[0] == 4  # 16 tokens / 4
    # every query block must have at least one active kv block
    assert (kv_count >= 1).all()
    # reconstruct tile map and compare against dense mask
    dense_any = ~ms.attn_mask.reshape(4, 4, 4, 4).any(axis=(1, 3))
    for i in range(4):
        active = set(kv_index[i, : kv_count[i]].tolist())
        assert active == set(np.nonzero(dense_any[i])[0].tolist())


@pytest.mark.parametrize("zorro", [False, True])
def test_masks_match_reference(reference_path, zorro):
    """Bit-for-bit oracle vs the reference's own mask construction."""
    import sys
    import types

    torch = pytest.importorskip("torch")
    # The reference imports torchmultimodal only for its loss; stub it so
    # the (read-only) module can be imported without the dependency.
    stub = types.ModuleType(
        "torchmultimodal.modules.losses.contrastive_loss_with_temperature"
    )

    class _StubLoss(torch.nn.Module):
        pass

    stub.ContrastiveLossWithTemperature = _StubLoss
    pkg = types.ModuleType("torchmultimodal")
    modules = types.ModuleType("torchmultimodal.modules")
    losses = types.ModuleType("torchmultimodal.modules.losses")
    sys.modules.setdefault("torchmultimodal", pkg)
    sys.modules.setdefault("torchmultimodal.modules", modules)
    sys.modules.setdefault("torchmultimodal.modules.losses", losses)
    sys.modules[
        "torchmultimodal.modules.losses.contrastive_loss_with_temperature"
    ] = stub
    sys.path.insert(0, reference_path)
    try:
        import importlib

        ref_model = importlib.import_module("model")
    finally:
        sys.path.remove(reference_path)

    encoder_configs = {
        "a": {"type": "TabularEncoder", "num_embeddings": 6, "max_tokens": 6},
        "b": {"type": "TabularEncoder", "num_embeddings": 3, "max_tokens": 3},
        "c": {"type": "TabularEncoder", "num_embeddings": 5, "max_tokens": 5},
    }
    ref = ref_model.MCA(
        encoder_configs=encoder_configs,
        dim=16,
        depth=1,
        dim_head=4,
        heads=2,
        num_fusion_tokens=8,
        batch_size=2,
        fcl=True,
        fcl_root=[0, 1, 2],
        fusion_combos=[3, 2],
        zorro=zorro,
    )
    ours = M.build_masks(
        [6, 3, 5], 8, [3, 2], zorro=zorro, fcl=True
    )
    np.testing.assert_array_equal(
        ours.token_types, ref.token_types.numpy()
    )
    np.testing.assert_array_equal(
        ours.return_token_types, ref.return_token_types_tensor.numpy()
    )
    np.testing.assert_array_equal(
        ours.attn_mask, ref.attn_mask.numpy()
    )
    np.testing.assert_array_equal(
        ours.pool_mask, ref.pool_mask.numpy()
    )
    assert list(ours.fusion_combos) == ref.fusion_combos
