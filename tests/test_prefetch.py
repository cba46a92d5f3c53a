"""Streaming input pipeline (VERDICT r1 item 6): background-thread
prefetch and out-of-core batched arrow decode must produce the exact
same batch stream as the preloaded synchronous path."""

import numpy as np
import pytest

from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.dataset import BatchedLoader
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset


@pytest.fixture(scope="module")
def ds_and_collator(tmp_path_factory):
    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    samples = make_tcga_like(37, widths=widths, p_missing=0.2, seed=0)
    ds = to_hf_dataset(samples)
    cfg = tiny_config("tcga", widths=widths)
    collator = MultimodalCollator(cfg["modality_config"])
    return ds, collator


def _materialise(loader, epochs=2):
    out = []
    for e in range(epochs):
        loader.set_epoch(e)
        out.append([b for b in loader])
    return out


def _assert_same(a, b):
    assert len(a) == len(b)
    for ea, eb in zip(a, b):
        assert len(ea) == len(eb)
        for ba, bb in zip(ea, eb):
            assert set(ba) == set(bb)
            for m in ba:
                for f in ba[m]:
                    np.testing.assert_array_equal(ba[m][f], bb[m][f])


def test_prefetch_matches_sync(ds_and_collator):
    ds, collator = ds_and_collator
    kw = dict(batch_size=8, shuffle=True, seed=3)
    sync = BatchedLoader(ds, collator, **kw)
    pre = BatchedLoader(ds, collator, prefetch=4, **kw)
    _assert_same(_materialise(sync), _materialise(pre))


def test_out_of_core_matches_preload(ds_and_collator):
    ds, collator = ds_and_collator
    kw = dict(batch_size=8, shuffle=True, seed=3)
    a = BatchedLoader(ds, collator, preload=True, **kw)
    b = BatchedLoader(ds, collator, preload=False, **kw)
    c = BatchedLoader(ds, collator, preload=False, prefetch=4, **kw)
    ma = _materialise(a)
    _assert_same(ma, _materialise(b))
    _assert_same(ma, _materialise(c))


def test_out_of_core_handles_missing_modalities(ds_and_collator):
    """None-valued modalities (dropped/missing) must survive the
    column->row conversion of batched arrow access."""
    ds, collator = ds_and_collator
    loader = BatchedLoader(ds, collator, batch_size=8, preload=False)
    batch = next(iter(loader))
    # p_missing=0.2 -> some fully padded rows must exist somewhere
    any_padded = any(
        bool(np.all(batch[m]["attention_mask"][i] == 1))
        for m in batch
        for i in range(8)
    )
    assert any_padded


def test_prefetch_propagates_errors(ds_and_collator):
    ds, _ = ds_and_collator

    def bad_collator(samples):
        raise RuntimeError("boom")

    loader = BatchedLoader(ds, bad_collator, batch_size=8, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_abandoned_prefetch_iterator_stops_producer(ds_and_collator):
    """An abandoned prefetch iterator must not leak its producer
    thread blocked on the full queue (pinning depth+1 batches)."""
    import gc
    import time

    ds, collator = ds_and_collator
    loader = BatchedLoader(ds, collator, batch_size=4, prefetch=2)
    it = iter(loader)
    next(it)  # producer running, queue fills
    thread = it._thread
    it.close()
    assert not thread.is_alive()

    # the del path (what next(iter(dl)) abandonment exercises)
    it2 = iter(loader)
    next(it2)
    thread2 = it2._thread
    del it2
    gc.collect()
    deadline = time.time() + 3.0
    while thread2.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not thread2.is_alive()


def test_first_batch_matches_stream_shapes(ds_and_collator):
    ds, collator = ds_and_collator
    loader = BatchedLoader(ds, collator, batch_size=4, prefetch=0)
    fb = loader.first_batch()
    sb = next(iter(loader))
    assert set(fb) == set(sb)
    for m in fb:
        for k in fb[m]:
            assert fb[m][k].shape == sb[m][k].shape


def test_arrow_fast_path_on_disk_dataset(tmp_path, ds_and_collator):
    """load_from_disk gives a chunked MEMORY-MAPPED table — the layout
    where Table.take cost ~1s per batch; the slice-based fast path must
    stay byte-identical to the python-materialisation path there
    (sequential AND shuffled indices, missing modalities included)."""
    import datasets as hfds

    from mca_tpu.data.dataset import _arrow_take_rows, _columns_to_rows

    ds_mem, collator = ds_and_collator
    path = str(tmp_path / "disk_ds")
    ds_mem.save_to_disk(path)
    ds = hfds.load_from_disk(path)
    rng = np.random.default_rng(3)
    for idx in (list(range(4, 12)), list(rng.integers(0, len(ds), 8))):
        fast = _arrow_take_rows(ds, idx)
        slow = _columns_to_rows(ds[[int(i) for i in idx]], len(idx))
        ba = collator(fast)
        bb = collator(slow)
        for m in bb:
            for k in bb[m]:
                np.testing.assert_array_equal(
                    np.asarray(ba[m][k]), np.asarray(bb[m][k]),
                    err_msg=f"{m}/{k} idx={idx[:3]}...",
                )


def test_arrow_fast_path_on_split_dataset(ds_and_collator):
    """train_test_split yields an INDICES-MAPPED dataset whose .data
    table is the full underlying table — the fast path must remap
    through _indices (regression: it read positionally and returned
    the wrong rows, caught as a diverging train trajectory)."""
    from mca_tpu.data.dataset import _arrow_take_rows, _columns_to_rows

    ds, _ = ds_and_collator
    split = ds.train_test_split(0.25, seed=7)["train"]
    idx = [5, 1, 9, 3]
    fast = _arrow_take_rows(split, idx)
    slow = _columns_to_rows(split[[int(i) for i in idx]], len(idx))
    for rf, rs in zip(fast, slow):
        for m in rf:
            for k in rf[m]:
                a, b = rf[m][k], rs[m][k]
                if a is None:
                    assert b is None or len(np.atleast_1d(b)) == 0
                else:
                    np.testing.assert_array_equal(
                        np.asarray(a, np.float64),
                        np.asarray(b, np.float64),
                        err_msg=f"{m}/{k}",
                    )
