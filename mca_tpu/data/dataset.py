"""Dataset setup: HF-datasets loading, split, seeded modality dropout.

Mirrors ``/root/reference/utils/dataset.py``:

- :func:`setup_data` (ref :72-84): ``load_from_disk`` → optional
  ``ds_frac`` head-select → optional predrop → ``train_test_split``.
- :class:`BatchPreDropout` (ref :29-57): per-sample whole-modality
  dropout applied once, offline, via ``dataset.map``; ``delete`` mode
  sets every field of the modality to None (collates to fully padded),
  ``fill`` mode overwrites fields with constants.
- :func:`batch_predrop` (ref :59-69): one dropper per modality from
  ``modality_config[*]['dropout']``.

Differences by design: the RNG is an explicitly seeded numpy Generator
(the reference used torch's global RNG, making the drop pattern depend
on iteration order), and formats are numpy, not torch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


class BatchDropout:
    """In-batch whole-modality dropout (ref utils/dataset.py:5-26).

    Overwrites the given fields of a random ``dropout`` fraction of the
    batch rows with constants (e.g. attention mask -> 1 = padded).  The
    reference kept this variant dormant (referenced only in
    commented-out collator code, ref encoders.py:382-396); here it is a
    live alternative to offline predrop for on-the-fly fault injection.
    """

    def __init__(
        self,
        kvs: Optional[Dict[str, Any]] = None,
        dropout: float = 0.1,
        random_seed: int = 42,
    ):
        self.kvs = kvs or {"attention_mask": 1, "tokens": 0}
        assert self.kvs
        self.dropout = float(dropout)
        self.rng = np.random.default_rng(random_seed)

    def __call__(
        self, batch_mode: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        assert set(self.kvs) <= set(batch_mode), (
            f"{set(self.kvs)} not all in {set(batch_mode)}"
        )
        nb = next(iter(batch_mode.values())).shape[0]
        size = int(nb * self.dropout)
        if size == 0:
            return batch_mode
        idx = self.rng.permutation(nb)[:size]
        out = dict(batch_mode)
        for k, v in self.kvs.items():
            arr = np.array(out[k], copy=True)
            arr[idx] = v
            out[k] = arr
        return out


class BatchPreDropout:
    """Whole-modality dropout for one modality (ref utils/dataset.py:29-57)."""

    def __init__(
        self,
        mode: str = "delete",
        kvs: Optional[Dict[str, Any]] = None,
        dropout: float = 0.1,
        random_seed: int = 42,
    ):
        assert mode in ("delete", "fill"), mode
        self.mode = mode
        self.kvs = kvs or {"attention_mask": 1, "tokens": 0}
        self.dropout = float(dropout)
        self.rng = np.random.default_rng(random_seed)

    def drop(self) -> bool:
        return bool(self.rng.random() < self.dropout)

    def __call__(
        self, modality_value: Optional[Dict[str, Any]]
    ) -> Optional[Dict[str, Any]]:
        if modality_value is None:
            return None
        if self.drop():
            if self.mode == "fill":
                return {
                    k: (
                        np.full_like(np.asarray(modality_value[k]), v)
                        if modality_value.get(k) is not None
                        else None
                    )
                    for k, v in self.kvs.items()
                }
            return {k: None for k in modality_value}
        return modality_value


def batch_predrop(
    dataset: Any,
    modality_config: Dict[str, Dict[str, Any]],
    random_seed: int = 42,
):
    """Map whole-modality dropout over an HF dataset (ref utils/dataset.py:59-69)."""
    droppers = {
        name: BatchPreDropout(
            kvs={"attention_mask": cfg.get("pad_token", 0), "data": 0.0},
            dropout=cfg["dropout"],
            random_seed=random_seed + i,
        )
        for i, (name, cfg) in enumerate(modality_config.items())
        if cfg.get("dropout")
    }

    def to_arrow_friendly(v: Any) -> Any:
        if isinstance(v, np.ndarray):
            return v.tolist()  # pyarrow rejects >1-D ndarrays
        if isinstance(v, dict):
            return {k: to_arrow_friendly(x) for k, x in v.items()}
        return v

    def drop(sample: Dict[str, Any]) -> Dict[str, Any]:
        return {
            k: to_arrow_friendly(
                droppers[k](v) if k in droppers else v
            )
            for k, v in sample.items()
        }

    fmt = dataset.format
    out = dataset.with_format(None).map(drop, batched=False)
    if fmt and fmt.get("type"):
        out = out.with_format(fmt["type"])
    else:
        out = out.with_format("numpy")
    return out


def setup_data(
    dataset_path: str,
    split: float = 0.1,
    ds_frac: float = 1.0,
    ds_seed: int = 42,
    predrop: bool = False,
    predrop_config: Optional[Dict[str, Dict[str, Any]]] = None,
):
    """Load + split an HF on-disk dataset (ref utils/dataset.py:72-84)."""
    import datasets as hfds

    dataset = hfds.load_from_disk(dataset_path)
    if ds_frac < 1.0:
        dataset = dataset.select(range(int(len(dataset) * ds_frac)))
    if predrop:
        dataset = batch_predrop(
            dataset, predrop_config or {}, random_seed=ds_seed
        )
    if split and split != 1.0:
        dataset = dataset.train_test_split(split, seed=ds_seed)
    return dataset


def _columns_to_rows(cols: Dict[str, Any], n: int) -> list:
    """HF batched access returns column-oriented (possibly nested)
    dicts; the collators want per-sample dicts."""

    def row(v: Any, j: int) -> Any:
        if isinstance(v, dict):
            return {k: row(x, j) for k, x in v.items()}
        return v[j]

    return [{k: row(v, j) for k, v in cols.items()} for j in range(n)]


def _arrow_decode_values(arr, n: int) -> list:
    """One arrow column -> a list of per-row numpy values (None for
    nulls), reading the flat values buffer directly instead of HF's
    per-row python materialisation (measured 141 -> ~4 ms per
    CMU-scale batch, see PERF.md)."""
    import pyarrow as pa

    valid = arr.is_valid().to_numpy(zero_copy_only=False)
    if pa.types.is_list(arr.type) and pa.types.is_list(
        arr.type.value_type
    ):
        oo = arr.offsets.to_numpy()
        inner = arr.values
        io = inner.offsets.to_numpy()
        flat = inner.values.to_numpy(zero_copy_only=False)
        out = []
        for i in range(n):
            if not valid[i]:
                out.append(None)
                continue
            s, e = int(oo[i]), int(oo[i + 1])
            if e == s:
                out.append(np.zeros((0, 0), flat.dtype))
                continue
            widths = np.diff(io[s : e + 1])
            if (widths == widths[0]).all():
                out.append(
                    flat[int(io[s]) : int(io[e])].reshape(
                        e - s, int(widths[0])
                    )
                )
            else:  # ragged inner rows: rare, fall back per row
                out.append(
                    [
                        flat[int(io[j]) : int(io[j + 1])]
                        for j in range(s, e)
                    ]
                )
        return out
    if pa.types.is_list(arr.type):
        oo = arr.offsets.to_numpy()
        flat = arr.values.to_numpy(zero_copy_only=False)
        return [
            flat[int(oo[i]) : int(oo[i + 1])] if valid[i] else None
            for i in range(n)
        ]
    if pa.types.is_primitive(arr.type):
        vals = arr.to_numpy(zero_copy_only=False)
        return [vals[i] if valid[i] else None for i in range(n)]
    vals = arr.to_pylist()
    return [vals[i] if valid[i] else None for i in range(n)]


def _decode_table(table) -> list:
    """Decode an arrow (sub-)table into collator row dicts
    (``{column: {field: array-or-None}}``; struct-level nulls map to
    per-field None), reading list-offset/values buffers directly."""
    import pyarrow as pa

    n = table.num_rows
    rows: list = [dict() for _ in range(n)]
    for name in table.column_names:
        col = table.column(name).combine_chunks()
        if pa.types.is_struct(col.type):
            svalid = col.is_valid().to_numpy(zero_copy_only=False)
            for fi, field in enumerate(col.type):
                vals = _arrow_decode_values(col.field(fi), n)
                for i in range(n):
                    rows[i].setdefault(name, {})[field.name] = (
                        vals[i] if svalid[i] else None
                    )
        else:
            vals = _arrow_decode_values(col, n)
            for i in range(n):
                rows[i][name] = vals[i]
    return rows


def _arrow_take_rows(dataset, idx) -> list:
    """Fast out-of-core row fetch via zero-copy pyarrow SLICES.

    ``Table.take`` on a chunked memory-mapped table copies whole
    chunks (measured ~1s per 8-row CMU batch); ``slice`` is zero-copy
    and the flat-buffer decode reads only the selected rows' windows
    of the values buffers, so shuffled access costs ~the same as
    sequential."""
    table = dataset.data.table
    idx = [int(i) for i in idx]
    # split/shuffled HF datasets are INDICES-MAPPED: .data is the full
    # underlying table and row i lives at _indices[i] — reading the
    # table positionally would silently return the wrong rows
    indices = getattr(dataset, "_indices", None)
    if indices is not None:
        col = indices.column(0)
        idx = [int(col[i].as_py()) for i in idx]
    start = idx[0]
    if idx == list(range(start, start + len(idx))):
        return _decode_table(table.slice(start, len(idx)))
    out: list = []
    for i in idx:
        out.extend(_decode_table(table.slice(i, 1)))
    return out


class _PrefetchIterator:
    """Background-thread batch producer with a bounded queue.

    Host collation overlaps device compute (the reference gets this
    from DataLoader ``num_workers=8, prefetch_factor=4``,
    ref train_accel_gpu.py:70); producer exceptions re-raise at the
    consumer.  A thread (not a process) suffices: arrow decode and the
    numpy/C++ collators release the GIL for the bulk of the work.
    """

    _DONE = object()

    def __init__(self, produce, depth: int):
        import queue
        import threading

        # the producer closure must NOT capture self: the running
        # thread would then keep the iterator alive and __del__ (the
        # abandonment cleanup path) could never fire
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()
        err_box: list = []
        done = self._DONE

        def put_or_stop(item) -> bool:
            # bounded put with a stop check so an abandoned iterator's
            # producer exits instead of blocking on the full queue
            # forever (pinning depth+1 batches); returns False when
            # stopped
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in produce():
                    if not put_or_stop(item):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised below
                err_box.append(e)
            finally:
                # the sentinel must NOT be dropped on a full queue (a
                # live consumer would then block in get() forever) —
                # same stop-aware bounded put as the items
                put_or_stop(done)

        self._q = q
        self._stop = stop
        self._err_box = err_box
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the producer and release queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:  # queue.Empty
            pass
        self._thread.join(timeout=2.0)

    def __del__(self):  # abandoned iterator: don't leak the producer
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            self._thread.join()
            if self._err_box:
                raise self._err_box[0]
            raise StopIteration
        return item


class BatchedLoader:
    """Static-shape batch iterator over an HF dataset split.

    Replaces the reference's torch DataLoader: applies the
    MultimodalCollator to fixed-size batches and (like the reference's
    infer path, ``infer_accel_gpu.py:70-71``) always drops the last
    partial batch so every jit trace sees the same shapes.

    Scaling knobs (CMU streams 38.2 GB in the reference — too big to
    materialise):

    - ``preload=True`` decodes every sample once up front (fastest for
      TCGA-scale data that fits in host RAM);
    - ``preload=False`` streams batches out-of-core with ONE batched
      arrow decode per batch (``dataset[[i...]]``), not per item;
    - ``prefetch > 0`` collates ahead on a background thread so host
      IO overlaps device compute.
    """

    def __init__(
        self,
        dataset: Any,
        collator: Any,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        preload: bool = True,
        prefetch: int = 0,
    ):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = int(prefetch)
        self._epoch = 0
        # HF per-item access decodes arrow every time; materialising
        # the samples once amortises it across epochs (TCGA-scale
        # datasets are ~100MB; disable for datasets that don't fit)
        self._items = (
            [dataset[int(i)] for i in range(len(dataset))]
            if preload
            else None
        )

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size
        )

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def skip_batches(self, n: int) -> None:
        """Fast-forward the NEXT iteration past the first ``n``
        batches WITHOUT fetching or collating them (mid-epoch resume:
        batch content is a pure function of index, so slicing the
        order array is exact and free).  One-shot: consumed by the
        next ``__iter__``/``_produce``."""
        self._skip_next = int(n)

    def _batch_samples(self, idx) -> list:
        if self._items is not None:
            return [self._items[int(i)] for i in idx]
        try:
            return _arrow_take_rows(self.dataset, idx)
        except Exception:
            # datasets without a .data arrow table (or exotic schemas)
            cols = self.dataset[[int(i) for i in idx]]
            return _columns_to_rows(cols, len(idx))

    def _produce(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        usable = (
            n - n % self.batch_size if self.drop_last else n
        )
        first = getattr(self, "_skip_next", 0) * self.batch_size
        self._skip_next = 0
        for start in range(first, usable, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.collator(self._batch_samples(idx))

    def first_batch(self):
        """One structurally-representative batch, collated
        synchronously — for model init / shape derivation without
        spinning up (and then abandoning) a prefetch producer."""
        n = len(self.dataset)
        # always full batch_size (wrap if the split is tiny) so init
        # sees the same static shapes as the epoch stream
        idx = np.arange(self.batch_size) % max(n, 1)
        return self.collator(self._batch_samples(idx))

    def __iter__(self):
        if self.prefetch > 0:
            return _PrefetchIterator(self._produce, self.prefetch)
        return self._produce()
