"""Online embedding serving — the deployment path the reference lacks.

The reference stops at OFFLINE batch inference (`infer_accel_gpu.py`
writes `.pt` embedding files); this module serves the same per-sample
embeddings (modalities + fusion combos, plus presence masks) ONLINE:

- **one fixed-shape compiled executable**: requests are padded to
  ``max_batch`` so every call hits the same jit cache entry — no
  recompiles, no dynamic shapes (the TPU contract).  Embeddings are
  per-sample (encoders, masked attention, pooling never mix samples),
  so padding rows is numerically invisible; ``no_loss=True`` skips the
  batch-coupled contrastive graph entirely.
- **dynamic micro-batching**: concurrent single-row requests queue and
  a batcher thread coalesces up to ``max_batch`` rows (or
  ``max_wait_ms``) into one device call — the standard accelerator
  serving pattern (one big launch beats N tiny ones, PERF.md).
- **packed outputs**: one ``[E, B, D]`` embedding stack + one
  ``[M, B]`` mask stack per call (per-key outputs would pay ~80
  per-launch buffer costs on remote-attached chips, see
  ``mca_tpu.infer``).
- stdlib HTTP front (``POST /embed``, ``GET /healthz``) — zero extra
  dependencies; the service class is also directly embeddable.

Usage::

    python -m mca_tpu.serve config.yaml --restart out/3 --port 8777
    curl -X POST :8777/embed -d '{"rows": [{"gene": {"values": [...]}, ...}]}'
"""

from __future__ import annotations

import json
import logging
import os
import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu.config import get_model_config
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.models import build_model

logger = logging.getLogger(__name__)


class EmbeddingService:
    """Compiled fixed-shape embedding forward + micro-batching.

    ``params`` may be passed directly (tests / already-loaded weights)
    or restored from ``restart`` (a train-state epoch dir or a final
    model dir, both reference layouts — see
    ``mca_tpu.infer._restore_params``).
    """

    def __init__(
        self,
        config,
        params: Any = None,
        restart: Optional[str] = None,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        warmup: bool = True,
        quantize: str = "none",
    ):
        self.config = config
        mc = get_model_config(config)
        self.model = build_model(mc)
        mods = (
            config.modality_config.to_plain()
            if hasattr(config.modality_config, "to_plain")
            else dict(config.modality_config)
        )
        self._common_init(mods, max_batch, max_wait_ms)
        batch0 = self._pad([self._template])
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.key(0), batch0
            )
            if restart:
                from mca_tpu.infer import _restore_params

                params = _restore_params(restart, params)
        if quantize != "none":
            # post-training int8: trained fp tree -> int8 kernels +
            # per-channel scales, model rebuilt with QuantDense
            # projections (mca_tpu.ops.quant); the fp restore above
            # stays byte-exact — quantization is a pure view on it
            from mca_tpu.ops.quant import quantize_params

            self.model = build_model(dict(mc, quant=quantize))
            params = quantize_params(params)
        self.params = params

        shapes = jax.eval_shape(
            lambda p, b: self.model.apply(p, b, no_loss=True),
            self.params,
            batch0,
        )
        self.mask_keys = tuple(sorted(shapes["modality_sample_mask"]))
        self.emb_keys = tuple(
            sorted(k for k in shapes if k != "modality_sample_mask")
        )

        def packed(params, batch):
            out = self.model.apply(params, batch, no_loss=True)
            emb = jnp.stack([out[k] for k in self.emb_keys])
            msk = jnp.stack(
                [out["modality_sample_mask"][k] for k in self.mask_keys]
            )
            return emb, msk

        self._fn = jax.jit(packed)
        if warmup:
            # warm the cache so the first request doesn't pay the
            # compile (skip when the caller only wants params/collate,
            # e.g. the AOT exporter)
            self._warmup()

    def _common_init(
        self, mods: Dict[str, Any], max_batch: int, max_wait_ms: float
    ) -> None:
        """Runtime fields shared by BOTH construction paths (config
        and from_aot) — keep new attributes HERE so AOT-served
        instances never drift from config-built ones."""
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.collate = MultimodalCollator(mods)
        self._template = self._zero_row(mods)
        self._queue: "queue.Queue" = queue.Queue()
        self._batcher: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _warmup(self) -> None:
        """One padded forward so the first REQUEST never pays the
        compile (a cold TPU compile is minutes — it must not happen
        inside the request path, where the HTTP handler would time
        out, see PERF.md)."""
        e, m = self._fn(self.params, self._pad([self._template]))
        jax.block_until_ready((e, m))

    @classmethod
    def from_aot(
        cls, path: str, max_wait_ms: float = 5.0, warmup: bool = True
    ) -> "EmbeddingService":
        """Serve from a ``tools.export_aot`` artifact: weights and the
        compiled forward come from the StableHLO blob, the collator
        and request padding from the artifact header — no training
        YAML, flax model build, or checkpoint at the serving host."""
        from mca_tpu.tools.export_aot import load_aot_full

        fn, header = load_aot_full(path)
        mods = header.get("modality_config")
        if not mods or not header.get("batch"):
            raise ValueError(
                "artifact lacks serving metadata (modality_config/"
                "batch) — re-export with the current "
                "mca_tpu.tools.export_aot"
            )
        self = object.__new__(cls)
        self.config = None
        self.model = None
        self.params = None
        self._common_init(mods, int(header["batch"]), max_wait_ms)
        self.emb_keys = tuple(header["emb_keys"])
        self.mask_keys = tuple(header["mask_keys"])
        self._fn = lambda params, batch: fn(batch)
        if warmup:
            # deserialize only parses — exp.call compiles on first
            # invocation, which must happen here, not in a request
            self._warmup()
        return self

    # -- request paths -------------------------------------------------

    def _zero_row(self, mods: Dict[str, Any]) -> Dict[str, Any]:
        """A syntactically valid all-pad row (shape template for
        warmup and batch padding), from a plain modality-config dict."""
        row: Dict[str, Any] = {}
        for m, c in mods.items():
            field = c.get("data_col_name", "values")
            pad = float(c.get("pad_token", -10000.0))
            typ = c.get("type")
            if typ in ("matrix", "embedded_sequence"):
                # trailing width: explicit in the config when present,
                # else 1 (the collators widen to the widest REAL row,
                # so a narrow template never distorts a mixed batch).
                # embedded_sequence has an explicit attention_mask, so
                # the template carries finite zeros, not the sentinel.
                width = int(
                    c.get("embedding_size")
                    or c.get("input_size")
                    or c.get("width")
                    or 1
                )
                fill = 0.0 if typ == "embedded_sequence" else pad
                row[m] = {
                    field: np.full(
                        (int(c["pad_len"]), width), fill, np.float32
                    )
                }
            else:
                row[m] = {
                    field: np.full(
                        int(c["pad_len"]), pad, np.float32
                    )
                }
        return row

    def _pad(self, rows: Sequence[Dict[str, Any]]):
        """Collate ``rows`` padded to ``max_batch`` with template rows
        (per-sample model: pad rows never affect real rows)."""
        assert 0 < len(rows) <= self.max_batch, len(rows)
        full = list(rows) + [self._template] * (
            self.max_batch - len(rows)
        )
        batch = self.collate(full)
        return jax.tree.map(jnp.asarray, batch)

    def _dispatch(self, rows: Sequence[Dict[str, Any]]):
        """Collate + H2D + LAUNCH one chunk; returns the device
        arrays WITHOUT materialising them (jax dispatch is async, so
        this returns while the device computes)."""
        return self._fn(self.params, self._pad(rows))

    @staticmethod
    def _materialise(dev, n: int):
        e, m = dev
        return np.asarray(e)[:, :n], np.asarray(m)[:, :n]

    def embed(self, rows: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        """Synchronous: embeddings + presence masks for ``rows``.

        Rows larger than ``max_batch`` are processed in chunks,
        software-pipelined: chunk i+1's collate + H2D + launch overlap
        chunk i's device compute (the get is what blocks)."""
        rows = list(rows)
        embs: List[np.ndarray] = []
        msks: List[np.ndarray] = []
        inflight = None  # (device arrays, n_real_rows)
        for i in range(0, len(rows), self.max_batch):
            chunk = rows[i : i + self.max_batch]
            dev = self._dispatch(chunk)
            if inflight is not None:
                e, m = self._materialise(*inflight)
                embs.append(e)
                msks.append(m)
            inflight = (dev, len(chunk))
        e, m = self._materialise(*inflight)
        embs.append(e)
        msks.append(m)
        emb = np.concatenate(embs, axis=1)
        msk = np.concatenate(msks, axis=1)
        return {
            "embeddings": {
                k: emb[i] for i, k in enumerate(self.emb_keys)
            },
            "present": {
                k: msk[i].astype(bool)
                for i, k in enumerate(self.mask_keys)
            },
        }

    # -- micro-batching ------------------------------------------------

    def start(self) -> None:
        """Start the batcher thread (needed only for :meth:`submit`)."""
        if self._batcher is None:
            self._stop.clear()
            self._batcher = threading.Thread(
                target=self._batch_loop, daemon=True
            )
            self._batcher.start()

    def stop(self) -> None:
        self._stop.set()
        if self._batcher is not None:
            self._batcher.join(timeout=5)
            self._batcher = None
        # fail (not strand) anything still queued, so callers blocked
        # in fut.result() error immediately instead of timing out
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(
                    RuntimeError("EmbeddingService stopped")
                )

    def submit(self, row: Dict[str, Any]) -> "Future":
        """Async single-row request; coalesced with concurrent
        requests into one device call by the batcher thread."""
        assert self._batcher is not None, "call start() first"
        fut: Future = Future()
        self._queue.put((row, fut))
        return fut

    def _batch_loop(self) -> None:
        """Coalesce queued rows and keep the device PIPELINED: batch
        N+1 is collated, H2D-staged and LAUNCHED while batch N still
        computes (jax dispatch is async; only the device->host get
        blocks).  Round 4 measured the per-launch dispatch dominating
        the saturated serve loop — the old loop serialised
        [collate -> launch -> BLOCKING get -> respond] per batch, so
        the device idled during every host phase (PERF.md:625-650,
        VERDICT r4 item 4)."""
        import time as _time

        inflight = None  # (pending list, device arrays)

        def resolve(pending, dev):
            try:
                e, m = self._materialise(dev, len(pending))
                for i, (_, fut) in enumerate(pending):
                    fut.set_result(
                        {
                            "embeddings": {
                                k: e[j][i]
                                for j, k in enumerate(self.emb_keys)
                            },
                            "present": {
                                k: bool(m[j][i])
                                for j, k in enumerate(self.mask_keys)
                            },
                        }
                    )
            except Exception as exc:  # pragma: no cover
                for _, fut in pending:
                    if not fut.done():
                        fut.set_exception(exc)

        while not self._stop.is_set():
            try:
                # with a batch in flight the device is busy anyway —
                # poll instead of sleeping so its results are returned
                # the moment no successor batch forms
                first = self._queue.get(
                    timeout=0.0 if inflight else 0.1
                )
                pending = [first]
            except queue.Empty:
                if inflight is not None:
                    resolve(*inflight)
                    inflight = None
                continue
            # max_wait_ms <= 0 means NO coalescing wait: dispatch
            # whatever is already queued immediately (with a batch in
            # flight the wait is free — it overlaps device compute)
            t0 = _time.monotonic()
            while len(pending) < self.max_batch:
                left = self.max_wait_s - (_time.monotonic() - t0)
                if left <= 0:
                    try:
                        pending.append(self._queue.get_nowait())
                        continue
                    except queue.Empty:
                        break
                try:
                    pending.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            rows = [r for r, _ in pending]
            try:
                dev = self._dispatch(rows)
            except Exception as e:  # pragma: no cover
                for _, fut in pending:
                    if not fut.done():
                        fut.set_exception(e)
                dev = None
            if inflight is not None:
                resolve(*inflight)
            inflight = (pending, dev) if dev is not None else None
        if inflight is not None:
            resolve(*inflight)


# ---------------------------------------------------------------------------
# HTTP front (stdlib only)
# ---------------------------------------------------------------------------


def make_server(service: EmbeddingService, port: int = 0):
    """ThreadingHTTPServer with POST /embed + GET /healthz."""
    from http.server import (
        BaseHTTPRequestHandler,
        ThreadingHTTPServer,
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.debug(fmt, *args)

        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(
                    200,
                    {
                        "ok": True,
                        "max_batch": service.max_batch,
                        "embedding_keys": list(service.emb_keys),
                    },
                )
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/embed":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                rows = req["rows"]
                futs = [service.submit(row) for row in rows]
                results = [f.result(timeout=60) for f in futs]
                self._send(
                    200,
                    {
                        "embeddings": [
                            {
                                k: np.asarray(v).tolist()
                                for k, v in r["embeddings"].items()
                            }
                            for r in results
                        ],
                        "present": [r["present"] for r in results],
                    },
                )
            except Exception as e:
                self._send(400, {"error": repr(e)})

    service.start()
    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None) -> None:
    import argparse
    import sys

    from mca_tpu.config import training_config

    logging.basicConfig(level=logging.INFO)
    from mca_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # forward-only process: the fused GEGLU-FF Pallas kernel is a pure
    # win without a backward (PERF.md round 4); setdefault so an
    # explicit env wins.
    os.environ.setdefault("MCA_FUSED_FF", "auto")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "config",
        nargs="?",
        default=None,
        help="train yaml (omit with --aot)",
    )
    p.add_argument("--restart", default=None, help="checkpoint dir")
    p.add_argument(
        "--aot",
        default=None,
        help="serve a tools.export_aot artifact (self-contained: no "
        "config/checkpoint needed)",
    )
    p.add_argument("--port", type=int, default=8777)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument(
        "--quantize",
        choices=("none", "int8"),
        default="none",
        help="post-training int8 of the transformer projections "
        "(s8xs8 MXU dots + 4x smaller weights; mca_tpu.ops.quant)",
    )
    p.add_argument(
        "--allow-random-weights",
        action="store_true",
        help="serve from freshly initialized parameters (demo only)",
    )
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    if args.aot:
        assert args.quantize == "none", (
            "--quantize applies at model build time: quantize when "
            "EXPORTING the artifact, not when serving it"
        )
        svc = EmbeddingService.from_aot(
            args.aot, max_wait_ms=args.max_wait_ms
        )
    else:
        assert args.config, "pass a train yaml or --aot <artifact>"
        config = training_config(args.config)
        restart = args.restart or (config.restart or None)
        assert restart or args.allow_random_weights, (
            "no checkpoint: pass --restart <dir> (or restart: in the "
            "config), or --allow-random-weights for a demo server"
        )
        svc = EmbeddingService(
            config,
            restart=restart,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            quantize=args.quantize,
        )
    server = make_server(svc, args.port)
    logger.info(
        "serving embeddings on :%d (keys: %s)",
        server.server_address[1],
        ",".join(svc.emb_keys),
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
