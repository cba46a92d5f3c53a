"""Online embedding serving: padded fixed-shape batching is exact,
micro-batching coalesces, and the HTTP front round-trips JSON.

The reference has no serving path (offline `.pt` files only,
infer_accel_gpu.py) — these pin the extension against direct
`model.apply` outputs.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mca_tpu.config import get_model_config, training_config_from_dict
from mca_tpu.data.collators import MultimodalCollator
from mca_tpu.data.synthetic import make_tcga_like, tiny_config
from mca_tpu.models import build_model
from mca_tpu.serve import EmbeddingService, make_server


@pytest.fixture(scope="module")
def service_and_oracle():
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=4)
    )
    model = build_model(get_model_config(cfg))
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    rows = make_tcga_like(6, widths=widths, p_missing=0.3, seed=1)
    collate = MultimodalCollator(cfg.modality_config.to_plain())
    batch = jax.tree.map(jnp.asarray, collate(rows))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    svc = EmbeddingService(cfg, params=params, max_batch=4)
    oracle = model.apply(params, batch, no_loss=True)
    return svc, oracle, rows


def test_embed_matches_direct_apply(service_and_oracle):
    """3 rows padded to max_batch 4, then 6 rows chunked 4+2 — every
    embedding equals the direct full-batch forward."""
    svc, oracle, rows = service_and_oracle
    for n in (3, 6):
        out = svc.embed(rows[:n])
        for k in svc.emb_keys:
            np.testing.assert_allclose(
                out["embeddings"][k],
                np.asarray(oracle[k])[:n],
                rtol=1e-5,
                atol=1e-6,
            )
        for k in svc.mask_keys:
            np.testing.assert_array_equal(
                out["present"][k],
                np.asarray(oracle["modality_sample_mask"][k])[:n],
            )


def test_submit_coalesces_and_matches(service_and_oracle):
    """Concurrent single-row submits produce per-row results equal to
    the batch oracle."""
    svc, oracle, rows = service_and_oracle
    svc.start()
    try:
        futs = [svc.submit(r) for r in rows[:4]]
        results = [f.result(timeout=60) for f in futs]
    finally:
        svc.stop()
    for i, r in enumerate(results):
        for k in svc.emb_keys:
            np.testing.assert_allclose(
                r["embeddings"][k],
                np.asarray(oracle[k])[i],
                rtol=1e-5,
                atol=1e-6,
            )


def test_http_roundtrip(service_and_oracle):
    svc, oracle, rows = service_and_oracle
    server = make_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["max_batch"] == 4

        payload = {
            "rows": [
                {
                    m: {k: np.asarray(v).tolist() for k, v in d.items()}
                    for m, d in row.items()
                    if m != "Labels"
                }
                for row in rows[:2]
            ]
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed",
            data=json.dumps(payload).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["embeddings"]) == 2
        for i in range(2):
            got = np.asarray(out["embeddings"][i]["fusion"])
            np.testing.assert_allclose(
                got,
                np.asarray(oracle["fusion"])[i],
                rtol=1e-5,
                atol=1e-6,
            )
    finally:
        server.shutdown()
        svc.stop()


def test_aot_export_roundtrip(service_and_oracle, tmp_path):
    """jax.export artifact: serialize -> reload -> same embeddings as
    the live model, without touching the model object."""
    from mca_tpu.tools.export_aot import (
        export_packed_forward,
        load_aot,
        save_aot,
    )

    svc, oracle, rows = service_and_oracle
    batch = svc._pad(rows[:4])
    blob, emb_keys, mask_keys = export_packed_forward(
        svc.config, svc.params, batch
    )
    path = str(tmp_path / "model.stablehlo")
    save_aot(path, blob, emb_keys, mask_keys)
    fn, ek, mk = load_aot(path)
    assert ek == emb_keys and mk == mask_keys
    emb, msk = fn(batch)
    for i, k in enumerate(ek):
        np.testing.assert_allclose(
            np.asarray(emb)[i],
            np.asarray(oracle[k])[:4],
            rtol=1e-5,
            atol=1e-6,
        )
    for i, k in enumerate(mk):
        np.testing.assert_array_equal(
            np.asarray(msk)[i],
            np.asarray(oracle["modality_sample_mask"][k])[:4],
        )


def test_serve_from_aot_artifact(service_and_oracle, tmp_path):
    """EmbeddingService.from_aot serves an export_aot artifact with NO
    config/model/checkpoint: same embeddings as the live service, and
    the micro-batcher works on top of the baked executable."""
    from mca_tpu.tools.export_aot import (
        export_packed_forward,
        save_aot,
    )

    svc, oracle, rows = service_and_oracle
    batch = svc._pad(rows[:4])
    blob, emb_keys, mask_keys = export_packed_forward(
        svc.config, svc.params, batch
    )
    path = str(tmp_path / "model.stablehlo")
    save_aot(
        path,
        blob,
        emb_keys,
        mask_keys,
        modality_config=svc.config.modality_config.to_plain(),
        batch=svc.max_batch,
    )
    asvc = EmbeddingService.from_aot(path)
    assert asvc.max_batch == svc.max_batch
    out = asvc.embed(rows[:3])
    for k in asvc.emb_keys:
        np.testing.assert_allclose(
            out["embeddings"][k],
            np.asarray(oracle[k])[:3],
            rtol=1e-5,
            atol=1e-6,
        )
    # micro-batching path on the artifact
    asvc.start()
    try:
        futs = [asvc.submit(r) for r in rows[:2]]
        results = [f.result(timeout=60) for f in futs]
    finally:
        asvc.stop()
    for i, r in enumerate(results):
        np.testing.assert_allclose(
            r["embeddings"]["fusion"],
            np.asarray(oracle["fusion"])[i],
            rtol=1e-5,
            atol=1e-6,
        )


def test_aot_artifact_without_metadata_rejected(
    service_and_oracle, tmp_path
):
    from mca_tpu.tools.export_aot import (
        export_packed_forward,
        save_aot,
    )

    svc, _, rows = service_and_oracle
    batch = svc._pad(rows[:4])
    blob, emb_keys, mask_keys = export_packed_forward(
        svc.config, svc.params, batch
    )
    path = str(tmp_path / "old.stablehlo")
    save_aot(path, blob, emb_keys, mask_keys)  # no serving metadata
    with pytest.raises(ValueError, match="serving metadata"):
        EmbeddingService.from_aot(path)


def test_parallel_config_keys_degrade_without_mesh():
    """seq_shard/mesh_pipe are train-time execution strategies — model
    consumers that never inject a mesh (infer/serve/export) must fall
    back to the sequential stack, not crash."""
    cfg = training_config_from_dict(
        tiny_config("tcga", batch_size=4, seq_shard=True, mesh_pipe=2)
    )
    mc = get_model_config(cfg)
    assert mc["seq_shard"] and mc["pipeline_stages"] == 2
    model = build_model(mc)  # no seq_shard_mesh / pipeline_mesh
    widths = {m: c["pad_len"] for m, c in cfg.modality_config.items()}
    rows = make_tcga_like(4, widths=widths, seed=0)
    batch = jax.tree.map(
        jnp.asarray, MultimodalCollator(cfg.modality_config.to_plain())(rows)
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    # and the serving path on the same config
    svc = EmbeddingService(cfg, params=params, max_batch=4)
    res = svc.embed(rows[:2])
    assert np.isfinite(res["embeddings"]["fusion"]).all()


def test_zero_wait_dispatches_immediately(service_and_oracle):
    """max_wait_ms=0 must not wait for a full batch."""
    import time

    svc, oracle, rows = service_and_oracle
    svc.max_wait_s = 0.0
    svc.start()
    try:
        t0 = time.monotonic()
        fut = svc.submit(rows[0])
        res = fut.result(timeout=30)
        assert time.monotonic() - t0 < 10
        np.testing.assert_allclose(
            res["embeddings"]["fusion"],
            np.asarray(oracle["fusion"])[0],
            rtol=1e-5,
            atol=1e-6,
        )
    finally:
        svc.stop()
        svc.max_wait_s = 5e-3


def test_stop_fails_stranded_requests(service_and_oracle):
    """Requests still queued at stop() get an exception, not a hang."""
    svc, oracle, rows = service_and_oracle
    from concurrent.futures import Future

    fut = Future()
    svc._queue.put((rows[0], fut))  # no batcher running
    svc.stop()
    with pytest.raises(Exception):
        fut.result(timeout=5)
