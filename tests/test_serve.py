"""Online serving (`mst_tpu/serve.py` + `scripts/main_serve.py`): dynamic
batching parity/coalescing, and an HTTP round trip against a real trained
run folder — the deployment surface the reference never shipped."""

import io
import json
import threading
import urllib.request
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def test_batching_predictor_parity_and_coalescing():
    """Concurrent submits coalesce into fixed-shape batches; every caller
    gets exactly the row the direct predict program produces (batch
    invariance is proven separately by test_predict_batched)."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.serve import BatchingPredictor
    from mst_tpu.train.predictor import make_predict_fn

    model = DinoSliceClassifier(out_ch=2, **TINY)
    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (6, 1, 2, 28, 28)), np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(vols[:1]))["params"]
    predict = make_predict_fn(model, with_saliency=False)
    ref_probs, _ = predict(params, jnp.asarray(vols), None)
    ref_probs = np.asarray(ref_probs)

    bp = BatchingPredictor(predict, params, batch_size=4, max_wait_ms=200)
    try:
        results = [None] * len(vols)

        def worker(i):
            results[i] = bp.submit(vols[i], timeout=120)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(vols))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(len(vols)):
            np.testing.assert_allclose(results[i], ref_probs[i], atol=1e-5)
        # 6 concurrent volumes on a batch-4 program: at most 3 launches
        # (coalescing worked), at least 2 (they can't all fit one)
        assert 2 <= bp.batches_run <= 3, bp.batches_run

        with pytest.raises(ValueError):
            bp.submit(vols[0, 0])  # not a [C, D, H, W] volume
    finally:
        bp.close()
    with pytest.raises(RuntimeError):
        bp.submit(vols[0])


def test_timed_out_submit_is_not_served():
    """A submit that raises TimeoutError must not burn a device launch:
    the collector drops abandoned requests instead of padding a batch for
    a result nobody reads."""
    import time

    from mst_tpu.serve import BatchingPredictor

    started = threading.Event()
    release = threading.Event()

    def slow_predict(params, src, mask):
        started.set()
        release.wait(10)
        return np.zeros((src.shape[0], 2), np.float32), None

    bp = BatchingPredictor(slow_predict, None, batch_size=2, max_wait_ms=1)
    try:
        # first request occupies the worker inside slow_predict
        t1 = threading.Thread(target=lambda: bp.submit(
            np.zeros((1, 2, 4, 4), np.float32), timeout=30))
        t1.start()
        assert started.wait(10)
        # second request times out while the worker is busy -> abandoned
        with pytest.raises(TimeoutError):
            bp.submit(np.zeros((1, 2, 4, 4), np.float32), timeout=0.05)
        release.set()
        t1.join(timeout=10)
        time.sleep(0.3)  # let the collector drain the abandoned entry
        assert bp.volumes_served == 1  # the abandoned one never ran
    finally:
        release.set()
        bp.close()


def test_http_server_fault_is_5xx():
    """Server-side faults (device error, closed predictor) must map to
    5xx, not 400 — load balancers treat 400 as the caller's fault."""
    import io
    import urllib.error
    import urllib.request

    from mst_tpu.serve import BatchingPredictor, serve_http

    def boom(params, src, mask):
        raise RuntimeError("device fell over")

    bp = BatchingPredictor(boom, None, batch_size=1, max_wait_ms=1)
    server = serve_http(bp, port=0)
    port = server.server_address[1]
    try:
        buf = io.BytesIO()
        np.save(buf, np.zeros((1, 2, 4, 4), np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 503
        # malformed body stays a 400
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=b"junk", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        bp.close()


@pytest.mark.slow
def test_http_server_roundtrip(tmp_path):
    """main_serve.build_server on a real run folder: /healthz + concurrent
    /predict posts return the direct predict rows."""
    from scripts.main_serve import build_server
    from scripts.main_train import main as train_main

    run_dir, _ = train_main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
        "--max_epochs", "1", "--batch_size", "4", "--num_train_samples", "8",
        "--run_dir", str(tmp_path),
    ])

    import argparse

    args = argparse.Namespace(
        run_folder=str(run_dir), host="127.0.0.1", port=0, batch_size=4,
        max_wait_ms=50.0, num_devices=1, dtype="float32", int8=False,
        int8_calib=0)
    server, predictor = build_server(args)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["model"] == "DinoSliceClassifier"

        from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
        from mst_tpu.serve import load_run_model
        from mst_tpu.train.predictor import make_predict_fn

        ds = Synthetic_Dataset3D(num_samples=4, shape_cdhw=(1, 2, 28, 28))
        vols = np.stack([np.asarray(ds[i]["source"], np.float32)
                         for i in range(4)])
        model, params, _ = load_run_model(run_dir, dtype=jnp.float32)
        ref, _ = make_predict_fn(model, with_saliency=False)(
            params, jnp.asarray(vols), None)
        ref = np.asarray(ref)

        results = [None] * 4

        def post(i):
            buf = io.BytesIO()
            np.save(buf, vols[i])
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(4):
            np.testing.assert_allclose(results[i]["probs"], ref[i], atol=1e-5)
            assert results[i]["pred"] == int(np.argmax(ref[i]))

        # malformed body -> 400, server keeps serving
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=b"not-an-npy", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["volumes_served"] == 4
    finally:
        server.shutdown()
        predictor.close()
