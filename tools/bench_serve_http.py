#!/usr/bin/env python
"""End-to-end HTTP serving bench: concurrent clients -> dynamic batcher ->
fused TPU serving program -> JSON responses.

Measures sustained requests/sec and per-request p50/p99 latency through
the WHOLE serving stack (HTTP parse, npy decode, queue, batch pad, H2D
transfer, device forward, softmax, response). On THIS dev environment the
host->device link is tunneled and caps e2e volume transfer at ~1.7 vol/s
(tools/bench_pipeline.py) — the measured number is a lower bound that is
link-bound, not framework-bound; on a real TPU host the device program
(~290 vol/s ViT-S, bench.py) is the bound.

    python tools/bench_serve_http.py [--clients 8] [--seconds 20]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(clients: int = 8, seconds: float = 20.0, batch: int = 8,
         depth: int = 32, hw: int = 224, quiet: bool = False):
    from mst_tpu.models.mst import dino_v2_classifier_slice
    from mst_tpu.serve import BatchingPredictor, serve_http
    from mst_tpu.train.predictor import make_predict_fn

    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_flash=on_tpu)
    key = jax.random.PRNGKey(0)
    vol = np.asarray(jax.random.normal(key, (1, depth, hw, hw)), np.float32)
    params = model.init(key, jnp.asarray(vol[None]))["params"]

    predict = make_predict_fn(model, with_saliency=False)
    bp = BatchingPredictor(predict, params, batch_size=batch, max_wait_ms=5)
    bp.submit(vol, timeout=600)  # compile before timing
    server = serve_http(bp, port=0)
    port = server.server_address[1]

    buf = io.BytesIO()
    np.save(buf, vol)
    payload = buf.getvalue()
    lat: list = []
    lock = threading.Lock()
    stop = time.monotonic() + seconds

    def client():
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=payload,
                method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    server.shutdown()
    bp.close()

    lat.sort()
    row = {
        "metric": "HTTP serving e2e (dynamic batching)",
        "value": round(len(lat) / wall, 2), "unit": "requests/sec",
        "clients": clients, "batch": batch,
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
        "p99_ms": round(lat[int(len(lat) * 0.99)] * 1e3, 1),
        "batches_run": bp.batches_run,
        "mean_batch_fill": round(bp.volumes_served
                                 / max(bp.batches_run, 1), 2),
        "backend": jax.default_backend(),
        "note": "host->device link through the dev tunnel caps e2e "
                "transfer (~1.7 vol/s, bench_pipeline.py); device program "
                "bound is bench.py's serving line",
    }
    if not quiet:
        print(json.dumps(row))
    return row


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()
    main(clients=a.clients, seconds=a.seconds, batch=a.batch)
