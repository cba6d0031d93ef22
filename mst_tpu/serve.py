"""Online inference serving: dynamic batching over the jitted predict fn.

The reference has no serving story — its `main_predict.py` is an offline
bs=1 eval loop. Production serving on TPU wants the opposite shape: ONE
compiled program at a fixed batch size (XLA recompiles per shape), fed by
a queue that coalesces concurrent requests (dynamic batching) and pads
the tail. This module provides:

- `BatchingPredictor`: thread-safe `submit(volume) -> probs` backed by a
  collector thread that drains up to `batch_size` queued volumes (waiting
  at most `max_wait_ms` after the first), pads to the fixed batch, and
  runs the SAME jitted program the predict CLI uses (fused Pallas / int8
  kernels on TPU, `make_predict_fn(mesh=...)` data-parallel over local
  chips when asked).
- `serve_http`: a minimal stdlib HTTP endpoint (POST /predict with an
  .npy volume body, GET /healthz) on top of it — ThreadingHTTPServer, so
  concurrent clients batch together on the device.
- `load_run_model`: run-folder -> (model, params, batch_stats), the same
  hparams/checkpoint contract as `scripts/main_predict.py:128-144`.

Padding a short batch re-runs real rows — row results are batch-invariant
(proven by tests/test_train_e2e.py::test_predict_batched), so padded rows
are simply dropped.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_HPARAM_KEYS = (
    "model_size", "slice_fusion", "rotary", "use_bottleneck",
    "use_slice_pos_emb", "freeze", "fusion_heads", "num_register_tokens",
    "pos_embed_grid", "layerscale_init", "gelu_approximate", "use_rope_2d",
    "patch_size", "use_pos_embed", "rope_normalized", "norm_eps",
    "ffn_layer", "ffn_hidden",
)


def load_run_model(run_folder, dtype=None):
    """Run folder (main_train.py output) -> (model, params, batch_stats)."""
    import jax.numpy as jnp

    from mst_tpu.registry import get_model
    from mst_tpu.utils.checkpoint import load_best_checkpoint, load_hparams

    path_run = Path(run_folder)
    if not (path_run / "best_checkpoint.json").exists():
        raise FileNotFoundError(
            f"{path_run} is not a run folder (no best_checkpoint.json)")
    hparams = load_hparams(path_run) or {}
    model_kw = {k: v for k, v in hparams.items() if k in _HPARAM_KEYS}
    model, _ = get_model(path_run.name.split("_")[0],
                         dtype=dtype or jnp.float32, **model_kw)
    ckpt = load_best_checkpoint(path_run)
    return model, ckpt["params"], ckpt.get("batch_stats")


def calibration_volumes(run_folder, path_root, n: int):
    """First `n` val-split volumes of the run's own dataset, as served —
    the static-int8 calibration contract shared by the serve and export
    CLIs (the predict CLI calibrates on its eval loader equivalently).

    Raises ValueError when the dataset needs a --path_root that wasn't
    given; CLIs turn that into their usage error.
    """
    import jax.numpy as jnp

    from mst_tpu.registry import get_dataset

    dataset_name = Path(run_folder).parent.name
    if dataset_name != "Synthetic" and not path_root:
        raise ValueError(
            "static int8 calibration draws volumes from the run's val "
            "split — pass --path_root (or use dynamic scales: --int8 "
            "without --int8_calib)")
    if dataset_name == "Synthetic":
        ds_kw = {}
    else:
        from mst_tpu.utils.checkpoint import load_hparams

        fold = (load_hparams(Path(run_folder)) or {}).get("fold", 0)
        ds_kw = {"path_root": path_root, "fold": fold}
    ds = get_dataset(dataset_name, split="val", **ds_kw)
    n = min(int(n), len(ds))
    return jnp.asarray(np.stack(
        [np.asarray(ds[i]["source"], np.float32) for i in range(n)]))


class _Pending:
    __slots__ = ("event", "result", "error", "abandoned")

    def __init__(self):
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False  # submitter timed out; don't burn device time


class BatchingPredictor:
    """Dynamic batching: blocking `submit(volume)` from any thread; a
    collector coalesces requests into one fixed-shape device program.

    predict_fn: `make_predict_fn(...)` callable — (params, source, mask)
    -> (probs, saliency|None). The batch is padded by repeating the first
    volume so every launch compiles to the single (batch_size, ...) shape.
    """

    def __init__(self, predict_fn, params, batch_size: int = 8,
                 max_wait_ms: float = 5.0):
        self._predict = predict_fn
        self._params = params
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()  # orders submits vs close()
        self.batches_run = 0
        self.volumes_served = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="mst-serve-batcher")
        self._worker.start()

    def submit(self, volume: np.ndarray, timeout: Optional[float] = None
               ) -> np.ndarray:
        """volume [C, D, H, W] -> probs [n_classes] (blocks until served)."""
        if volume.ndim != 4:
            raise ValueError(f"expected a [C, D, H, W] volume, got shape "
                             f"{tuple(volume.shape)}")
        p = _Pending()
        # closed-check and enqueue under one lock: otherwise a submit racing
        # close() can land BEHIND the shutdown sentinel and wait forever
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("predictor is closed")
            self._q.put((np.asarray(volume, np.float32), p))
        if not p.event.wait(timeout):
            p.abandoned = True  # collector drops it instead of serving it
            raise TimeoutError("predict timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self):
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=10)

    # -- collector ---------------------------------------------------------
    def _collect(self):
        import time

        item = self._q.get()
        if item is None:
            return None
        batch = [item]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the sentinel for shutdown
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while True:
            try:
                batch = self._collect()
            except Exception:  # queue internals never raise in practice
                continue
            if batch is None:
                return
            batch = [b for b in batch if not b[1].abandoned]
            if not batch:
                continue
            vols = [b[0] for b in batch]
            pend = [b[1] for b in batch]
            try:
                n = len(vols)
                if n < self.batch_size:  # pad to the one compiled shape
                    vols = vols + [vols[0]] * (self.batch_size - n)
                src = np.stack(vols)
                probs, _ = self._predict(self._params, src, None)
                probs = np.asarray(probs)
                self.batches_run += 1
                self.volumes_served += n
                for i, p in enumerate(pend):
                    p.result = probs[i]
                    p.event.set()
            except Exception as e:  # surface to every waiter, keep serving
                for p in pend:
                    p.error = e
                    p.event.set()


def serve_http(predictor: BatchingPredictor, host: str = "127.0.0.1",
               port: int = 8760, info: Optional[dict] = None
               ) -> ThreadingHTTPServer:
    """Start (and return) a threading HTTP server wrapping `predictor`.

    POST /predict  body: np.save bytes of one [C, D, H, W] float volume
                   -> {"probs": [...], "pred": argmax}
    GET  /healthz  -> {"ok": true, ...info, "volumes_served": N}

    Call `.shutdown()` + `predictor.close()` to stop. Binds localhost by
    default — put a real ingress in front for anything public.
    """
    srv_info = dict(info or {})

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging, not stderr
            log.debug("http: " + fmt, *args)

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **srv_info,
                                 "volumes_served": predictor.volumes_served,
                                 "batches_run": predictor.batches_run})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                vol = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
            except Exception as e:  # malformed body -> caller's fault
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                probs = predictor.submit(vol)
                self._json(200, {"probs": [float(x) for x in probs],
                                 "pred": int(np.argmax(probs))})
            except ValueError as e:  # shape validation -> caller's fault
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # device/shutdown faults are OURS: 5xx
                # (a 400 here would stop load balancers from retrying or
                # marking the backend unhealthy)
                log.error("predict failed: %s: %s", type(e).__name__, e)
                self._json(503 if isinstance(e, (RuntimeError, TimeoutError))
                           else 500,
                           {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True,
                              name="mst-serve-http")
    thread.start()
    log.info("serving on http://%s:%d (batch %d)", host, port,
             predictor.batch_size)
    return server
