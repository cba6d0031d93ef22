#!/usr/bin/env python
"""Online inference server — the deployment-shaped counterpart of
`main_predict.py` (which is the reference's offline bs=1 eval loop,
`/root/reference/scripts/main_predict.py:204-223`; the reference ships no
server at all).

    python scripts/main_serve.py --run_folder runs/LIDC/DinoV2ClassifierSlice_... \
        [--port 8760] [--batch_size 8] [--max_wait_ms 5] [--int8 [--int8_calib N]] \
        [--num_devices N] [--dtype bfloat16]

Concurrent POSTs to /predict coalesce into fixed-shape device batches
(ONE compiled program; dynamic batching in `mst_tpu/serve.py`) running the
same fused Pallas / int8 kernels as the predict CLI; `--num_devices`
shards each batch over local chips (`make_predict_fn(mesh=...)`).

API:  POST /predict  (np.save bytes of a [C, D, H, W] float volume)
          -> {"probs": [...], "pred": argmax}
      GET  /healthz  -> {"ok": true, "model": ..., "volumes_served": N}
"""

from __future__ import annotations

import argparse
import logging
import sys
import threading
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("main_serve")
log.setLevel(logging.INFO)
logging.getLogger("mst_tpu").setLevel(logging.INFO)


def build_server(args):
    """-> (server, predictor); split from main() for in-process tests."""
    import jax

    from mst_tpu.export import enable_compilation_cache
    from mst_tpu.serve import BatchingPredictor, load_run_model, serve_http
    from mst_tpu.train.predictor import make_predict_fn

    enable_compilation_cache(getattr(args, "compilation_cache", None))

    if getattr(args, "exported", None):
        # AOT artifact (main_export.py): program + weights, no tracing.
        from mst_tpu.export import load_exported

        exported = load_exported(args.exported)
        buckets = exported.buckets
        if args.batch_size not in buckets:
            raise SystemExit(
                f"--batch_size {args.batch_size} is not an exported bucket "
                f"{buckets}; pick one or re-export with it included")
        if args.num_devices != 1:
            raise SystemExit("--exported serves the single-device program; "
                             "use --run_folder for --num_devices sharding")
        predictor = BatchingPredictor(exported, exported.params,
                                      batch_size=args.batch_size,
                                      max_wait_ms=args.max_wait_ms)
        server = serve_http(
            predictor, host=args.host, port=args.port,
            info={"model": exported.meta.get("model"),
                  "backend": jax.default_backend(),
                  "batch_size": args.batch_size,
                  "exported": str(args.exported),
                  "int8": bool(exported.meta.get("int8"))})
        return server, predictor

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params, batch_stats = load_run_model(args.run_folder, dtype=dtype)

    if args.int8:
        from mst_tpu.models.vit_fast import fused_config_supported
        from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

        if not (fused_config_supported(model) and batch_stats is None
                and jax.default_backend() == "tpu"):
            raise SystemExit("--int8 needs the fused TPU serving path "
                             "(Dino transformer-fusion config, TPU backend)")
        if args.int8_calib:
            # static scales must be calibrated on REAL activations: pull N
            # volumes from the run's own val split (shared helper — same
            # contract as the export CLI and the predict CLI's eval-loader
            # calibration)
            from mst_tpu.serve import calibration_volumes

            try:
                calib = calibration_volumes(args.run_folder, args.path_root,
                                            args.int8_calib)
            except ValueError as e:
                raise SystemExit(f"--int8_calib: {e}")
            params = quantize_mst_params_int8(params, model, calib)
        else:
            params = quantize_mst_params_int8(params)

    mesh = None
    if args.num_devices != 1:
        from mst_tpu.parallel.mesh import make_mesh

        devs = jax.local_devices()
        n = len(devs) if args.num_devices < 0 else args.num_devices
        if n > len(devs):
            raise SystemExit(f"--num_devices {n}: only {len(devs)} local "
                             "devices attached")
        if n > 1:
            if args.batch_size % n:
                raise SystemExit("--batch_size must be a multiple of "
                                 "--num_devices (the server always launches "
                                 "full padded batches)")
            mesh = make_mesh((("data", n),), devices=devs[:n])

    predict = make_predict_fn(model, with_saliency=False, mesh=mesh)
    predictor = BatchingPredictor(predict, params,
                                  batch_size=args.batch_size,
                                  max_wait_ms=args.max_wait_ms)
    server = serve_http(
        predictor, host=args.host, port=args.port,
        info={"model": type(model).__name__,
              "backend": jax.default_backend(),
              "batch_size": args.batch_size,
              "int8": bool(args.int8)})
    return server, predictor


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_folder", default=None,
                    help="trained run directory (or use --exported)")
    ap.add_argument("--exported", default=None,
                    help="AOT serving artifact from main_export.py — "
                         "loads program + weights, no tracing/model code")
    ap.add_argument("--compilation_cache", default=None,
                    help="persistent XLA compile cache directory (also "
                         "honours $MST_COMPILATION_CACHE)")
    ap.add_argument("--path_root", default=None,
                    help="dataset root — only needed for --int8_calib "
                         "(calibration volumes come from the val split)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8760)
    ap.add_argument("--batch_size", type=int, default=8,
                    help="device batch: requests coalesce up to this many "
                         "per launch (one compiled shape; tails padded)")
    ap.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="max time the batcher waits for co-riders after "
                         "the first queued request")
    ap.add_argument("--num_devices", type=int, default=1,
                    help="shard each batch over N local chips (-1 = all)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--int8", action="store_true",
                    help="serve the encoder on the W8A8 int8 kernels")
    ap.add_argument("--int8_calib", type=int, default=0,
                    help="with --int8: calibrate static activation scales "
                         "on N volumes from the run's val split (needs "
                         "--path_root); omit for dynamic per-token scales")
    args = ap.parse_args(argv)
    if bool(args.run_folder) == bool(args.exported):
        ap.error("give exactly one of --run_folder or --exported")

    server, predictor = build_server(args)
    log.info("ready — POST /predict, GET /healthz; Ctrl-C to stop")
    try:
        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        predictor.close()


if __name__ == "__main__":
    main()
