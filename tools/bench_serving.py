#!/usr/bin/env python
"""Serving latency benchmark: per-request latency percentiles at several
batch sizes through the fused inference path (the production-serving view
the reference never had — `bench.py` reports throughput; this reports
p50/p90/p99 per batch).

    python tools/bench_serving.py [--model_size small] [--iters 50]

Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_size", default="small")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    args = ap.parse_args(argv)

    from mst_tpu.models.mst import dino_v2_classifier_slice
    from mst_tpu.train.predictor import make_predict_fn

    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size=args.model_size,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_flash=on_tpu,
    )
    key = jax.random.PRNGKey(0)
    init_src = jax.random.normal(
        key, (1, 1, args.depth, args.hw, args.hw), jnp.float32)
    params = model.init(key, init_src)["params"]
    predict = make_predict_fn(model, with_saliency=False)

    results = []
    for bs in args.batches:
        src = jax.random.normal(
            jax.random.fold_in(key, bs),
            (bs, 1, args.depth, args.hw, args.hw), jnp.float32)
        probs, _ = predict(params, src, None)
        np.asarray(probs)  # compile + sync
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            probs, _ = predict(params, src, None)
            np.asarray(probs)  # forced host sync per request
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        row = {
            "batch": bs,
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p90_ms": round(float(np.percentile(lat, 90)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "volumes_per_sec": round(bs / (np.median(lat) / 1e3), 2),
            "backend": jax.default_backend(),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
