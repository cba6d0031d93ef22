#!/usr/bin/env python
"""ViT-giant2 frozen-encoder training on ONE chip — the reference's giant
workflow (frozen `model_size='g'` encoder + trainable slice fusion/head,
`mst/models/dino.py:69-71`). `freeze` stop-gradients the encoder so XLA
DCEs the 1.1B-param backward; the full train step fits a single v5e.

    python tools/bench_giant2_train.py  ->  one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main(batch: int = 2, iters: int = 6, int8: bool = False):
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    model = DinoSliceClassifier(out_ch=2, model_size="giant2", freeze=True,
                                dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, 32, 224, 224), jnp.float32)
    params = model.init(key, source[:1, :, :1, :28, :28])["params"]
    int8_enc = None
    if int8:
        # frozen int8 training: the encoder forward rides the W8A8 serving
        # kernels (static scales calibrated on the bench batch), backward
        # only through fusion + head — trainer `--int8 --int8_calib`
        from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

        t_q = time.perf_counter()
        int8_enc = quantize_mst_params_int8(
            {"encoder": params["encoder"]}, model, source[:1])["encoder"]
        print(f"# quantize+calibrate: {time.perf_counter() - t_q:.1f}s",
              file=sys.stderr, flush=True)
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-6, freeze_encoder=True),
        dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, int8_encoder=int8_enc)
    target = jnp.zeros((batch,), jnp.int32)
    t_c = time.perf_counter()
    state, loss, _ = step(state, source, target, None)
    float(loss)
    print(f"# first step (compile): {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, source, target, None)
    float(loss)  # forced host sync
    dt = (time.perf_counter() - t0) / iters
    row = {"metric": "giant2 frozen-encoder train throughput"
                     + (" (int8 encoder)" if int8 else ""),
           "value": round(batch / dt, 3), "unit": "volumes/sec/chip",
           "step_ms": round(dt * 1e3, 1), "batch": batch,
           "backend": jax.default_backend()}
    print(json.dumps(row))
    return row


if __name__ == "__main__":
    main(int8="--int8" in sys.argv)
