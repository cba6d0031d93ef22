#!/usr/bin/env python
"""A/B the CLS-only last block (`vit_fast._cls_last_block`) on device.

Measures the flagship ViT-S serving forward and the bs8 train step with
the cheap-last path ON (default) vs OFF (MST_NO_CHEAP_LAST=1 forces the
full-kernel last block). Run twice, once per mode:

    python tools/bench_cheap_last_ab.py
    MST_NO_CHEAP_LAST=1 python tools/bench_cheap_last_ab.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from mst_tpu.models.mst import dino_v2_classifier_slice
    from mst_tpu.models.vit_fast import fused_mst_logits

    mode = "OFF" if os.environ.get("MST_NO_CHEAP_LAST") else "ON"
    model = dino_v2_classifier_slice(out_ch=2, model_size="small",
                                     dtype=jnp.bfloat16, use_flash=True)
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (32, 1, 32, 224, 224), jnp.float32)
    params = model.init(key, src[:1])["params"]

    fwd = jax.jit(lambda p, s: fused_mst_logits(p, s, model))
    fwd(params, src).block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(params, src)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"cheap_last={mode} serve bs32: {32 / best:.1f} vol/s")

    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model)
    src8 = jax.random.normal(key, (8, 1, 32, 224, 224), jnp.float32)
    tgt = jnp.zeros((8,), jnp.int32)
    state, *_ = step(state, src8, tgt, None)
    jax.block_until_ready(state.params)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(8):
            state, loss, _ = step(state, src8, tgt, None)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"cheap_last={mode} train bs8: {8 / best:.1f} vol/s")


if __name__ == "__main__":
    main()
