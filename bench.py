#!/usr/bin/env python
"""Benchmark: MST-DINOv2 (ViT-S/14) per-volume inference throughput.

North-star metric (BASELINE.json): volumes/sec/chip for LIDC-shaped
volumes [1, 32, 224, 224] through the full MST forward (per-slice ViT with
Pallas flash attention in bf16 + slice-fusion transformer + head).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

`vs_baseline` compares against the measured PyTorch reference anchor in
BASELINE_measured.json (the reference's own DinoV2ClassifierSlice forward,
measured in-situ on this host's CPU by tools/reference_baseline.py — the
reference repo ships no GPU numbers and this environment has no GPU;
see BASELINE.md).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def bench(batch: int = 4, depth: int = 32, hw: int = 224,
          iters: int = 20, warmup: int = 3) -> dict:
    from mst_tpu.models.mst import dino_v2_classifier_slice

    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu,
    )
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, depth, hw, hw), jnp.float32)
    params = model.init(key, source[:1])["params"]

    if on_tpu:
        from mst_tpu.models.vit_fast import fused_mst_logits

        @jax.jit
        def forward(source):
            return fused_mst_logits(params, source, model)
    else:
        @jax.jit
        def forward(source):
            return model.apply({"params": params}, source, deterministic=True)

    forward(source).block_until_ready()
    for _ in range(warmup):
        forward(source).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(source)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    vps = batch / dt

    # Secondary: full training-step throughput (fwd + CE + bwd + AdamW in
    # one donated program).
    import optax

    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model)
    target = jnp.zeros((batch,), jnp.int32)
    state, *_ = step(state, source, target, None)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    train_iters = max(iters // 2, 5)
    for _ in range(train_iters):
        state, loss, _ = step(state, source, target, None)
    jax.block_until_ready(loss)
    train_dt = (time.perf_counter() - t0) / train_iters
    del optax

    baseline_path = Path(__file__).parent / "BASELINE_measured.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs = vps / base["volumes_per_sec"]

    return {
        "metric": "MST-DINOv2 ViT-S/14 LIDC inference throughput",
        "value": round(vps, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "batch": batch, "depth": depth, "hw": hw,
            "latency_ms_per_batch": round(dt * 1e3, 2),
            "train_volumes_per_sec": round(batch / train_dt, 2),
            "train_step_ms": round(train_dt * 1e3, 2),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


if __name__ == "__main__":
    result = bench()
    print(json.dumps(result))
