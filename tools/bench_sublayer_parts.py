#!/usr/bin/env python
"""Component micro-benchmarks of the fused ViT sub-layer kernels at MST
shapes (N=128 slice images, S=257 tokens, ViT-S E=384), each chained x12
inside one jit so device dispatch overhead amortizes as in the real model.

Reports achieved TFLOP/s per sub-layer so optimization effort goes where
the time actually is (the profiler is unavailable through the axon relay).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mst_tpu.ops.fused_block import (
    fused_attention_sublayer,
    fused_attention_sublayer_train,
    fused_mlp_sublayer,
    fused_mlp_sublayer_train,
)

DEPTH = 12


def timeit(fn, *args, iters=30):
    out = fn(*args)
    # forced device->host VALUE read: block_until_ready has been observed
    # returning early through the axon relay (BASELINE.md)
    float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    E, F, H = 384, 1536, 6
    N, S = 128, 257
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, S, E), jnp.bfloat16)
    ln_s = jnp.ones((E,), jnp.float32)
    ln_b = jnp.zeros((E,), jnp.float32)
    wqkv = jax.random.normal(key, (E, 3 * E), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * E,), jnp.float32)
    wproj = jax.random.normal(key, (E, E), jnp.bfloat16) * 0.02
    bproj = jnp.zeros((E,), jnp.float32)
    w1 = jax.random.normal(key, (E, F), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(key, (F, E), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((E,), jnp.float32)

    attn_flops = DEPTH * N * (
        2 * S * E * 3 * E          # qkv
        + 2 * S * S * E * 2        # s + p@v (all heads)
        + 2 * S * E * E            # proj
    )
    mlp_flops = DEPTH * N * (2 * S * E * F * 2)

    def attn_chain(x):
        for _ in range(DEPTH):
            x = fused_attention_sublayer(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                         bproj, None, H)
        return x

    def mlp_chain(x):
        for _ in range(DEPTH):
            x = fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, None, True)
        return x

    def attn_train_chain(x):
        for _ in range(DEPTH):
            x = fused_attention_sublayer_train(x, ln_s, ln_b, wqkv, bqkv,
                                               wproj, bproj, None, H)
        return x

    def mlp_train_chain(x):
        for _ in range(DEPTH):
            x = fused_mlp_sublayer_train(x, ln_s, ln_b, w1, b1, w2, b2, None,
                                         True)
        return x

    for name, fn, flops in [
        ("attn  (serve)", attn_chain, attn_flops),
        ("mlp   (serve)", mlp_chain, mlp_flops),
        ("attn  (train fwd)", attn_train_chain, attn_flops),
        ("mlp   (train fwd)", mlp_train_chain, mlp_flops),
    ]:
        t = timeit(jax.jit(fn), x)
        print(f"{name}: {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TFLOP/s)")

    # Train backward: grad of sum(chain) — measures fwd+bwd together.
    for name, fn, flops in [
        ("attn  (train fwd+bwd)", attn_train_chain, attn_flops),
        ("mlp   (train fwd+bwd)", mlp_train_chain, mlp_flops),
    ]:
        g = jax.jit(jax.grad(lambda x: fn(x).astype(jnp.float32).sum()))
        t = timeit(g, x)
        print(f"{name}: {t*1e3:7.3f} ms  (fwd-equiv x3: "
              f"{3*flops/t/1e12:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
