#!/usr/bin/env python
"""Micro-benchmark: does packing P slice images per fused-sublayer program
improve MXU utilization at MST shapes?

Hypothesis: at S=257 the matmul M-dimension pads to 128-row MXU tiles
(257 -> 384 worth of systolic passes), wasting ~1/3 of the M axis. Packing
P=8 slices gives M=2056 -> 94.5% tile utilization. The MLP sublayer is a
semantics-preserving proxy (LayerNorm + matmuls are per-token), so timing
it at [N, S, E] vs [N/P, P*S, E] isolates the M-packing effect without
writing a new kernel.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mst_tpu.ops.fused_block import fused_mlp_sublayer


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
    E, F = 384, 1536
    N, S = 128, 257  # MST: batch 4 x 32 slices, ViT-S/14 @224
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, S, E), jnp.bfloat16)
    ln_s = jnp.ones((E,), jnp.float32)
    ln_b = jnp.zeros((E,), jnp.float32)
    w1 = jax.random.normal(key, (E, F), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(key, (F, E), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((E,), jnp.float32)
    ls = None

    # Chain DEPTH sublayers inside one jit so per-dispatch overhead through
    # the device relay amortizes the way it does in the real 12-block model.
    DEPTH = 12

    def chained(x):
        for _ in range(DEPTH):
            x = fused_mlp_sublayer(x, ln_s, ln_b, w1, b1, w2, b2, ls, True)
        return x

    run = jax.jit(chained)
    flops = DEPTH * 2 * N * S * (E * F * 2)
    t_base = timeit(run, x)
    print(f"P= 1: {t_base*1e3:7.3f} ms  ({flops/t_base/1e12:6.1f} TFLOP/s)")
    for P in (2, 4, 8, 16):
        xp = x.reshape(N // P, P * S, E)
        t = timeit(jax.jit(chained), xp)
        print(f"P={P:2d}: {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TFLOP/s)  "
              f"speedup vs P=1: {t_base/t:5.2f}x")


if __name__ == "__main__":
    main()

# RESULT (v5e, 2026-08-17): isolated MLP-sublayer packing measures +10% at
# P=4, but wired into fused_vit_cls (free contiguous reshape around the
# FFN kernels) the END-TO-END forward is a wash: 15.53 ms packed vs
# 15.52 ms unpacked (A/B in one process, 3 reps each). The isolated gain
# is an artifact of the chained-microbench memory pattern; the full model
# overlaps inter-kernel latency anyway. Packing was reverted — this note
# is the record so the avenue is not re-tried.
