#!/usr/bin/env python
"""Experiment: one Pallas program per ViT BLOCK (attn + MLP) vs the
shipped two-programs-per-block layout.

The candidate saving is the inter-sublayer HBM round trip of the [S, E]
activation (~50 MB per boundary per direction at N=128 ViT-S shapes;
12 boundaries -> ~1.2 GB -> ~1.5 ms of the ~15 ms forward) plus one
kernel-launch boundary per block. The cost is a bigger VMEM working set
(both sub-layers' weights + the [S, 4E] hidden resident together).

Run on TPU: python tools/bench_block_fusion.py
"""

from __future__ import annotations

import math
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mst_tpu.ops.fused_block import _mhsa

N, S, E, H = 128, 257, 384, 6
HD = E // H
FF = 4 * E
DEPTH = 12


def _ln(xf, s_ref, b_ref, eps=1e-6):
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]


def _attn_half(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj):
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln1s, ln1b).astype(x.dtype)
    qkv = (jax.lax.dot_general(h, wqkv[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bqkv[0]).astype(x.dtype)
    o = _mhsa(qkv, E, HD, H, x.dtype)
    y = jax.lax.dot_general(o, wproj[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bproj[0]
    return (xf + y).astype(x.dtype)


def _mlp_half(x, ln2s, ln2b, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln2s, ln2b).astype(x.dtype)
    h = (jax.lax.dot_general(h, w1[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + b1[0]).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    y = jax.lax.dot_general(h, w2[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2[0]
    return (xf + y).astype(x.dtype)


def _attn_kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj, o_ref):
    o_ref[0] = _attn_half(x_ref[0], ln1s, ln1b, wqkv, bqkv, wproj, bproj)


def _mlp_kernel(x_ref, ln2s, ln2b, w1, b1, w2, b2, o_ref):
    o_ref[0] = _mlp_half(x_ref[0], ln2s, ln2b, w1, b1, w2, b2)


def _block_kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                  ln2s, ln2b, w1, b1, w2, b2, o_ref):
    h = _attn_half(x_ref[0], ln1s, ln1b, wqkv, bqkv, wproj, bproj)
    o_ref[0] = _mlp_half(h, ln2s, ln2b, w1, b1, w2, b2)


def call(kernel, x, operands):
    in_specs = [pl.BlockSpec((1, S, E), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(item)
    return pl.pallas_call(
        kernel, grid=(N,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    cd = jnp.bfloat16
    x = (jax.random.normal(ks[0], (N, S, E)) * 0.3).astype(cd)
    ln1s = jnp.ones((1, E), jnp.float32)
    ln1b = jnp.zeros((1, E), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (E, 3 * E)) * 0.05).astype(cd)
    bqkv = jnp.zeros((1, 3 * E), jnp.float32)
    wproj = (jax.random.normal(ks[2], (E, E)) * 0.05).astype(cd)
    bproj = jnp.zeros((1, E), jnp.float32)
    ln2s = jnp.ones((1, E), jnp.float32)
    ln2b = jnp.zeros((1, E), jnp.float32)
    w1 = (jax.random.normal(ks[3], (E, FF)) * 0.05).astype(cd)
    b1 = jnp.zeros((1, FF), jnp.float32)
    w2 = (jax.random.normal(ks[4], (FF, E)) * 0.05).astype(cd)
    b2 = jnp.zeros((1, E), jnp.float32)
    attn_ops = [ln1s, ln1b, wqkv, bqkv, wproj, bproj]
    mlp_ops = [ln2s, ln2b, w1, b1, w2, b2]

    @jax.jit
    def split_chain(x):
        for _ in range(DEPTH):
            x = call(_attn_kernel, x, attn_ops)
            x = call(_mlp_kernel, x, mlp_ops)
        return x

    @jax.jit
    def fused_chain(x):
        for _ in range(DEPTH):
            x = call(_block_kernel, x, attn_ops + mlp_ops)
        return x

    a = call(_attn_kernel, x, attn_ops)
    a = call(_mlp_kernel, a, mlp_ops)
    b = call(_block_kernel, x, attn_ops + mlp_ops)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |split - fused| = {err:.2e}")

    for label, fn in [("split", split_chain), ("block", fused_chain)] * 2:
        out = fn(x)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(x)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 20
        print(f"{label}: {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()

# RESULT (v5e, 2026-08-17): WASH — split 14.81/14.89 ms vs block
# 14.58/14.89 ms over the 12-layer chain (two interleaved reps). The
# inter-sublayer HBM round trip is already hidden by Mosaic's grid
# pipelining (next program's DMA overlaps compute), so merging the
# sub-layers buys ~0-1.5%% at best and costs VMEM headroom + a second
# kernel family. Not wired into the model; record kept so this is not
# re-tried. With split-CLS and FFN-packing (see the sibling tools) this
# closes the micro-architecture exploration: the shipped two-kernels-
# per-block layout is at its measured local optimum at ViT-S shapes.
