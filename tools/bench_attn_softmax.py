#!/usr/bin/env python
"""Experiment: softmax cost inside the fused attention sub-layer kernel.

The serve-path attention sublayer measures ~66 TFLOP/s vs the MLP's ~140 at
MST shapes; the decomposition points at the per-head f32 softmax (VPU) as
the gap. Variants measured here:

  A baseline        — p = exp(s - m); p /= sum(p)       (current kernel)
  B fold-div        — divide the [S, hd] output by l instead of the [S, S] p
  C exp2-scale      — fold log2(e) into sm_scale, use exp2
  D B+C combined
  E D + bf16 exp    — compute the exponential in bf16
"""

from __future__ import annotations

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 12
LOG2E = math.log2(math.e)


def make_kernel(variant: str, num_heads: int):
    def kernel(x_ref, wqkv_ref, wproj_ref, o_ref):
        x = x_ref[0]
        S, E = x.shape
        hd = E // num_heads
        scale = 1.0 / math.sqrt(hd)
        qkv = jax.lax.dot_general(
            x, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        outs = []
        for i in range(num_heads):
            q = qkv[:, i * hd:(i + 1) * hd]
            k = qkv[:, E + i * hd: E + (i + 1) * hd]
            v = qkv[:, 2 * E + i * hd: 2 * E + (i + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if variant in ("C", "D", "E"):
                s = s * (scale * LOG2E)
                m = jnp.max(s, axis=-1, keepdims=True)
                if variant == "E":
                    p = jnp.exp2((s - m).astype(jnp.bfloat16))
                else:
                    p = jnp.exp2(s - m)
            else:
                s = s * scale
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
            if variant == "A":
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = o / l
            outs.append(o.astype(x.dtype))
        o = jnp.concatenate(outs, axis=-1)
        y = jax.lax.dot_general(
            o, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (x.astype(jnp.float32) + y).astype(o_ref.dtype)

    return kernel


def run_variant(variant, x, wqkv, wproj, num_heads):
    N, S, E = x.shape
    kern = make_kernel(variant, num_heads)
    call = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * E), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chain(x):
        for _ in range(DEPTH):
            x = call(x, wqkv, wproj)
        return x

    fn = jax.jit(chain)
    out = fn(x)
    # forced device->host VALUE read: block_until_ready has been observed
    # returning early through the axon relay (BASELINE.md)
    float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        out = fn(x)
    float(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters, out


def main():
    E, H = 384, 6
    N, S = 128, 257
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, S, E), jnp.bfloat16)
    wqkv = jax.random.normal(key, (E, 3 * E), jnp.bfloat16) * 0.05
    wproj = jax.random.normal(key, (E, E), jnp.bfloat16) * 0.05
    flops = DEPTH * N * (2 * S * E * 3 * E + 2 * S * S * E * 2 + 2 * S * E * E)

    t_a, ref = run_variant("A", x, wqkv, wproj, H)
    print(f"A baseline : {t_a*1e3:7.3f} ms  ({flops/t_a/1e12:6.1f} TFLOP/s)")
    for v in ("B", "C", "D", "E"):
        t, out = run_variant(v, x, wqkv, wproj, H)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{v}          : {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TFLOP/s)"
              f"  speedup {t_a/t:5.2f}x  max|diff|={err:.2e}")


if __name__ == "__main__":
    main()
