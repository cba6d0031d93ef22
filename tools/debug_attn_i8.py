#!/usr/bin/env python
"""Diagnostic for bench_attn_i8: is variant A really computing?

Compares one sublayer's output (DEPTH=1) of each variant against a pure
XLA mirror of the same math, and times a single deep dispatch of the
PRODUCTION bf16 serving sublayer (`fused_attention_sublayer`) beside
variant A at identical shapes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import tools.bench_attn_i8 as bi


def xla_ref(x, lns, lnb, wqkv, sqkv, bqkv, wproj, sproj, bproj, nh):
    N, S, E = x.shape
    hd = E // nh
    xf = x.reshape(N * S, E).astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    hq = jnp.clip(jnp.round(h), -127, 127).astype(jnp.int8)
    qkv = (jax.lax.dot_general(
        hq, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * sqkv + bqkv).astype(x.dtype)
    qkv = qkv.reshape(N, S, 3, nh, hd)
    q = jnp.moveaxis(qkv[:, :, 0], 1, 2).astype(jnp.float32)
    k = jnp.moveaxis(qkv[:, :, 1], 1, 2).astype(jnp.float32)
    v = jnp.moveaxis(qkv[:, :, 2], 1, 2).astype(jnp.float32)
    att = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd)
    p = jax.nn.softmax(att, -1)
    o = jnp.einsum("nhqk,nhkd->nhqd", p, v)
    o = jnp.moveaxis(o, 1, 2).reshape(N * S, E)
    oq = jnp.clip(jnp.round(o), -127, 127).astype(jnp.int8)
    y = (jax.lax.dot_general(
        oq, wproj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * sproj + bproj)
    return (xf + y).astype(x.dtype).reshape(N, S, E)


def main():
    N, S, E, nh = 32, 257, 384, 6
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (N, S, E), jnp.float32) * 4.0).astype(
        jnp.bfloat16)
    lns = jnp.ones((1, E), jnp.float32) * 8.0
    lnb = jnp.zeros((1, E), jnp.float32)
    wqkv = jax.random.randint(key, (E, 3 * E), -127, 128, jnp.int8)
    sqkv = jnp.full((1, 3 * E), 2e-3, jnp.float32)
    bqkv = jnp.zeros((1, 3 * E), jnp.float32)
    wproj = jax.random.randint(key, (E, E), -127, 128, jnp.int8)
    sproj = jnp.full((1, E), 2e-3, jnp.float32)
    bproj = jnp.zeros((1, E), jnp.float32)
    operands = [lns, lnb, wqkv, sqkv, bqkv, wproj, sproj, bproj]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mst_tpu.ops.attention import _on_tpu
    from mst_tpu.ops.fused_block import _COMPILER_PARAMS, _pick_block

    block_n = _pick_block(N, S, E)
    in_specs = [pl.BlockSpec((block_n, S, E), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)]
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))

    ref = np.asarray(jax.jit(
        lambda *a: xla_ref(*a, nh))(x, *operands), np.float32)
    print(f"ref mean|x|={np.abs(ref).mean():.3f}")
    outs = {}
    for v in ("A", "B", "C"):
        kern = bi.make_kernel(v, nh)

        @jax.jit
        def one(x, *ops, _kern=kern):
            return pl.pallas_call(
                _kern,
                grid=(N // block_n,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((block_n, S, E),
                                       lambda n: (n, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
                interpret=not _on_tpu(),
                compiler_params=_COMPILER_PARAMS,
            )(x, *ops)

        out = np.asarray(one(x, *operands), np.float32)
        outs[v] = out
        rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f"{v}: rel|out-ref|={rel:.3e}  mean|out|={np.abs(out).mean():.3f}")

    # time the PRODUCTION serving sublayer at the same shapes
    from mst_tpu.ops.fused_block import fused_attention_sublayer

    wq_b = (wqkv.astype(jnp.float32) * sqkv).astype(jnp.bfloat16)
    wp_b = (wproj.astype(jnp.float32) * sproj).astype(jnp.bfloat16)

    @jax.jit
    def prod(x):
        h = x
        for _ in range(12):
            h = fused_attention_sublayer(
                h, lns[0] / 8.0, lnb[0], wq_b, bqkv[0], wp_b, bproj[0],
                None, nh, 1e-6)
            h = h * jnp.asarray(0.5, h.dtype)
        return h

    float(jnp.sum(prod(x)).astype(jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(prod(x + 1.0)).astype(jnp.float32))  # relay-safe sync
    dt_prod = time.perf_counter() - t0

    kern = bi.make_kernel("A", nh)

    @jax.jit
    def deep_a(x, *ops):
        h = x
        for _ in range(12):
            h = pl.pallas_call(
                kern,
                grid=(N // block_n,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((block_n, S, E),
                                       lambda n: (n, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
                interpret=not _on_tpu(),
                compiler_params=_COMPILER_PARAMS,
            )(h, *ops)
            h = h * jnp.asarray(0.5, h.dtype)
        return h

    float(jnp.sum(deep_a(x, *operands)).astype(jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(deep_a(x + 1.0, *operands)).astype(jnp.float32))
    dt_a = time.perf_counter() - t0
    print(f"12-layer dispatch: production bf16 {dt_prod * 1e3:.2f} ms, "
          f"bench-A {dt_a * 1e3:.2f} ms  (N={N})")


if __name__ == "__main__":
    main()
