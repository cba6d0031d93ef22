#!/usr/bin/env python
"""Experiment: split-CLS attention layout vs the shipped 257-token layout.

S = 257 = CLS + 256 patches. The [S, S] score/prob matrices pad the lane
dim to 384 (Mosaic 128-lane granularity) — 1.5x wasted MXU/VPU work on
the biggest tensors in the attention sub-layer (measured ~32 TFLOP/s for
the scores+softmax+pv section vs 137 for the dense matmuls).

The split layout computes the patch-patch block as a perfectly tiled
[256, 256] matmul plus thin CLS strips:
  s_pp [256, 256] = q_p k_p^T   (tiled exactly)
  s_pc [256, 1]   = q_p k_c^T   (CLS-key column for patch queries)
  s_cp [1, 257]   = q_c k^T     (CLS-query row)
softmax per row then stitches the strips back.

Run on TPU: python tools/bench_attn_split_cls.py

RESULT (v5e, 2026-08-17): NEGATIVE — split 13.3 ms vs base 6.1 ms for the
12-layer mhsa chain. The thin CLS strips (M=1 / N=1 ops, mul-reduce
workarounds for a Mosaic N=1-matmul verifier bug) cost far more than the
384-lane padding saves; Mosaic evidently handles the padded [257, 384]
ops well. Keeping the tool as the record so this avenue is not re-tried.
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

N, S, E, H = 128, 257, 384, 6
HD = E // H
DEPTH = 12
_LOG2E = math.log2(math.e)


def _mhsa_base(qkv, cd):
    scale = 1.0 / math.sqrt(HD) * _LOG2E
    outs = []
    for i in range(H):
        q = qkv[:, i * HD:(i + 1) * HD]
        k = qkv[:, E + i * HD: E + (i + 1) * HD]
        v = qkv[:, 2 * E + i * HD: 2 * E + (i + 1) * HD]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(cd), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / l
        outs.append(o.astype(cd))
    return jnp.concatenate(outs, axis=-1)


def _mhsa_split(qkv, cd):
    """Split-CLS: patch-patch block tiled [256, 256]; CLS strips thin."""
    scale = 1.0 / math.sqrt(HD) * _LOG2E
    outs = []
    for i in range(H):
        q = qkv[:, i * HD:(i + 1) * HD]
        k = qkv[:, E + i * HD: E + (i + 1) * HD]
        v = qkv[:, 2 * E + i * HD: 2 * E + (i + 1) * HD]
        qp, qc = q[1:], q[:1]
        kp, kc = k[1:], k[:1]
        vp = v[1:]
        # patch queries. NOTE the CLS strip is a mul-reduce, not a matmul:
        # Mosaic lowers N=1/M=1 dots as broadcast+convert and emits invalid
        # IR ('vector.broadcast' bf16->f32 verification error).
        s_pp = jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
        kcf = jnp.broadcast_to(kc.astype(jnp.float32), (S - 1, HD))
        s_pc = jnp.sum(qp.astype(jnp.float32) * kcf, axis=-1,
                       keepdims=True) * scale
        m = jnp.maximum(jnp.max(s_pp, axis=-1, keepdims=True), s_pc)
        p_pp = jnp.exp2(s_pp - m)          # [256, 256]
        p_pc = jnp.exp2(s_pc - m)          # [256, 1]
        l = jnp.sum(p_pp, axis=-1, keepdims=True) + p_pc
        vc = jnp.broadcast_to(v[:1].astype(jnp.float32), (S - 1, HD))
        o_p = (jax.lax.dot_general(p_pp.astype(cd), vp,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + p_pc * vc) / l
        # CLS query row [1, 257]
        s_c = jax.lax.dot_general(qc, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale
        mc = jnp.max(s_c, axis=-1, keepdims=True)
        p_c = jnp.exp2(s_c - mc)
        o_c = jax.lax.dot_general(p_c.astype(cd), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) \
            / jnp.sum(p_c, axis=-1, keepdims=True)
        outs.append(jnp.concatenate([o_c, o_p], axis=0).astype(cd))
    return jnp.concatenate(outs, axis=-1)


def _kernel(x_ref, o_ref, *, mhsa):
    qkv = x_ref[0]
    o_ref[0] = mhsa(qkv, qkv.dtype)


def run(mhsa, x):
    return pl.pallas_call(
        partial(_kernel, mhsa=mhsa),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, S, 3 * E), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, E), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, E), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x)


def main():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (N, S, 3 * E), jnp.float32) * 0.3).astype(
        jnp.bfloat16)

    @jax.jit
    def chain_base(x):
        for _ in range(DEPTH):
            x = run(_mhsa_base, x)
        return x

    @jax.jit
    def chain_split(x):
        for _ in range(DEPTH):
            x = run(_mhsa_split, x)
        return x

    o1 = run(_mhsa_base, x)
    o2 = run(_mhsa_split, x)
    err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    print(f"max |base - split| = {float(err):.2e}")

    for label, fn in [("base ", chain_base), ("split", chain_split)]:
        out = fn(x)
        float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(x)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 20
        flops = N * DEPTH * H * 2 * 2 * S * S * HD
        print(f"{label}: {dt * 1e3:7.3f} ms   ({flops / dt / 1e12:5.1f} "
              f"TFLOP/s on score+pv FLOPs)")


if __name__ == "__main__":
    main()
