#!/usr/bin/env python
"""Experiment: int8 attention scores/context inside the int8 sub-layer.

The int8-static serving path (`ops/fused_int8.py`) runs every token-wise
matmul as int8 x int8 -> int32 but keeps the softmax attention itself in
bf16 from the dequantised q/k/v — attention is ~10% of FLOPs but its
score/context matmuls have a 64-deep contraction (hd=64 across the whole
DINOv2/v3 family) that caps MXU utilisation at 50%, so the attention
sub-layer measures ~75-85 TFLOP/s vs the MLP's ~137 (ROADMAP). The v5e
MXU doubles its int8 rate, so quantizing the attention operands could
reclaim part of that gap:

  A bf16-mhsa      — the shipping `_attn_i8_kernel` math (baseline)
  B i8-scores      — q/k requantized to int8 (one [T, 2E] round pass; the
                     static-fold design puts q/k in pre-scaled domain so
                     quantization is round+saturate), scores int8 on the
                     MXU, softmax f32, context bf16
  C i8-scores+ctx  — B plus v int8 and the probabilities quantized by
                     folding 127 into the exp2 bias (p = exp2(s-m+log2 127)
                     is already in [0,127] — round only), context int8,
                     the 1/127 and v-scale folded into the output-side
                     normaliser (zero extra passes)

Run on a real v5e: `python tools/bench_attn_i8.py`. Decision recorded in
ROADMAP.md; the winning variant ships in `_attn_i8_kernel` behind the
static-calibration gate (the folds need calibrated scales).
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

from mst_tpu.ops.attention import _on_tpu
from mst_tpu.ops.fused_block import _COMPILER_PARAMS, _pick_block

DEPTH = 24  # deep enough that per-dispatch time dominates link overhead
LOG2E = math.log2(math.e)
LOG127 = math.log2(127.0)


def _dot_i8(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.int32)


def make_kernel(variant: str, num_heads: int):
    def kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref, o_ref):
        K, S, E = x_ref.shape
        hd = E // num_heads
        x = x_ref[:].reshape(K * S, E)
        cd = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns_ref[0] + lnb_ref[0]
        hq = jnp.clip(jnp.round(h), -127.0, 127.0).astype(jnp.int8)
        qkv_f = (_dot_i8(hq, wqkv_ref[:], (((1,), (0,)))).astype(jnp.float32)
                 * sqkv_ref[0] + bqkv_ref[0])
        scale = (1.0 / math.sqrt(hd)) * LOG2E
        if variant == "A":
            qkv = qkv_f.astype(cd)
        elif variant == "B":
            # q/k pre-scaled domain: requantize, keep v bf16
            qk_q = jnp.clip(jnp.round(qkv_f[:, :2 * E]), -127.0,
                            127.0).astype(jnp.int8)
            v_b = qkv_f[:, 2 * E:].astype(cd)
        else:  # C
            qkv_q = jnp.clip(jnp.round(qkv_f), -127.0, 127.0).astype(jnp.int8)
        outs = []
        for sl in range(K):
            lo = sl * S
            souts = []
            for i in range(num_heads):
                if variant == "A":
                    q = qkv[lo:lo + S, i * hd:(i + 1) * hd]
                    k = qkv[lo:lo + S, E + i * hd:E + (i + 1) * hd]
                    v = qkv[lo:lo + S, 2 * E + i * hd:2 * E + (i + 1) * hd]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp2(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(cd), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) / l
                elif variant == "B":
                    qq = qk_q[lo:lo + S, i * hd:(i + 1) * hd]
                    kq = qk_q[lo:lo + S, E + i * hd:E + (i + 1) * hd]
                    v = v_b[lo:lo + S, i * hd:(i + 1) * hd]
                    s = _dot_i8(qq, kq, (((1,), (1,)))).astype(
                        jnp.float32) * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp2(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(cd), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) / l
                else:  # C
                    qq = qkv_q[lo:lo + S, i * hd:(i + 1) * hd]
                    kq = qkv_q[lo:lo + S, E + i * hd:E + (i + 1) * hd]
                    vq = qkv_q[lo:lo + S, 2 * E + i * hd:2 * E + (i + 1) * hd]
                    s = _dot_i8(qq, kq, (((1,), (1,)))).astype(
                        jnp.float32) * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp2(s - m + LOG127)  # in [0, 127]
                    l = jnp.sum(p, axis=-1, keepdims=True)  # 127x real sum
                    pq = jnp.round(p).astype(jnp.int8)
                    o = _dot_i8(pq, vq, (((1,), (0,)))).astype(
                        jnp.float32) / l
                souts.append(o.astype(cd))
            outs.append(jnp.concatenate(souts, axis=-1))
        o = jnp.concatenate(outs, axis=0)
        oq = jnp.clip(jnp.round(o.astype(jnp.float32)), -127.0,
                      127.0).astype(jnp.int8)
        y = (_dot_i8(oq, wproj_ref[:], (((1,), (0,)))).astype(jnp.float32)
             * sproj_ref[0] + bproj_ref[0])
        o_ref[:] = (xf + y).astype(o_ref.dtype).reshape(K, S, E)

    return kernel


def bench(variant: str, N: int, S: int, E: int, num_heads: int,
          iters: int = 3) -> float:
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
    # cap=1 matches production: attention serving programs run UNPACKED
    # since the late-r3 rebalance (_pick_block docstring)
    block_n = _pick_block(N, S, E, cap=1)
    operands = [lns, lnb, wqkv, sqkv, bqkv, wproj, sproj, bproj]
    in_specs = [pl.BlockSpec((block_n, S, E), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)]
    for item in operands:
        in_specs.append(pl.BlockSpec(item.shape, lambda n: (0, 0),
                                     memory_space=pltpu.VMEM))

    kern = make_kernel(variant, num_heads)

    @jax.jit
    def run(x, *ops):
        # one DEEP program per dispatch: per-dispatch timing is unreliable
        # here (the tunneled platform memoizes identical dispatches, and a
        # bf16 residual stream that outgrows its sublayer updates turns
        # x + y into an exact fixed point — measured as impossible TF/s).
        # Damping the stream between sublayers keeps activations bounded
        # so no fixed point can form; cost is one multiply per sublayer.
        h = x
        for _ in range(DEPTH):
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

    float(jnp.sum(run(x, *operands)).astype(jnp.float32))
    # distinct inputs per timed dispatch, and a forced DEVICE->HOST value
    # sync inside the timed region: block_until_ready has been observed
    # returning early through the axon relay (BASELINE.md), which measured
    # this very kernel at an impossible 30 PFLOP/s
    xs = [x + jnp.asarray(i + 1, x.dtype) for i in range(iters)]
    dts = []
    checksum = 0.0
    for i in range(iters):
        t0 = time.perf_counter()
        h = run(xs[i], *operands)
        checksum = float(jnp.sum(h).astype(jnp.float32))
        dts.append(time.perf_counter() - t0)
    assert math.isfinite(checksum), "non-finite bench output"
    dt = min(dts)
    # MACs per sublayer: qkv + proj + scores + context
    macs = DEPTH * N * (S * E * 4 * E + 2 * S * S * E)
    tfs = 2 * macs / dt / 1e12
    print(f"  {variant}: {dt * 1e3:8.2f} ms  {tfs:6.1f} TFLOP/s-equiv")
    return dt


def main():
    for (name, N, S, E, nh) in (
        ("ViT-S/14 224 (S=257, E=384, h=6), N=256", 256, 257, 384, 6),
        ("DINOv3-S/16 224 (S=201, E=384, h=6), N=256", 256, 201, 384, 6),
        ("giant2 (S=257, E=1536, h=24), N=32", 32, 257, 1536, 24),
    ):
        print(name)
        base = None
        for v in ("A", "B", "C"):
            dt = bench(v, N, S, E, nh)
            if v == "A":
                base = dt
            else:
                print(f"     -> {base / dt:5.2f}x vs A")


if __name__ == "__main__":
    main()
