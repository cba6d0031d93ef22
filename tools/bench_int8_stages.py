#!/usr/bin/env python
"""Per-stage accounting of the int8 (W8A8) serving chain (VERDICT r3 #4):
where do the ~2.7 ms/vol of the int8-static ViT-S chain actually go, and
how much of the MXU's 2x int8 rate survives in situ?

Method: the production Pallas kernels are re-traced with surgical
ablations (monkeypatched module internals — the ablated kernels are NOT
numerically valid, they only isolate stage costs):

  bf16         production bf16 sub-layer kernels (reference point)
  i8-dynamic   production int8, per-token scales (in-kernel abs-max
               reduction + per-row rescale)
  i8-static    production int8, calibrated folded scales (round+clip only)
  i8-nocquant  static with round+clip replaced by a bare int8 cast —
               isolates the quantization pass cost (includes the
               f32(8,128)->int8(32,128) retile either way)
  i8-bf16mm    static with the int8 matmuls swapped for bf16 matmuls on
               in-kernel-cast operands — isolates the matmul-dtype gain
               with every other stage identical

Derived stage costs (per 12-layer chain at N=128 slices = 4 volumes):
  dynamic-scale reductions = i8-dynamic - i8-static
  round+clip passes        = i8-static  - i8-noquant
  int8 matmul gain kept    = i8-bf16mm  - i8-static
  net end-to-end gain      = bf16       - i8-static
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops import fused_block, fused_int8
from mst_tpu.utils.benchtime import timed_min

DEPTH = 12


def timeit(fn, *args, iters=30):
    return timed_min(fn, *args, iters=iters)


def _nodes(key, E, F):
    """Fake quantized weight nodes (values irrelevant to timing)."""
    ks = jax.random.split(key, 4)

    def node(shape, a_inv=False):
        n = {"q8": jax.random.randint(ks[0], shape, -127, 127, jnp.int8),
             "scale": jnp.full((1, shape[1]), 1e-2, jnp.float32),
             "bias": jnp.zeros((shape[1],), jnp.float32)}
        if a_inv:
            n["a_inv"] = jnp.full((1, 1), 0.5, jnp.float32)
        return n

    qkv = node((E, 3 * E))
    proj = node((E, E))
    fc1 = node((E, F))
    fc2 = node((F, E), a_inv=True)
    return qkv, proj, fc1, fc2


def main():
    E, F, H = 384, 1536, 6
    N, S = 128, 257
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, S, E), jnp.bfloat16)
    ln_s = jnp.ones((E,), jnp.float32)
    ln_b = jnp.zeros((E,), jnp.float32)
    qkv_n, proj_n, fc1_n, fc2_n = _nodes(key, E, F)
    fc2_dyn = {k: v for k, v in fc2_n.items() if k != "a_inv"}
    wqkv = jax.random.normal(key, (E, 3 * E), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * E,), jnp.float32)
    wproj = jax.random.normal(key, (E, E), jnp.bfloat16) * 0.02
    bproj = jnp.zeros((E,), jnp.float32)
    w1 = jax.random.normal(key, (E, F), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(key, (F, E), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((E,), jnp.float32)

    def attn_bf16(x):
        for _ in range(DEPTH):
            x = fused_block.fused_attention_sublayer(
                x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H)
        return x

    def mlp_bf16(x):
        for _ in range(DEPTH):
            x = fused_block.fused_mlp_sublayer(
                x, ln_s, ln_b, w1, b1, w2, b2, None, True)
        return x

    def attn_i8(x, static):
        for _ in range(DEPTH):
            x = fused_int8.fused_attention_sublayer_i8(
                x, ln_s, ln_b, qkv_n, proj_n, None, H, static=static)
        return x

    def mlp_i8(x, static):
        node2 = fc2_n if static else fc2_dyn
        for _ in range(DEPTH):
            x = fused_int8.fused_mlp_sublayer_i8(
                x, ln_s, ln_b, fc1_n, node2, None, True)
        return x

    rows = {}

    def run(tag, fn):
        t = timeit(jax.jit(fn), x)
        rows[tag] = t * 1e3
        print(f"{tag:22s}: {t*1e3:7.3f} ms / chain", flush=True)

    run("attn bf16", attn_bf16)
    run("attn i8-dynamic", lambda x: attn_i8(x, False))
    run("attn i8-static", lambda x: attn_i8(x, True))
    run("mlp  bf16", mlp_bf16)
    run("mlp  i8-dynamic", lambda x: mlp_i8(x, False))
    run("mlp  i8-static", lambda x: mlp_i8(x, True))

    # --- ablations (monkeypatched; numerically invalid, timing only) ---
    orig_quant = fused_int8._quant_static
    orig_dot = fused_int8._dot_i8
    try:
        fused_int8._quant_static = lambda h: h.astype(jnp.int8)
        run("attn i8-noquant", lambda x: attn_i8(x, True))
        run("mlp  i8-noquant", lambda x: mlp_i8(x, True))
    finally:
        fused_int8._quant_static = orig_quant
    try:
        fused_int8._dot_i8 = lambda aq, wq: jax.lax.dot_general(
            aq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        run("attn i8-bf16mm", lambda x: attn_i8(x, True))
        run("mlp  i8-bf16mm", lambda x: mlp_i8(x, True))
    finally:
        fused_int8._dot_i8 = orig_dot

    print("\n--- derived stage costs (ms per 12-layer chain, 4 volumes) ---")
    for part in ("attn", "mlp "):
        dyn = rows[f"{part} i8-dynamic"] - rows[f"{part} i8-static"]
        rc = rows[f"{part} i8-static"] - rows[f"{part} i8-noquant"]
        mm = rows[f"{part} i8-bf16mm"] - rows[f"{part} i8-static"]
        net = rows[f"{part} bf16"] - rows[f"{part} i8-static"]
        print(f"{part}: dynamic-scale reductions {dyn:+6.3f}  "
              f"round+clip {rc:+6.3f}  int8-mm gain kept {mm:+6.3f}  "
              f"net vs bf16 {net:+6.3f}")
    chain_bf16 = rows["attn bf16"] + rows["mlp  bf16"]
    chain_i8 = rows["attn i8-static"] + rows["mlp  i8-static"]
    print(f"\nencoder chain: bf16 {chain_bf16:.2f} ms/4vol "
          f"({chain_bf16/4:.3f} ms/vol) -> int8-static {chain_i8:.2f} "
          f"({chain_i8/4:.3f} ms/vol)")


if __name__ == "__main__":
    main()
