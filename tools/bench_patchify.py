#!/usr/bin/env python
"""Patchify formulation shootout (the 5.06 ms tokens leg of the train-step
ablation, ~15x its matmul bound — ROADMAP "Train-step remainder").

Three ways to compute patch-embed tokens [N,gh*gw,E] from x [N,H,W,C]:

  transpose   reshape -> transpose(0,1,3,2,4,5) -> reshape -> matmul
              (current prepare_vit_tokens; materialises the im2col buffer,
              and its BACKWARD materialises the scatter-transpose again)
  dotgen      dot_general contracting (p,p,C) dims directly against the
              [p,p,C,E] kernel — no explicit transpose for XLA to
              materialise; layout folds into the matmul
  conv        lax.conv_general_dilated stride=p VALID — TPU recognises
              kernel-size==stride convs as space-to-depth matmuls

Measures fwd and fwd+bwd(dW only, like training: inputs are leaf data)
at the train-step shape (bs8 x 32 slices = 256 frames of 224^2 x 3).

Usage: python tools/bench_patchify.py [--n 256] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.export import enable_compilation_cache

P, C, E = 14, 3, 384
H = W = 224


def patch_transpose(x, w):
    N = x.shape[0]
    gh, gw = H // P, W // P
    xb = x.astype(jnp.bfloat16)
    xb = xb.reshape(N, gh, P, gw, P, C)
    xb = jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(N, gh * gw, P * P * C)
    return xb @ w.reshape(P * P * C, E).astype(jnp.bfloat16)


def patch_dotgen(x, w):
    N = x.shape[0]
    gh, gw = H // P, W // P
    xb = x.astype(jnp.bfloat16).reshape(N, gh, P, gw, P, C)
    # contract (p_h, p_w, C) against kernel [p_h, p_w, C, E]; batch none.
    out = jax.lax.dot_general(
        xb, w.astype(jnp.bfloat16),
        dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )  # [N, gh, gw, E]
    return out.reshape(N, gh * gw, E)


def patch_rowsum(x, w):
    # tokens[n,i,j,e] = sum_a  x[n, i, a, j, :, :].reshape(42) @ w[a]
    # For fixed patch-row a, the [N, gh, gw, p*C] slice is CONTIGUOUS
    # 42-element runs (stride p*W*C between gh rows) — no transpose at
    # all, fwd or bwd; 14 matmuls with K=42 (MXU pads K, ~3x pad waste,
    # still far under the shuffle cost).
    N = x.shape[0]
    gh, gw = H // P, W // P
    x5 = x.astype(jnp.bfloat16).reshape(N, gh, P, gw * P * C)
    wb = w.astype(jnp.bfloat16).reshape(P, P * C, E)
    out = jnp.zeros((N, gh, gw, E), jnp.float32)
    for a in range(P):
        xa = x5[:, :, a, :].reshape(N, gh, gw, P * C)
        out = out + jax.lax.dot_general(
            xa, wb[a], dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16).reshape(N, gh * gw, E)


def patch_conv(x, w):
    N = x.shape[0]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )  # [N, gh, gw, E]
    return out.reshape(N, (H // P) * (W // P), E)


def _time(fn, *args, iters=30):
    r = fn(*args)  # warm-up: first call pays the compile
    jax.block_until_ready(r)
    # force a value read: block_until_ready returns early through the relay
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    enable_compilation_cache(
        os.environ.get("MST_COMPILATION_CACHE",
                       str(Path(__file__).resolve().parent.parent
                           / ".xla_cache")))

    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (args.n, H, W, C), jnp.float32))
    w4 = jax.device_put(
        jax.random.normal(key, (P, P, C, E), jnp.float32) * 0.02)

    variants = {
        "transpose": patch_transpose,
        "dotgen": patch_dotgen,
        "rowsum": patch_rowsum,
        "conv": patch_conv,
    }

    # parity first — compared ON DEVICE (a 25 MB result fetch over the
    # relay hangs for minutes on a loaded host; only scalars cross)
    for name, fn in variants.items():
        err = float(jax.jit(
            lambda x, w, fn=fn: (
                jnp.abs(fn(x, w).astype(jnp.float32)
                        - patch_transpose(x, w).astype(jnp.float32)).max()
                / jnp.maximum(
                    jnp.abs(patch_transpose(x, w).astype(jnp.float32)).max(),
                    1e-6))
        )(x, w4))
        print(f"parity {name:9s} rel={err:.2e}", flush=True)

    n_tok = args.n * (H // P) * (W // P)
    flop_fwd = 2 * n_tok * P * P * C * E
    for name, fn in variants.items():

        def loss(w, x=x, fn=fn):
            return jnp.sum(fn(x, w).astype(jnp.float32))

        # scalar outputs: a [N, 256, 384] result would add a 25 MB relay
        # transfer per read and swamp the device time
        jf = jax.jit(loss)
        t_f = _time(jf, w4, iters=args.iters)
        jg = jax.jit(jax.grad(loss))
        t_fb = _time(jg, w4, iters=args.iters)
        print(f"{name:9s} fwd {t_f:7.3f} ms ({flop_fwd/t_f/1e9:6.1f} GFLOP/ms)"
              f"   fwd+dW {t_fb:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
