#!/usr/bin/env python
"""Name the residual of the attention train-path bound (VERDICT r3 #3):
ablate the fused attention kernels (timing-only monkeypatches — the
ablated kernels are numerically invalid) to split the measured chain time
into MXU matmul work vs softmax VPU passes.

Ablations (12-layer chain at N=128 slices = 4 volumes, ViT-S):
  production    the shipped kernels (fwd; train fwd+bwd)
  no-softmax    `p = s` — max/exp2/sum/normalise removed, every matmul
                kept: the remainder IS the matmul+LN bound of the kernel
  linear-recon  bwd reconstructs p as `s - b` instead of `exp2(s - b)` —
                isolates the transcendental cost of the one remaining
                softmax pass in the LSE backward

Context (measured, this file's history): a naive ISOLATED timing of the
per-head matmul shapes is useless — batched [257,64] matmuls from HBM run
at ~6 TFLOP/s (HBM-bound), 5-10x slower than the same matmuls inside the
fused kernels where q/k/v stay VMEM-resident. The kernel ablation is the
only honest decomposition without a profiler.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mst_tpu.ops import fused_block

DEPTH = 12


from mst_tpu.utils.benchtime import timed_min as timeit  # noqa: E402


def main():
    E, H = 384, 6
    N, S = 128, 257
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, S, E), jnp.bfloat16)
    ln_s = jnp.ones((E,), jnp.float32)
    ln_b = jnp.zeros((E,), jnp.float32)
    wqkv = jax.random.normal(key, (E, 3 * E), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * E,), jnp.float32)
    wproj = jax.random.normal(key, (E, E), jnp.bfloat16) * 0.02
    bproj = jnp.zeros((E,), jnp.float32)
    flops = DEPTH * N * (2 * S * E * 3 * E + 2 * S * S * E * 2
                         + 2 * S * E * E)

    def serve_chain(x):
        for _ in range(DEPTH):
            x = fused_block.fused_attention_sublayer(
                x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H)
        return x

    def train_chain(x):
        for _ in range(DEPTH):
            x = fused_block.fused_attention_sublayer_train(
                x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None, H)
        return x

    grad_chain = jax.grad(lambda x: train_chain(x).astype(jnp.float32).sum())

    rows = {}

    def run(tag, fn):
        t = timeit(jax.jit(fn), x)
        rows[tag] = t * 1e3
        print(f"{tag:28s}: {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s "
              "fwd-equiv)", flush=True)

    run("serve  production", serve_chain)
    run("fwd+bwd production", grad_chain)

    # --- ablation: remove the exp2 transcendental, keep every matmul and
    # every reduction (max/sum rows ride the same fused passes either way) ---
    orig_exp2 = jnp.exp2

    def fake_exp2(v):
        return v  # identity: removes the transcendental + keeps shapes

    try:
        jnp.exp2 = fake_exp2
        run("serve  no-exp2", serve_chain)
        run("fwd+bwd no-exp2", grad_chain)
    finally:
        jnp.exp2 = orig_exp2

    print("\n--- decomposition (ms per 12-layer chain, 4 volumes) ---")
    print(f"serve:  exp2 pass {rows['serve  production']-rows['serve  no-exp2']:+.3f}; "
          f"matmul+LN+other-VPU bound {rows['serve  no-exp2']:.3f}")
    print(f"train:  exp2 passes {rows['fwd+bwd production']-rows['fwd+bwd no-exp2']:+.3f}; "
          f"matmul+LN+other-VPU bound {rows['fwd+bwd no-exp2']:.3f}")
    print("\nThe no-exp2 bound is dominated by the 5 per-head matmuls "
          "(3x [S,S]x[S,64] at 50% lane occupancy, 2x [S,64]x[64,S] at "
          "50% MXU contraction depth) — an architecture-shape fact "
          "(hd=64), not kernel overhead.")


if __name__ == "__main__":
    main()
