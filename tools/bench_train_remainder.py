#!/usr/bin/env python
"""Ablate the NON-ENCODER remainder of the bs8 train step (VERDICT r4 #6).

Round 4 established the attention chain is at its matmul bound
(tools/bench_attn_matmuls.py) and estimated the composite bound at
~84 vol/s bs8 vs 82.5 measured. The ~1.5 vol/s residual was ATTRIBUTED to
patch-embed, fusion/head/loss, the AdamW update and dispatch overhead —
asserted, not measured. This tool measures each:

  t_step        full donated train step (fwd + CE + bwd + AdamW)
  t_grad        value_and_grad of the same loss (no optimizer)
  t_enc         encoder-only fwd+bwd: grad of mean(fused_vit_cls(train=True))
  t_tokens      patch-embed+pos-emb fwd+bwd: grad of mean(prepare_vit_tokens)
  t_adamw       the optimizer update alone (tx.update + apply_updates)

Derived:
  fusion+head+loss  = t_grad - t_enc       (same B*D slice batch)
  blocks chain      = t_enc  - t_tokens
  step overhead     = t_step - t_grad - t_adamw   (jit-boundary/donation diff)

Each component is printed next to its HBM/matmul bound where one is
computable (AdamW: 28 B/param of pure HBM traffic — p,m,v read+write f32 +
grad read; v5e ~819 GB/s).

    python tools/bench_train_remainder.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 8, depth: int = 32, hw: int = 224, iters: int = 10):
    import optax

    from mst_tpu.export import enable_compilation_cache
    from mst_tpu.models.mst import dino_v2_classifier_slice
    from mst_tpu.models.vit_fast import (
        FastViTConfig,
        fused_mst_logits,
        fused_vit_cls,
        prepare_vit_tokens,
    )
    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step
    from mst_tpu.utils.benchtime import timed_min

    enable_compilation_cache(str(Path(__file__).parent.parent / ".xla_cache"))
    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_flash=on_tpu)
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, depth, hw, hw), jnp.float32)
    target = jnp.zeros((batch,), jnp.int32)
    params = model.init(key, source[:1])["params"]
    cfg = FastViTConfig.from_model(model)
    dtype = model.dtype

    # the exact slice batch the full step sees
    B, C, D, H, W = source.shape
    x_slices = jnp.repeat(
        jnp.transpose(source, (0, 2, 3, 4, 1)).reshape(B * D, H, W, C),
        3, axis=-1)

    def loss_full(p, src):
        logits = fused_mst_logits(p, src, model, dtype=dtype, train=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, target).mean()

    grad_full = jax.jit(jax.value_and_grad(loss_full))

    def loss_enc(pe, xs):
        return jnp.mean(fused_vit_cls(pe, xs, cfg, dtype, train=True)
                        .astype(jnp.float32))

    grad_enc = jax.jit(jax.grad(loss_enc))

    def loss_tokens(pe, xs):
        h, _, _ = prepare_vit_tokens(pe, xs, cfg, dtype)
        return jnp.mean(h.astype(jnp.float32))

    grad_tokens = jax.jit(jax.grad(loss_tokens))

    tx = make_optimizer(1e-6)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model)

    # a fixed grads tree for the isolated AdamW leg
    _, grads0 = grad_full(params, source)

    @jax.jit
    def adamw_update(g, opt_state, p):
        updates, new_opt = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), new_opt

    # --- timings (min over 2 passes each, forced host sync) ---
    t_grad = timed_min(lambda s: grad_full(params, s)[0], source,
                       iters=iters)
    t_enc = timed_min(
        lambda xs: grad_enc(params["encoder"], xs)["cls_token"], x_slices,
        iters=iters)
    t_tokens = timed_min(
        lambda xs: grad_tokens(params["encoder"],
                               xs)["patch_embed"]["proj"]["bias"],
        x_slices, iters=iters)
    t_adamw = timed_min(
        lambda g: adamw_update(g, state.opt_state, params)[0]["head"]["bias"],
        grads0, iters=iters)

    # full step: donated program, loop like bench.py
    import time

    st = state
    st, loss, _ = step(st, source, target, None)
    jax.block_until_ready(st.params)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            st, loss, _ = step(st, source, target, None)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    t_step = best

    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(params))
    # AdamW pure-HBM bound: grad read (f32) + p,m,v read+write (f32 each)
    adamw_bytes = n_params * 4 * (1 + 2 * 3)
    adamw_bound_ms = adamw_bytes / 819e9 * 1e3  # v5e HBM ~819 GB/s

    ms = {k: round(v * 1e3, 2) for k, v in {
        "step": t_step, "grad": t_grad, "enc": t_enc,
        "tokens": t_tokens, "adamw": t_adamw}.items()}
    derived = {
        "fusion_head_loss_ms": round((t_grad - t_enc) * 1e3, 2),
        "blocks_chain_ms": round((t_enc - t_tokens) * 1e3, 2),
        "step_overhead_ms": round((t_step - t_grad - t_adamw) * 1e3, 2),
        "adamw_hbm_bound_ms": round(adamw_bound_ms, 2),
        "n_params_m": round(n_params / 1e6, 2),
        "volumes_per_sec_bs{}".format(batch): round(batch / t_step, 2),
    }
    print(json.dumps({"measured_ms": ms, "derived": derived,
                      "batch": batch, "depth": depth, "hw": hw,
                      "backend": jax.default_backend()}))
    print(f"\ntrain step bs{batch}: {ms['step']} ms "
          f"({batch / t_step:.1f} vol/s)")
    print(f"  value_and_grad       {ms['grad']} ms")
    print(f"    tokens (patch+pos)   {ms['tokens']} ms")
    print(f"    encoder blocks       {derived['blocks_chain_ms']} ms "
          f"(enc {ms['enc']} - tokens)")
    print(f"    fusion+head+loss     {derived['fusion_head_loss_ms']} ms "
          f"(grad - enc)")
    print(f"  adamw update         {ms['adamw']} ms "
          f"(pure-HBM bound {derived['adamw_hbm_bound_ms']} ms, "
          f"{derived['n_params_m']}M params)")
    print(f"  step overhead        {derived['step_overhead_ms']} ms "
          f"(step - grad - adamw)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()
    sys.exit(main(a.batch, a.depth, a.hw, a.iters))
