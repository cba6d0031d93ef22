#!/usr/bin/env python
"""UNFROZEN large-model training on ONE chip via --remat.

The residual-sharing fused train kernels store ~8E bytes of residuals per
token per block (qkv + pre-proj o for attention, the pre-activation hidden
for the FFN). At ViT-L LIDC shapes that is ~3.2 GB per volume-in-batch —
batch 8 wants ~26 GB of activations and cannot fit a 16 GB v5e alongside
the AdamW state (params f32 1.2 GB + moments 2.4 GB + grads 1.2 GB).
Per-block rematerialisation (`--remat`, jax.checkpoint around
`vit_fast._fused_train_block`) stores only the E-wide block inputs
(~0.4 GB/volume) and recomputes the interiors during the backward
(~+fwd/3 FLOPs) — full ViT-L fine-tuning fits, which the reference cannot
express at all (its Lightning loop has no activation-checkpoint knob;
`mst/models/dino.py` trains ViT-L/giant only frozen in practice).

For the non-remat arm the step is LOWERED AND COMPILED but not executed —
XLA's memory analysis proves the >HBM temp allocation without risking a
device OOM through the tunnel.

    python tools/bench_remat.py [--batch N]  ->  JSON lines
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

HBM_BYTES = 16 * 1024**3  # v5e


def analyse(step, state, source, target):
    lowered = step.jitted.lower(state, source, target, None,
                                step.int8_encoder)
    mem = lowered.compile().memory_analysis()
    if mem is None:
        return None
    return {
        "temp_gb": round(mem.temp_size_in_bytes / 1024**3, 2),
        "args_gb": round(mem.argument_size_in_bytes / 1024**3, 2),
        "total_gb": round((mem.temp_size_in_bytes
                           + mem.argument_size_in_bytes
                           + mem.output_size_in_bytes
                           - mem.alias_size_in_bytes) / 1024**3, 2),
    }


def main(batch: int = 8, iters: int = 4):
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, 32, 224, 224), jnp.float32)
    target = jnp.zeros((batch,), jnp.int32)

    rows = []
    for remat in (False, True):
        model = DinoSliceClassifier(out_ch=2, model_size="large",
                                    fusion_heads=16,  # E=1024
                                    remat=remat, dtype=jnp.bfloat16)
        params = model.init(key, source[:1, :, :1, :28, :28])["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(1))
        step = make_train_step(model)
        t_c = time.perf_counter()
        mem = analyse(step, state, source, target)
        print(f"# remat={remat}: compile+analysis "
              f"{time.perf_counter() - t_c:.1f}s  {mem}",
              file=sys.stderr, flush=True)
        fits = mem is None or mem["total_gb"] * 1024**3 < HBM_BYTES * 0.97
        row = {"metric": "ViT-L UNFROZEN train (fused kernels"
                         + (", per-block remat)" if remat else ")"),
               "batch": batch, "memory": mem,
               "fits_16gb_hbm": bool(fits),
               "backend": jax.default_backend()}
        if remat:
            if not fits:
                print("# remat arm does not fit — not executing",
                      file=sys.stderr, flush=True)
            else:
                state, loss, _ = step(state, source, target, None)
                float(loss)
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, loss, _ = step(state, source, target, None)
                float(loss)  # forced host sync
                dt = (time.perf_counter() - t0) / iters
                row["value"] = round(batch / dt, 2)
                row["unit"] = "volumes/sec/chip"
                row["step_ms"] = round(dt * 1e3, 1)
        del state, params
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()
    main(batch=a.batch)
