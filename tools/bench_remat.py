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

The won't-fit arms are LOWERED AND COMPILED but not executed — XLA:TPU
itself rejects >HBM programs at compile time ("Ran out of memory in
memory space hbm"), which is the proof, recorded without risking a device
OOM through the tunnel. `--giant2 --batch 2` switches to the 1.1B
UNFROZEN arms: remat+AdamW (the f32 moment trees alone blow HBM) vs
remat+Adafactor (factored second moments, `--optimizer adafactor`), which
runs.

    python tools/bench_remat.py [--batch N] [--giant2]  ->  JSON lines
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
    """-> (memory dict, compiled executable | None). The executable is
    reused for the timed run — a plain step() call would recompile from
    scratch (jit dispatch does not consult AOT lower().compile() results),
    minutes through the tunnel."""
    import re

    lowered = step.jitted.lower(state, source, target, None,
                                step.int8_encoder)
    try:
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
    except Exception as e:  # XLA:TPU refuses to even compile >HBM programs
        m = re.search(r"Used ([\d.]+[GMK]) of ([\d.]+[GMK]) hbm", str(e))
        if m:  # e.g. "Ran out of memory ... Used 32.00G of 15.75G hbm"
            return {"compile_oom": True, "needs": m.group(1),
                    "hbm": m.group(2)}, None
        raise
    if mem is None:
        return None, compiled
    return {
        "temp_gb": round(mem.temp_size_in_bytes / 1024**3, 2),
        "args_gb": round(mem.argument_size_in_bytes / 1024**3, 2),
        "total_gb": round((mem.temp_size_in_bytes
                           + mem.argument_size_in_bytes
                           + mem.output_size_in_bytes
                           - mem.alias_size_in_bytes) / 1024**3, 2),
    }, compiled


def main(batch: int = 8, iters: int = 4, giant2: bool = False):
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, 32, 224, 224), jnp.float32)
    target = jnp.zeros((batch,), jnp.int32)

    if giant2:
        # 1.1B params UNFROZEN: both arms use --remat; the variable is the
        # optimizer — AdamW's two full f32 moment trees (8.8 GB) + f32
        # params + f32 grads cannot fit 16 GB even with remat'd
        # activations; Adafactor's factored statistics can.
        arms = [("adamw", True), ("adafactor", True)]
        size, heads = "giant2", 24  # E=1536
    else:
        arms = [("adamw", False), ("adamw", True)]
        size, heads = "large", 16  # E=1024

    rows = []
    for opt, remat in arms:
        model = DinoSliceClassifier(out_ch=2, model_size=size,
                                    fusion_heads=heads,
                                    remat=remat, dtype=jnp.bfloat16)
        params = model.init(key, source[:1, :, :1, :28, :28])["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=make_optimizer(1e-6, optimizer=opt),
            dropout_rng=jax.random.PRNGKey(1))
        step = make_train_step(model)
        t_c = time.perf_counter()
        mem, compiled = analyse(step, state, source, target)
        print(f"# {size} opt={opt} remat={remat}: compile+analysis "
              f"{time.perf_counter() - t_c:.1f}s  {mem}",
              file=sys.stderr, flush=True)
        fits = mem is None or (not mem.get("compile_oom")
                               and mem["total_gb"] * 1024**3
                               < HBM_BYTES * 0.97)
        row = {"metric": f"{size} UNFROZEN train (fused kernels, {opt}"
                         + (", per-block remat)" if remat else ")"),
               "batch": batch, "memory": mem,
               "fits_16gb_hbm": bool(fits),
               "backend": jax.default_backend()}
        execute = (opt, remat) == arms[-1]
        if execute:
            if not fits:
                print("# final arm does not fit — not executing",
                      file=sys.stderr, flush=True)
            else:
                t_e = time.perf_counter()
                state, loss, _ = compiled(state, source, target, None,
                                          step.int8_encoder)
                float(loss)
                print(f"# first executed step: "
                      f"{time.perf_counter() - t_e:.1f}s",
                      file=sys.stderr, flush=True)
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, loss, _ = compiled(state, source, target, None,
                                              step.int8_encoder)
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
    ap.add_argument("--giant2", action="store_true",
                    help="1.1B UNFROZEN arms: remat+AdamW (proves the "
                         "moment-tree OOM) vs remat+Adafactor (runs); "
                         "use --batch 2")
    a = ap.parse_args()
    main(batch=a.batch, giant2=a.giant2)
