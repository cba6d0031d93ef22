#!/usr/bin/env python
"""End-to-end TRAINING PIPELINE throughput: host decode -> collate ->
on-device augmentation -> jitted train step, through the real DataModule.

Complements bench.py (pure model throughput) by measuring what a user
actually gets per wall-clock second during training, including the input
pipeline. Uses the synthetic dataset at LIDC shapes so it runs anywhere.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--model_size", default="small")
    args = ap.parse_args(argv)

    from mst_tpu.data.datamodule import DataModule
    from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
    from mst_tpu.models.mst import dino_v2_classifier_slice
    from mst_tpu.parallel.mesh import make_mesh, shard_batch
    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    n = args.batch_size * (args.steps + 2)
    ds = Synthetic_Dataset3D(
        num_samples=min(n, 64),
        shape_cdhw=(1, args.depth, args.hw, args.hw),
        flip=True, noise=True,
    )
    dm = DataModule(ds_train=ds, batch_size=args.batch_size,
                    num_train_samples=n)
    model = dino_v2_classifier_slice(
        out_ch=2, model_size=args.model_size,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_flash=on_tpu,
    )
    mesh = make_mesh()

    batch0 = next(iter(dm.train_dataloader()))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch0["source"][:1]))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(1e-6),
                              dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model)

    # warmup (compile)
    b = shard_batch(batch0, mesh)
    state, loss, _ = step(state, b["source"], jnp.asarray(b["target"]), None)
    float(loss)  # value read: relay-safe sync (BASELINE.md)

    n_steps = 0
    t0 = time.perf_counter()
    for batch in dm.train_dataloader():
        batch = shard_batch(batch, mesh)
        state, loss, _ = step(state, batch["source"],
                              jnp.asarray(batch["target"]), None)
        n_steps += 1
        if n_steps >= args.steps:
            break
    float(loss)  # value read: relay-safe sync (BASELINE.md)
    dt = (time.perf_counter() - t0) / n_steps

    print(json.dumps({
        "metric": "end-to-end training pipeline throughput",
        "value": round(args.batch_size / dt, 2),
        "unit": "volumes/sec (host decode + device augment + train step)",
        "detail": {"step_ms": round(dt * 1e3, 2), "steps": n_steps,
                   "batch": args.batch_size,
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
