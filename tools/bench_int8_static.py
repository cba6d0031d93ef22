#!/usr/bin/env python
"""A/B: dynamic per-token vs calibrated static activation scales for the
int8 (W8A8) serving path, at the flagship ViT-S/14 LIDC shape.

The dynamic path's per-token abs-max is a cross-lane VPU reduction per
matmul input (2 in the attn kernel + 2 in the FFN kernel per block);
static scales fold into LN/dequant so quantization becomes
round+saturate only (`ops/fused_int8.py` module docstring). Prints
throughput for bf16 / int8-dynamic / int8-static plus logits agreement.

    python tools/bench_int8_static.py [--model_size small] [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_size", default="small")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rope", action="store_true",
                    help="DINOv3-style config (2D rope, no pos-embed)")
    args = ap.parse_args()

    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits
    from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

    kw = {}
    if args.rope:
        kw = dict(use_rope_2d=True, use_pos_embed=False,
                  rope_normalized=True, num_register_tokens=4,
                  norm_eps=1e-5, patch_size=14)
    model = DinoSliceClassifier(out_ch=2, model_size=args.model_size,
                                fusion_heads=4, **kw)
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (args.batch, 1, args.depth, args.hw,
                                  args.hw), jnp.float32)
    init_src = jax.random.normal(key, (1, 1, 4, args.hw, args.hw),
                                 jnp.float32)
    params = model.init(jax.random.PRNGKey(1), init_src)["params"]

    calib = src[:2]  # calibrate on 2 volumes of the same distribution
    variants = {
        "bf16": params,
        "int8_dynamic": quantize_mst_params_int8(params),
        "int8_static": quantize_mst_params_int8(params, model, calib),
    }

    outs, rates = {}, {}
    # params as an ARGUMENT: a closed-over (or default-arg) tree bakes
    # ~190 MB of constants into the program — slow compile, cache-hostile
    fwd = jax.jit(lambda p, s: fused_mst_logits(p, s, model))
    for name, prm in variants.items():
        # forced device->host VALUE reads: block_until_ready has been
        # observed returning early through the axon relay (BASELINE.md)
        out = fwd(prm, src)
        for _ in range(3):
            float(jnp.sum(fwd(prm, src)).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(prm, src)
        float(jnp.sum(out).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters
        outs[name] = np.asarray(out, np.float32)
        rates[name] = args.batch / dt
        print(f"{name:14s} {rates[name]:8.1f} vol/s  "
              f"({dt * 1e3:.2f} ms/batch)", flush=True)

    ref = outs["bf16"]
    for name in ("int8_dynamic", "int8_static"):
        agree = float(np.mean(outs[name].argmax(-1) == ref.argmax(-1)))
        drift = float(np.abs(outs[name] - ref).max())
        print(f"{name:14s} argmax agreement {agree:.3f}  "
              f"max|dlogit| {drift:.4f}")
    print(f"static vs dynamic speedup: "
          f"{rates['int8_static'] / rates['int8_dynamic']:.3f}x")


if __name__ == "__main__":
    main()
