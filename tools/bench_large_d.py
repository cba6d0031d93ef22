#!/usr/bin/env python
"""Large-D serving throughput on the real chip — the 1000-slice-CT
sequence-scaling story (SURVEY §5.7) measured, not just compile-proven.

The per-slice encoder cost is linear in D (slices fold into the batch,
reference `dino.py:125`), so slices/sec should stay ~flat as D grows;
the only superlinear term is the (D+1)-token slice-fusion attention,
which is negligible up to thousands of slices. D > 256 additionally
exercises the depth-interpolated slice pos-emb on the fused path.

    python tools/bench_large_d.py            # ViT-S, D = 32..2048

D=1024/2048 (VERDICT r4 #4) stretch the 256-entry slice-pos-emb table
4-8x through the depth interpolation and exercise the fused path at the
slice counts a full-torso CT produces. The saliency column measures the
explainability program (`fused_mst_saliency`) at each D — its HBM
footprint grows linearly with D (the [D, H, W] f32 output volume alone is
D x 224 x 224 x 4 B = 200 MB at D=1024), so the first D where it fails to
fit is the single-chip saliency ceiling; plain logits serve far past it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mst_tpu.models.mst import dino_v2_classifier_slice
from mst_tpu.models.vit_fast import fused_mst_logits
from mst_tpu.utils.benchtime import timed_min


def main():
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small", use_slice_pos_emb=True,
        dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 224, 224))
    params = model.init(jax.random.PRNGKey(1), x0)["params"]
    params = jax.device_put(params)

    from mst_tpu.models.vit_fast import fused_mst_saliency

    fwd = jax.jit(lambda p, s: fused_mst_logits(p, s, model))
    sal = jax.jit(lambda p, s: fused_mst_saliency(p, s, model)[1])
    print(f"{'D':>5} {'ms/volume':>10} {'slices/s':>9} {'saliency_ms':>12}"
          "  (ViT-S/14 @224, bf16 fused serving, B=1)")
    base = None
    for D in (32, 64, 128, 256, 512, 1024, 2048):
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(D), (1, 1, D, 224, 224),
                              jnp.bfloat16))
        t = timed_min(fwd, params, x, iters=max(4, 512 // D))
        sps = D / t
        base = base or sps
        try:
            ts = timed_min(sal, params, x, iters=max(2, 256 // D)) * 1e3
            sal_ms = f"{ts:12.2f}"
        except Exception as e:  # noqa: BLE001 — HBM ceiling: report, go on
            sal_ms = f"  OOM({type(e).__name__})"
        print(f"{D:5d} {t*1e3:10.2f} {sps:9.0f} {sal_ms}  "
              f"({sps/base:4.2f}x the D=32 per-slice rate)")
        del x


if __name__ == "__main__":
    main()
