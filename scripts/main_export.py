#!/usr/bin/env python
"""Export a trained run as a self-contained AOT serving artifact.

    python scripts/main_export.py --run_folder runs/LIDC/DinoV2ClassifierSlice_... \
        --out artifacts/lidc_vits [--batch_sizes 1,4,8] [--int8 [--int8_calib N]] \
        [--with_saliency [--plane_mode rollout]] [--use_tta] [--depth 32] [--hw 224]

The artifact holds the jitted predict program (jax.export StableHLO, the
same fused Pallas / int8 kernel program `main_predict.py` runs) serialized
at each batch bucket, plus the weights. A serving host needs only
`mst_tpu.export.load_exported` (or `main_serve.py --exported`) — no model
code, no checkpoint machinery, no tracing.

The reference has no analogue: its deployment unit is the Lightning
checkpoint plus the full model source (`/root/reference/scripts/
main_predict.py:215` re-instantiates the Python model every run).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("main_export")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_folder", required=True)
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--batch_sizes", default="1,4,8",
                    help="comma-separated batch buckets to export")
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--int8", action="store_true",
                    help="export the W8A8 int8 serving program")
    ap.add_argument("--int8_calib", type=int, default=0, metavar="N",
                    help="with --int8: calibrate static activation scales "
                         "on N volumes from the run's val split (needs "
                         "--path_root)")
    ap.add_argument("--path_root", default=None)
    ap.add_argument("--with_saliency", action="store_true",
                    help="export the saliency-emitting program "
                         "(--get_attention serving)")
    ap.add_argument("--plane_mode", default="last",
                    choices=["last", "rollout", "rollout_abnar"])
    ap.add_argument("--use_tta", action="store_true",
                    help="export the 8-flip TTA ensemble program")
    ap.add_argument("--with_mask", action="store_true",
                    help="export programs taking a [B, D] "
                         "src_key_padding_mask (MRNet's variable-depth "
                         "volumes); default traces the mask as None")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (default: "
                         "current backend; e.g. 'tpu' to cross-export "
                         "from a CPU host)")
    ap.add_argument("--compilation_cache", default=None,
                    help="persistent XLA compile cache directory (also "
                         "honours $MST_COMPILATION_CACHE)")
    args = ap.parse_args(argv)

    from mst_tpu.export import enable_compilation_cache, save_exported
    from mst_tpu.serve import load_run_model

    enable_compilation_cache(args.compilation_cache)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params, batch_stats = load_run_model(args.run_folder, dtype=dtype)

    extra_meta = {"run_folder": str(args.run_folder), "int8": bool(args.int8),
                  "int8_static": bool(args.int8 and args.int8_calib),
                  "dtype": args.dtype}
    if args.int8:
        from mst_tpu.models.vit_fast import fused_config_supported
        from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

        if not (fused_config_supported(model) and batch_stats is None):
            raise SystemExit("--int8 needs the fused serving path (Dino "
                             "transformer-fusion config)")
        if args.int8_calib:
            from mst_tpu.serve import calibration_volumes

            try:
                calib = calibration_volumes(args.run_folder, args.path_root,
                                            args.int8_calib)
            except ValueError as e:
                raise SystemExit(f"--int8_calib: {e}")
            params = quantize_mst_params_int8(params, model, calib)
        else:
            params = quantize_mst_params_int8(params)

    platforms = args.platforms.split(",") if args.platforms else None
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    out = save_exported(
        args.out, model, params, batch_sizes=batch_sizes, depth=args.depth,
        hw=args.hw, with_saliency=args.with_saliency,
        plane_mode=args.plane_mode, tta=args.use_tta,
        batch_stats=batch_stats, with_mask=args.with_mask,
        platforms=platforms, extra_meta=extra_meta)
    total = sum(f.stat().st_size for f in out.iterdir())
    log.info("exported %s (buckets %s, %.1f MB) -> %s",
             type(model).__name__, batch_sizes, total / 1e6, out)
    return out


if __name__ == "__main__":
    main()
