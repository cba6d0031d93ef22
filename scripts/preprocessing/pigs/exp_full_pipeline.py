#!/usr/bin/env python
"""BPE analysis pipeline with debug plots (condensed port of reference
`scripts/preprocessing/pigs/exp_full_pipeline.py`).

Given pre/post contrast volumes and a fibroglandular-tissue (FGT) mask,
computes relative-enhancement statistics, the volumetric BPE fraction /
volume, an enhanced-area mask, and writes a per-slice debug grid PNG
(pre | post | FGT mask | BPE mask). Shape mismatches between the inputs are
auto-corrected by axis permutation (reference `shape_correction` /
`auto_match_orientation`); inputs failing validation are reported.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bpe_calculations import (  # noqa: E402
    calculate_relative_enhancement,
    calculate_volumetric_bpe,
)
from k_space import auto_match_orientation  # noqa: E402

from mst_tpu.utils.nifti import read_nifti  # noqa: E402


def validate_image_data(pre_img, post_img, mask):
    problems = []
    if pre_img.shape != post_img.shape:
        problems.append(f"pre/post shape mismatch {pre_img.shape} vs {post_img.shape}")
    if mask.shape != pre_img.shape:
        problems.append(f"mask shape mismatch {mask.shape}")
    if not np.isfinite(pre_img).all() or not np.isfinite(post_img).all():
        problems.append("non-finite intensities")
    if (mask > 0).sum() == 0:
        problems.append("empty FGT mask")
    return problems


def plot_bpe_grid(pre, post, fgt_mask, bpe_mask, out_path, max_slices: int = 8):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z_idx = np.linspace(0, pre.shape[-1] - 1, min(max_slices, pre.shape[-1]),
                        dtype=int)
    fig, axes = plt.subplots(len(z_idx), 4, figsize=(12, 3 * len(z_idx)))
    axes = np.atleast_2d(axes)
    for r, z in enumerate(z_idx):
        for c, (vol, title, cmap) in enumerate([
            (pre, "pre", "gray"), (post, "post", "gray"),
            (fgt_mask, "FGT mask", "viridis"), (bpe_mask, "BPE mask", "hot"),
        ]):
            ax = axes[r, c]
            ax.imshow(vol[..., z].T, cmap=cmap)
            ax.set_title(f"{title} z={z}", fontsize=8)
            ax.axis("off")
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def process_bpe_pipeline(pre_path, post_path, fgt_mask_path, out_dir,
                         enhancement_threshold: float = 20.0):
    pre, pre_aff = read_nifti(pre_path)
    post, _ = read_nifti(post_path)
    mask, _ = read_nifti(fgt_mask_path)

    post_m, _ = auto_match_orientation(pre, post)
    mask_m, _ = auto_match_orientation(pre, mask)
    if post_m is None or mask_m is None:
        raise SystemExit("error: could not match input orientations by shape")
    post, mask = post_m, mask_m

    problems = validate_image_data(pre, post, mask)
    if problems:
        raise SystemExit("validation failed: " + "; ".join(problems))

    spacing = np.abs(np.diag(pre_aff)[:3])
    mean_re, median_re, std_re = calculate_relative_enhancement(pre, post, mask)
    volume_cm3, fraction, bpe_mask = calculate_volumetric_bpe(
        pre, post, mask, voxel_spacing=tuple(spacing),
        enhancement_threshold=enhancement_threshold,
    )
    out_dir = Path(out_dir)
    plot_bpe_grid(pre, post, mask, bpe_mask, out_dir / "bpe_grid.png")
    report = {
        "mean_RE_pct": mean_re, "median_RE_pct": median_re,
        "std_RE_pct": std_re, "BPE_volume_cm3": volume_cm3,
        "BPE_fraction": fraction,
        "threshold_pct": enhancement_threshold,
    }
    import json

    (out_dir / "bpe_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", required=True)
    ap.add_argument("--post", required=True)
    ap.add_argument("--fgt_mask", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=20.0)
    args = ap.parse_args(argv)
    process_bpe_pipeline(args.pre, args.post, args.fgt_mask, args.out,
                         args.threshold)


if __name__ == "__main__":
    main()
