#!/usr/bin/env python
"""Background parenchymal enhancement (BPE) measures.

Port of reference `scripts/preprocessing/pigs/bpe_calculations.py`:
relative (percent) enhancement statistics inside a fibroglandular-tissue
mask, BPE mask at an enhancement threshold, and volumetric BPE
fraction/volume (debug prints dropped).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6


def calculate_bpe_mask(pre_img, post_img, fgt_mask,
                       enhancement_threshold: float = 1.0) -> np.ndarray:
    assert pre_img.shape == post_img.shape == fgt_mask.shape
    enhancement = np.zeros_like(post_img, dtype=np.float32)
    fgt = fgt_mask > 0
    if np.any(fgt):
        pre_fgt = pre_img[fgt]
        post_fgt = post_img[fgt]
        valid = pre_fgt > 1.0  # exclude air/noise voxels
        if np.any(valid):
            re = (post_fgt[valid] - pre_fgt[valid]) / (pre_fgt[valid] + EPS) * 100.0
            coords = np.where(fgt)
            enhancement[tuple(c[valid] for c in coords)] = re
    return ((fgt_mask > 0) & (enhancement > enhancement_threshold)).astype(np.uint16)


def calculate_relative_enhancement(pre_img, post_img, mask):
    """(mean, median, std) percent enhancement inside the mask."""
    pre_vals = pre_img[mask > 0]
    post_vals = post_img[mask > 0]
    re_vals = (post_vals - pre_vals) / (pre_vals + EPS) * 100.0
    return float(np.mean(re_vals)), float(np.median(re_vals)), float(np.std(re_vals))


def calculate_volumetric_bpe(pre_img, post_img, mask, voxel_spacing=(0, 0, 0),
                             enhancement_threshold: float = 20.0):
    """(bpe_volume_cm3, bpe_fraction, bpe_mask)."""
    pre_vals = pre_img[mask > 0]
    post_vals = post_img[mask > 0]
    re_vals = (post_vals - pre_vals) / (pre_vals + EPS) * 100.0
    enhanced = re_vals > enhancement_threshold
    bpe_voxels = int(np.sum(enhanced))

    bpe_mask = np.zeros(post_img.shape, dtype=bool)
    coords = np.where(mask > 0)
    sel = tuple(c[enhanced] for c in coords)
    if len(sel[0]):
        bpe_mask[sel] = True

    total = len(pre_vals)
    fraction = bpe_voxels / total if total else 0.0
    rs, cs, st = voxel_spacing
    volume_cm3 = bpe_voxels * (rs * cs * st) / 1000.0
    return volume_cm3, fraction, bpe_mask
