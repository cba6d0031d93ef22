"""Segmentation metrics: Dice, IoU, average symmetric surface distance.

Replaces the reference's MONAI `compute_dice` / `compute_iou` /
`compute_average_surface_distance` calls
(`scripts/main_predict.py:21,243-256`) with native implementations:
Dice/IoU are trivially jittable; surface distance uses scipy's exact
Euclidean distance transform on host (eval-time only, tiny volumes),
with physical voxel `spacing` taken from the NIfTI affine diagonal as the
reference does (`main_predict.py:252-256`).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def dice_score(pred: np.ndarray, target: np.ndarray) -> float:
    """Binary Dice over the full volume."""
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    inter = np.logical_and(pred, target).sum()
    denom = pred.sum() + target.sum()
    if denom == 0:
        return float("nan")
    return float(2.0 * inter / denom)


def iou_score(pred: np.ndarray, target: np.ndarray) -> float:
    pred = np.asarray(pred).astype(bool)
    target = np.asarray(target).astype(bool)
    union = np.logical_or(pred, target).sum()
    if union == 0:
        return float("nan")
    return float(np.logical_and(pred, target).sum() / union)


def _surface_mask(x: np.ndarray) -> np.ndarray:
    """Boundary voxels of a binary mask (6-connectivity erosion diff)."""
    x = np.asarray(x).astype(bool)
    if not x.any():
        return x
    eroded = ndimage.binary_erosion(
        x, structure=ndimage.generate_binary_structure(x.ndim, 1), border_value=0
    )
    return x & ~eroded


def average_surface_distance(
    pred: np.ndarray,
    target: np.ndarray,
    spacing=None,
    symmetric: bool = True,
) -> float:
    """ASSD in physical units (MONAI-compatible semantics)."""
    pred_s = _surface_mask(pred)
    target_s = _surface_mask(target)
    if not pred_s.any() or not target_s.any():
        return float("nan")
    dt_target = ndimage.distance_transform_edt(~target_s, sampling=spacing)
    d_pt = dt_target[pred_s]
    if not symmetric:
        return float(d_pt.mean())
    dt_pred = ndimage.distance_transform_edt(~pred_s, sampling=spacing)
    d_tp = dt_pred[target_s]
    return float(np.concatenate([d_pt, d_tp]).mean())


def saliency_to_mask(saliency: np.ndarray, quantile: float = 0.999) -> np.ndarray:
    """Threshold a saliency volume at its q-th quantile -> binary mask
    (reference `main_predict.py:243-247`)."""
    thr = np.quantile(np.asarray(saliency, dtype=np.float64), quantile)
    return np.asarray(saliency) > thr
