"""Host-side volume resampling on NIfTI grids (scipy; SimpleITK-free).

The reference's offline ETL resamples with SimpleITK/torchio
(`scripts/preprocessing/duke/step2a_calc_sub.py:34-36`, `step2b:30-40`).
This module provides the same operations from affines alone:

- `resample_to_spacing`: linear resample of [X, Y, Z] data to a target
  physical spacing (torchio `Resample(spacing)`),
- `resample_to_reference`: resample onto another image's grid
  (`sitk.Resample(img, ref, ...)` with identity transform, linear),
- `reorient_to_canonical`: flip axes so the affine diagonal is positive
  (torchio `ToCanonical` for axis-aligned affines).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage


def spacing_from_affine(affine: np.ndarray) -> np.ndarray:
    return np.linalg.norm(np.asarray(affine)[:3, :3], axis=0)


def resample_to_spacing(
    data: np.ndarray, affine: np.ndarray, target_spacing,
    order: int = 1, cval: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """[X, Y, Z] -> resampled data + updated affine."""
    affine = np.asarray(affine, np.float64)
    spacing = spacing_from_affine(affine)
    target = np.asarray(target_spacing, np.float64)
    zoom = spacing / target
    out = ndimage.zoom(np.asarray(data, np.float32), zoom, order=order,
                       mode="constant", cval=cval, grid_mode=False)
    new_affine = affine.copy()
    new_affine[:3, :3] = affine[:3, :3] @ np.diag(target / spacing)
    return out, new_affine


def resample_to_reference(
    data: np.ndarray, affine: np.ndarray,
    ref_shape, ref_affine: np.ndarray,
    order: int = 1, cval: float = 0.0,
) -> np.ndarray:
    """Resample `data` onto the reference grid (identity world transform)."""
    affine = np.asarray(affine, np.float64)
    ref_affine = np.asarray(ref_affine, np.float64)
    # voxel_ref -> world -> voxel_src
    M = np.linalg.inv(affine) @ ref_affine
    return ndimage.affine_transform(
        np.asarray(data, np.float32), M[:3, :3], offset=M[:3, 3],
        output_shape=tuple(int(s) for s in ref_shape),
        order=order, mode="constant", cval=cval,
    )


def reorient_to_canonical(
    data: np.ndarray, affine: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Flip axes with negative direction so the rotation diagonal is
    positive (RAS+ for axis-aligned volumes)."""
    affine = np.asarray(affine, np.float64).copy()
    data = np.asarray(data)
    for ax in range(3):
        col = np.argmax(np.abs(affine[:3, ax]))
        if affine[col, ax] < 0:
            data = np.flip(data, axis=ax)
            affine[:3, 3] = affine[:3, 3] + affine[:3, ax] * (data.shape[ax] - 1)
            affine[:3, ax] = -affine[:3, ax]
    return np.ascontiguousarray(data), affine
