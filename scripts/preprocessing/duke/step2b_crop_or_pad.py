#!/usr/bin/env python
"""DUKE step 2b: resample to (0.7, 0.7, 3) mm, crop/pad to (512, 512, 32),
canonical orientation, intensity-based breast-height crop to 256 rows,
left/right split into `{patient}_{side}` dirs.

Port of reference `scripts/preprocessing/duke/step2b_crop_or_pad.py`
(:9-17 `crop_breast_height`, :30-40 transform chain, :42-68 side split).
All images of a patient are processed on the pre-contrast reference grid.
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.data.transforms import crop_or_pad  # noqa: E402
from mst_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402
from mst_tpu.utils.resample import (  # noqa: E402
    reorient_to_canonical,
    resample_to_reference,
    resample_to_spacing,
)

TARGET_SPACING = (0.7, 0.7, 3.0)
TARGET_SHAPE = (512, 512, 32)  # torchio (W, H, D) == our [X, Y, Z] here


def crop_breast_height(data: np.ndarray, margin_top: int = 10):
    """Row window (bottom, top) covering the breast, height 256
    (reference :9-17; rows are the Y axis of the [X, Y, Z] volume)."""
    threshold = np.quantile(data.astype(np.float32), 0.9)
    fg_rows = (data > threshold).sum(axis=(0, 2))
    nz = np.argwhere(fg_rows)
    max_row = int(nz.max()) if nz.size else data.shape[1] - 1
    top = min(max(512 - max_row - margin_top, 0), 256)
    bottom = 256 - top
    return bottom, top


def _crop_or_pad_xyz(data, target_xyz, pad=0.0):
    # our crop_or_pad takes [C, D, H, W]; map [X, Y, Z] -> [1, Z, Y, X]
    cdhw = np.swapaxes(data[None], 1, 3)
    (out,) = crop_or_pad(cdhw, (target_xyz[2], target_xyz[1], target_xyz[0]),
                         pad_value=pad)
    return np.swapaxes(out, 1, 3)[0]


def preprocess(args):
    path_dir, path_in_data, path_out_data = args
    ref, ref_aff = read_nifti(path_dir / "pre.nii.gz")
    ref_rs, ref_rs_aff = resample_to_spacing(ref, ref_aff, TARGET_SPACING)

    def to_grid(data, affine):
        x = resample_to_reference(data, affine, ref_rs.shape, ref_rs_aff)
        x = _crop_or_pad_xyz(x, TARGET_SHAPE)
        x, aff = reorient_to_canonical(x, _padded_affine())
        return x, aff

    def _padded_affine():
        return ref_rs_aff  # translation shift from crop is irrelevant downstream

    ref_proc, ref_proc_aff = to_grid(ref, ref_aff)
    bottom, top = crop_breast_height(ref_proc)

    for path_img in sorted(path_dir.glob("*.nii.gz")):
        if path_img.name == "pre.nii.gz":
            # already resampled above for the height crop — reuse (the
            # resample is the most expensive op in this script)
            out, out_aff = ref_proc.copy(), ref_proc_aff
        else:
            img, aff = read_nifti(path_img)
            out, out_aff = to_grid(img, aff)
        out = out[:, bottom: out.shape[1] - top, :]  # height -> 256
        for side, sl in (("right", slice(256, None)), ("left", slice(0, 256))):
            side_dir = path_out_data / f"{path_dir.name}_{side}"
            side_dir.mkdir(parents=True, exist_ok=True)
            write_nifti(side_dir / path_img.name,
                        np.ascontiguousarray(out[sl]), out_aff)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    root = Path(args.path_root)
    path_in = root / "preprocessed" / "data"
    path_out = root / "preprocessed_crop" / "data"
    path_out.mkdir(parents=True, exist_ok=True)
    patients = [(p, path_in, path_out) for p in sorted(path_in.iterdir())
                if p.is_dir()]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            list(pool.imap_unordered(preprocess, patients))
    else:
        for p in patients:
            preprocess(p)
    print(f"processed {len(patients)} patients -> {path_out}")


if __name__ == "__main__":
    main()
