#!/usr/bin/env python
"""DUKE step 2a: subtraction image + T1 resampled onto the pre grid.

Port of reference `scripts/preprocessing/duke/step2a_calc_sub.py`:
sub = post_1 - pre as int16, shifted by its min into uint16 (:20-29);
T1 linearly resampled onto the pre-contrast grid (:34-36). SimpleITK's
resample is replaced by an affine-driven scipy resample
(`mst_tpu.utils.resample.resample_to_reference`).
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402
from mst_tpu.utils.resample import resample_to_reference  # noqa: E402


def process(path_patient: Path):
    pre, pre_aff = read_nifti(path_patient / "pre.nii.gz")
    post, _ = read_nifti(path_patient / "post_1.nii.gz")
    # Subtract in int32: uint16 intensities above 32767 would wrap in the
    # reference's int16 cast and corrupt the shift below.
    sub = post.astype(np.int32) - pre.astype(np.int32)
    sub = (sub - sub.min()).astype(np.uint16)  # shift to >=0 for uint16 (:26)
    write_nifti(path_patient / "sub.nii.gz", sub, pre_aff)

    t1_path = path_patient / "T1.nii.gz"
    if t1_path.exists():
        t1, t1_aff = read_nifti(t1_path)
        t1_res = resample_to_reference(
            t1.astype(np.int16), t1_aff, pre.shape, pre_aff, order=1
        )
        write_nifti(path_patient / "T1_resampled.nii.gz",
                    t1_res.astype(np.int16), pre_aff)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    data = Path(args.path_root) / "preprocessed" / "data"
    patients = sorted(p for p in data.iterdir() if p.is_dir())
    if args.workers > 1:
        with Pool(args.workers) as pool:
            list(pool.imap_unordered(process, patients))
    else:
        for p in patients:
            process(p)
    print(f"processed {len(patients)} patients")


if __name__ == "__main__":
    main()
