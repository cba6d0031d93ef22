#!/usr/bin/env python
"""DICOM series -> npy stacks (port of reference
`scripts/preprocessing/pigs/dicom2npy.py`, a SimpleITK series reader
fan-out). Requires SimpleITK; exits with instructions when absent."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

try:
    import SimpleITK as sitk
    HAVE_SITK = True
except ImportError:
    HAVE_SITK = False


def series_dirs(root: Path):
    """Directories that directly contain .dcm files."""
    for d in sorted({p.parent for p in root.rglob("*.dcm")}):
        yield d


def dicom_dir_to_npy(path_series: Path, path_out: Path):
    reader = sitk.ImageSeriesReader()
    reader.SetFileNames(reader.GetGDCMSeriesFileNames(str(path_series)))
    img = reader.Execute()
    arr = sitk.GetArrayFromImage(img)  # [Z, Y, X]
    path_out.parent.mkdir(parents=True, exist_ok=True)
    np.save(path_out, arr)
    return arr.shape


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_in", required=True)
    ap.add_argument("--path_out", required=True)
    args = ap.parse_args(argv)
    if not HAVE_SITK:
        raise SystemExit("dicom2npy requires SimpleITK: pip install SimpleITK")
    root_in, root_out = Path(args.path_in), Path(args.path_out)
    n = 0
    for d in series_dirs(root_in):
        rel = d.relative_to(root_in)
        shape = dicom_dir_to_npy(d, root_out / rel.with_suffix(".npy"))
        print(rel, shape)
        n += 1
    print(f"converted {n} series")


if __name__ == "__main__":
    main()
