#!/usr/bin/env python
"""MRNet step 1: npy stacks -> NIfTI (port of reference
`scripts/preprocessing/mrnet/step1_npy2nifti.py`). Preserves the
download tree layout under `preprocessed/data`."""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.utils.nifti import write_nifti  # noqa: E402


def npy2nifti(args):
    path_file, path_root_in, path_root_out = args
    data = np.load(path_file)  # [S, H, W]
    out_dir = path_root_out / path_file.parent.relative_to(path_root_in)
    out_dir.mkdir(parents=True, exist_ok=True)
    # torchio ScalarImage(tensor=data[None]) stores [C, X, Y, Z] = [1, S, H, W]
    write_nifti(out_dir / f"{path_file.stem}.nii.gz", data)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True,
                    help="MRNet root containing download/MRNet-v1.0")
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    root = Path(args.path_root)
    path_in = root / "download" / "MRNet-v1.0"
    path_out = root / "preprocessed" / "data"
    path_out.mkdir(parents=True, exist_ok=True)
    files = [(f, path_in, path_out) for f in path_in.rglob("*.npy")]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            list(pool.imap_unordered(npy2nifti, files))
    else:
        for f in files:
            npy2nifti(f)
    print(f"converted {len(files)} volumes -> {path_out}")


if __name__ == "__main__":
    main()
