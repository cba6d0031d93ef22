#!/usr/bin/env python
"""DUKE H5 packing / unpacking.

`unpack` ports the reference `scripts/preprocessing/duke/decompress_h5.py`
(HDF5 -> per-patient NIfTI tree, affines preserved). `pack` is the inverse
the reference repo never shipped but its trainer depends on
(`mst/data/datasets/dataset_3d_duke.py:34,92` reads
`data_compressed.h5[Breast_MRI_*]['sub']` + `sub_affine`): it collects
`preprocessed_crop/data/{patient}_{side}/*.nii.gz` into one compressed H5.

Volumes are stored in the torchio-tensor layout [C, X, Y, Z] so the
training-path reader behaves identically on both repos' artifacts.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402


def unpack(path_h5: Path, out_dir: Path):
    with h5py.File(path_h5, "r") as f:
        for patient_id in f.keys():
            grp = f[patient_id]
            pdir = out_dir / patient_id
            pdir.mkdir(parents=True, exist_ok=True)
            for scan in [k for k in grp.keys() if not k.endswith("_affine")]:
                try:
                    data = grp[scan][()]
                    affine = grp[f"{scan}_affine"][()]
                except KeyError as e:
                    print(f"skipping {patient_id}/{scan}: {e}")
                    continue
                if data.ndim == 4:  # [C, X, Y, Z] -> [X, Y, Z]
                    data = data[0]
                write_nifti(pdir / f"{scan}.nii.gz", data, affine)
    print(f"unpacked -> {out_dir}")


def pack(data_dir: Path, path_h5: Path, prefix: str = "Breast_MRI_"):
    with h5py.File(path_h5, "w") as f:
        n = 0
        for pdir in sorted(p for p in data_dir.iterdir() if p.is_dir()):
            name = pdir.name if pdir.name.startswith(prefix) else prefix + pdir.name
            grp = f.create_group(name)
            for nii in sorted(pdir.glob("*.nii.gz")):
                data, affine = read_nifti(nii)
                scan = nii.name[: -len(".nii.gz")]
                grp.create_dataset(scan, data=data[None].astype(np.float32),
                                   compression="gzip", compression_opts=4)
                grp.create_dataset(f"{scan}_affine", data=affine)
                n += 1
    print(f"packed {n} scans -> {path_h5}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    up = sub.add_parser("unpack")
    up.add_argument("--h5", required=True)
    up.add_argument("--out", required=True)
    pk = sub.add_parser("pack")
    pk.add_argument("--data", required=True)
    pk.add_argument("--h5", required=True)
    args = ap.parse_args(argv)
    if args.cmd == "unpack":
        unpack(Path(args.h5), Path(args.out))
    else:
        pack(Path(args.data), Path(args.h5))


if __name__ == "__main__":
    main()
