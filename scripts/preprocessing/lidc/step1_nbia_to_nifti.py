#!/usr/bin/env python
"""LIDC step 1: TCIA DICOM series -> NIfTI volumes + metadata.csv.

Port of reference `scripts/preprocessing/lidc/step1_nbia_to_nifti.py`:
pylidc assembles each scan into a volume (it fixes LIDC's duplicate-z
slices), the affine is the diagonal of the scan spacings (:42-52), DICOM
headers are flattened into `metadata.csv` (sequences dropped, :20-38),
and workers fan out over scan ids.

Requires `pylidc` + `pydicom` (configured per pylidc.github.io/install):
this image does not bundle them, so the script exits with instructions
when they are absent. The downstream training path consumes only the
OUTPUT artifacts, which this script reproduces byte-compatibly in schema.
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.utils.nifti import write_nifti  # noqa: E402

try:
    import pydicom
    import pylidc as pl
    HAVE_DEPS = True
except ImportError:
    HAVE_DEPS = False


def maybe_convert(x):
    import pydicom.multival
    import pydicom.sequence
    import pydicom.valuerep

    if isinstance(x, pydicom.sequence.Sequence):
        return None
    if isinstance(x, pydicom.dataset.Dataset):
        return None
    if isinstance(x, pydicom.multival.MultiValue):
        return list(x)
    if isinstance(x, pydicom.valuerep.PersonName):
        return str(x)
    return x


def dataset2dict(ds, exclude=("PixelData", "")):
    out = {}
    for key in ds.keys():
        keyword = ds[key].keyword
        if keyword in exclude:
            continue
        value = maybe_convert(ds[key].value)
        if value is not None:
            out[keyword] = value
    return out


def scan2nifti(args):
    scan_id, path_root_in, path_out_data = args
    scan = pl.query(pl.Scan).filter(pl.Scan.id == scan_id).first()
    path_series = Path(scan.get_path_to_dicom_files())

    vol = scan.to_volume()  # [X, Y, Z], duplicate-z fixed by pylidc
    affine = np.diag(list(scan.spacings) + [1.0])

    ds = pydicom.dcmread(next(path_series.glob("*.dcm")), stop_before_pixels=True)
    metadata = dataset2dict(ds)

    rel_path = path_series.relative_to(path_root_in)
    out_dir = path_out_data / rel_path
    out_dir.mkdir(parents=True, exist_ok=True)
    write_nifti(out_dir / "img.nii.gz", vol.astype(np.int16), affine)
    metadata["_SpatialShape"] = list(vol.shape)
    metadata["_Path"] = str(rel_path / "img.nii.gz")
    return metadata


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    if not HAVE_DEPS:
        raise SystemExit(
            "step1 requires pylidc + pydicom (not bundled in this image): "
            "pip install pylidc pydicom, then configure ~/.pylidcrc per "
            "https://pylidc.github.io/install.html"
        )
    root = Path(args.path_root)
    path_in = root / "download" / "TCIA_LIDC-IDRI_20200921" / "LIDC-IDRI"
    out = root / "preprocessed"
    out_data = out / "data"
    out_data.mkdir(parents=True, exist_ok=True)

    n = len(list(pl.query(pl.Scan)))
    jobs = [(i, path_in, out_data) for i in range(1, n + 1)]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            metadata_list = list(pool.imap_unordered(scan2nifti, jobs))
    else:
        metadata_list = [scan2nifti(j) for j in jobs]

    exports = list(out.rglob("img.nii.gz"))
    patients = {p.relative_to(out).parts[1] for p in exports}
    print(f"Exported Patients: {len(patients)} of 1010")
    print(f"Exported Studies: {len(exports)} of 1018 (pylidc)")
    pd.DataFrame(metadata_list).to_csv(out / "metadata.csv", index=False)


if __name__ == "__main__":
    main()
