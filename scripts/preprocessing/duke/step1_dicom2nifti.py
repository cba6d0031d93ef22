#!/usr/bin/env python
"""DUKE step 1: DICOM series -> NIfTI per sequence, driven by the TCIA
path-mapping spreadsheet.

Port of reference `scripts/preprocessing/duke/step1_dicom2nifti.py`:
reads the Breast-Cancer-MRI filepath mapping, loads each series with a
GDCM series reader, writes `{pre, post_1..n, T1}.nii.gz` per patient, and
collects flattened DICOM headers into `metadata.csv`; per-series failures
are logged and skipped (:83-85).

Requires SimpleITK + pydicom (+ openpyxl for the xlsx mapping), which this
image does not bundle — the script exits with install instructions when
they are missing. Downstream steps (2a/2b/3/h5) consume only its outputs.
"""

from __future__ import annotations

import argparse
import logging
from multiprocessing import Pool
from pathlib import Path

import pandas as pd

logger = logging.getLogger(__name__)

try:
    import pydicom
    import SimpleITK as sitk
    HAVE_DEPS = True
except ImportError:
    HAVE_DEPS = False

SEQ_RENAME = {"dyn pre": "pre", "t1": "T1"}


def series2nifti(args):
    seq_name, path_series, path_root_in, path_out_data = args
    path_series = path_root_in / Path(path_series)
    if not path_series.is_dir():
        logger.warning("expected directory: %s", path_series)
        return None
    try:
        reader = sitk.ImageSeriesReader()
        reader.SetFileNames(reader.GetGDCMSeriesFileNames(str(path_series)))
        img = reader.Execute()
        patient_id = path_series.parts[-3] if len(path_series.parts) >= 3 else path_series.name
        out_dir = path_out_data / patient_id
        out_dir.mkdir(parents=True, exist_ok=True)
        sitk.WriteImage(img, str(out_dir / f"{seq_name}.nii.gz"))
        ds = pydicom.dcmread(next(path_series.glob("*.dcm")),
                             stop_before_pixels=True)
        return {"PatientID": patient_id, "Sequence": seq_name,
                "SeriesDescription": getattr(ds, "SeriesDescription", "")}
    except Exception as e:  # noqa: BLE001 — skip-and-continue like the reference
        logger.warning("failed %s: %s", path_series, e)
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--mapping", default=None,
                    help="filepath mapping table (xlsx or csv)")
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    if not HAVE_DEPS:
        raise SystemExit(
            "step1 requires SimpleITK + pydicom (not bundled in this image): "
            "pip install SimpleITK pydicom openpyxl"
        )
    root = Path(args.path_root)
    path_in = root / "download"
    out_data = root / "preprocessed" / "data"
    out_data.mkdir(parents=True, exist_ok=True)

    mapping = Path(args.mapping) if args.mapping else (
        path_in / "Breast-Cancer-MRI-filepath_filename-mapping.xlsx"
    )
    df = (pd.read_csv(mapping) if mapping.suffix == ".csv"
          else pd.read_excel(mapping))
    seq_col = [c for c in df.columns if "descrip" in c.lower()][0]
    path_col = [c for c in df.columns if "path" in c.lower()][0]

    jobs = []
    for _, row in df.iterrows():
        seq = str(row[seq_col]).strip().lower()
        seq = SEQ_RENAME.get(seq, seq.replace(" ", "_"))
        jobs.append((seq, str(row[path_col]), path_in, out_data))

    if args.workers > 1:
        with Pool(args.workers) as pool:
            metas = [m for m in pool.imap_unordered(series2nifti, jobs) if m]
    else:
        metas = [m for m in map(series2nifti, jobs) if m]
    pd.DataFrame(metas).to_csv(root / "preprocessed" / "metadata.csv",
                               index=False)
    print(f"converted {len(metas)} series")


if __name__ == "__main__":
    main()
