#!/usr/bin/env python
"""LIDC step 2: per-annotation masks, 50%-consensus masks, annotation.csv.

Port of reference `scripts/preprocessing/lidc/step2_export_labels.py`:
for each scan, cluster annotations into nodules; write per-rater masks
`seg_{nod}_{rater}.nii.gz` from bbox + boolean_mask (:40-46) and the
50%-agreement consensus mask `seg_{nod}.nii.gz` via
`pylidc.utils.consensus` (:48-53); collect the 9 radiologist attributes
(incl. malignancy) into `annotation.csv` (:12-37).

Requires pylidc (see step1).
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402

try:
    import pylidc as pl
    from pylidc.utils import consensus
    HAVE_DEPS = True
except ImportError:
    HAVE_DEPS = False

LABELS = ["subtlety", "internalStructure", "calcification", "sphericity",
          "margin", "lobulation", "spiculation", "texture", "malignancy"]


def scan2labels(args):
    scan_id, path_root_download, path_root_data = args
    scan = pl.query(pl.Scan).filter(pl.Scan.id == scan_id).first()
    path_rel = Path(scan.get_path_to_dicom_files()).relative_to(path_root_download)
    vol, affine = read_nifti(path_root_data / path_rel / "img.nii.gz")

    scan_ann = []
    for nod_idx, nodules in enumerate(scan.cluster_annotations()):
        for ann_idx, ann in enumerate(nodules):
            ann_dict = {label: getattr(ann, label) for label in LABELS}
            ann_dict.update(
                bbox=[[d.start, d.stop] for d in ann.bbox()],
                scan_id=scan.id, nodule_idx=nod_idx,
                annotation_idx=ann_idx, annotation_num=len(nodules),
                annotation_id=ann.id, patient_id=scan.patient_id,
                study_instance_uid=scan.study_instance_uid,
                series_instance_uid=scan.series_instance_uid,
            )
            scan_ann.append(ann_dict)

            mask_vol = np.zeros(vol.shape, dtype=np.uint8)
            mask_vol[ann.bbox()][ann.boolean_mask()] = 1
            write_nifti(path_root_data / path_rel / f"seg_{nod_idx}_{ann_idx}.nii.gz",
                        mask_vol, affine)

        cmask, cbbox, _ = consensus(nodules, clevel=0.5)
        mask_vol = np.zeros(vol.shape, dtype=np.uint8)
        mask_vol[cbbox][cmask] = 1
        write_nifti(path_root_data / path_rel / f"seg_{nod_idx}.nii.gz",
                    mask_vol, affine)
    return scan_ann


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    if not HAVE_DEPS:
        raise SystemExit("step2 requires pylidc (see step1_nbia_to_nifti.py)")
    root = Path(args.path_root)
    download = root / "download" / "TCIA_LIDC-IDRI_20200921" / "LIDC-IDRI"
    data = root / "preprocessed" / "data"

    n = len(list(pl.query(pl.Scan)))
    jobs = [(i, download, data) for i in range(1, n + 1)]
    all_ann = []
    if args.workers > 1:
        with Pool(args.workers) as pool:
            for ann in pool.imap_unordered(scan2labels, jobs):
                all_ann.extend(ann)
    else:
        for j in jobs:
            all_ann.extend(scan2labels(j))
    pd.DataFrame(all_ann).to_csv(root / "preprocessed" / "annotation.csv",
                                 index=False)


if __name__ == "__main__":
    main()
