#!/usr/bin/env python
"""LIDC step 4: per-nodule mask-centred crops of image + all masks.

Port of reference `scripts/preprocessing/lidc/step4_crop_or_pad.py`:
for each series, every `seg_{n}.nii.gz` defines a nodule; crop image +
consensus mask + per-rater masks to (256, 256, 32) centred on the
consensus mask with padding value -1024 (:19-32), writing
`img_{n}.nii.gz` / `seg_{n}*.nii.gz` under `preprocessed_crop/data`.
"""

from __future__ import annotations

import argparse
import re
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
from mst_tpu.data.transforms import crop_or_pad  # noqa: E402
from mst_tpu.utils.nifti import read_nifti, write_nifti  # noqa: E402

TARGET_DHW = (32, 256, 256)  # torchio (256, 256, 32) in our [D, H, W] order


def _to_cdhw(x):
    return np.swapaxes(np.asarray(x)[None], 1, 3)


def _from_cdhw(x):
    return np.swapaxes(x, 1, 3)[0]


def preprocess(args):
    path_file, path_in, path_out = args
    path_dir = path_file.parent
    img, affine = read_nifti(path_file)
    out_dir = path_out / path_dir.relative_to(path_in)
    out_dir.mkdir(parents=True, exist_ok=True)

    for path_seg in sorted(path_dir.glob("seg_*.nii.gz")):
        m = re.fullmatch(r"seg_(\d+)", path_seg.name.split(".")[0])
        if not m:  # rater masks seg_{n}_{r} handled alongside their nodule
            continue
        nod_idx = int(m.group(1))
        seg, _ = read_nifti(path_seg)
        rater_paths = sorted(path_dir.glob(f"seg_{nod_idx}_*.nii.gz"))
        raters = [_to_cdhw(read_nifti(p)[0] > 0).astype(np.uint8)
                  for p in rater_paths]

        vol = _to_cdhw(img).astype(np.float32)
        mask = _to_cdhw(seg > 0).astype(np.uint8)
        out = crop_or_pad(vol, TARGET_DHW, mask=mask, pad_value=-1024,
                          extra=raters)
        write_nifti(out_dir / f"img_{nod_idx}.nii.gz",
                    _from_cdhw(out[0]).astype(np.int16), affine)
        write_nifti(out_dir / f"seg_{nod_idx}.nii.gz",
                    _from_cdhw(out[1]).astype(np.uint8), affine)
        for p, cropped in zip(rater_paths, out[2:]):
            write_nifti(out_dir / p.name,
                        _from_cdhw(cropped).astype(np.uint8), affine)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--workers", type=int, default=1)
    args = ap.parse_args(argv)
    root = Path(args.path_root)
    path_in = root / "preprocessed" / "data"
    path_out = root / "preprocessed_crop" / "data"
    path_out.mkdir(parents=True, exist_ok=True)
    files = [(f, path_in, path_out) for f in sorted(path_in.rglob("img.nii.gz"))]
    if args.workers > 1:
        with Pool(args.workers) as pool:
            list(pool.imap_unordered(preprocess, files))
    else:
        for f in files:
            preprocess(f)
    print(f"cropped {len(files)} series -> {path_out}")


if __name__ == "__main__":
    main()
