#!/usr/bin/env python
"""N4 bias-field correction over a directory of volumes.

Port of reference `scripts/preprocessing/pigs/bias_field_correction.py`,
which wraps SimpleITK's `N4BiasFieldCorrectionImageFilter` (20 iterations
x 4 fitting levels, reference :29-33) and returns error strings on
per-file failure (:68-69).

This build carries a NATIVE N4 implementation
(`mst_tpu/utils/bias_field.py` — log-domain histogram sharpening +
multi-resolution smooth-field fit, no ITK) used by default;
`--use_sitk` selects the original ITK filter when SimpleITK is present.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

try:
    import SimpleITK as sitk
    HAVE_SITK = True
except ImportError:
    HAVE_SITK = False


def n4_correct_sitk(path_in: Path, path_out: Path,
                    iterations: int = 20, levels: int = 4):
    img = sitk.ReadImage(str(path_in), sitk.sitkFloat32)
    mask = sitk.OtsuThreshold(img, 0, 1, 200)
    corrector = sitk.N4BiasFieldCorrectionImageFilter()
    corrector.SetMaximumNumberOfIterations([iterations] * levels)
    corrected = corrector.Execute(img, mask)
    path_out.parent.mkdir(parents=True, exist_ok=True)
    sitk.WriteImage(corrected, str(path_out))


def n4_correct_native(path_in: Path, path_out: Path,
                      iterations: int = 20, levels: int = 4):
    from mst_tpu.utils.bias_field import n4_bias_correct
    from mst_tpu.utils.nifti import read_nifti, write_nifti

    data, affine = read_nifti(path_in)
    if data.ndim == 4:
        data = data[..., 0]
    corrected, _ = n4_bias_correct(data, iterations=iterations, levels=levels)
    path_out.parent.mkdir(parents=True, exist_ok=True)
    write_nifti(path_out, corrected, affine)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_in", required=True)
    ap.add_argument("--path_out", required=True)
    ap.add_argument("--use_sitk", action="store_true",
                    help="use ITK's N4 filter instead of the native one")
    args = ap.parse_args(argv)
    if args.use_sitk and not HAVE_SITK:
        raise SystemExit("--use_sitk requires SimpleITK: pip install SimpleITK")
    correct = n4_correct_sitk if args.use_sitk else n4_correct_native
    path_in, path_out = Path(args.path_in), Path(args.path_out)
    files = sorted(path_in.rglob("*.nii.gz"))
    errors = []
    for f in files:
        try:
            correct(f, path_out / f.relative_to(path_in))
        except Exception as e:  # noqa: BLE001 — collect-and-continue like the reference
            errors.append(f"{f}: {e}")
    print(f"corrected {len(files) - len(errors)}/{len(files)}")
    for e in errors:
        print("ERROR", e)


if __name__ == "__main__":
    main()
