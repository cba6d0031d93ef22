#!/usr/bin/env python
"""N4 bias-field correction over a directory of volumes.

Port of reference `scripts/preprocessing/pigs/bias_field_correction.py`,
which wraps SimpleITK's `N4BiasFieldCorrectionImageFilter` (20 iterations
x 4 fitting levels, reference :29-33) and returns error strings on
per-file failure (:68-69). N4 is an ITK algorithm; this port requires
SimpleITK and exits with instructions when it is absent.
"""

from __future__ import annotations

import argparse
from pathlib import Path

try:
    import SimpleITK as sitk
    HAVE_SITK = True
except ImportError:
    HAVE_SITK = False


def n4_correct(path_in: Path, path_out: Path,
               iterations: int = 20, levels: int = 4):
    img = sitk.ReadImage(str(path_in), sitk.sitkFloat32)
    mask = sitk.OtsuThreshold(img, 0, 1, 200)
    corrector = sitk.N4BiasFieldCorrectionImageFilter()
    corrector.SetMaximumNumberOfIterations([iterations] * levels)
    corrected = corrector.Execute(img, mask)
    path_out.parent.mkdir(parents=True, exist_ok=True)
    sitk.WriteImage(corrected, str(path_out))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_in", required=True)
    ap.add_argument("--path_out", required=True)
    args = ap.parse_args(argv)
    if not HAVE_SITK:
        raise SystemExit(
            "N4 bias correction requires SimpleITK (ITK's C++ N4 filter): "
            "pip install SimpleITK"
        )
    path_in, path_out = Path(args.path_in), Path(args.path_out)
    files = sorted(path_in.rglob("*.nii.gz"))
    errors = []
    for f in files:
        try:
            n4_correct(f, path_out / f.relative_to(path_in))
        except Exception as e:  # noqa: BLE001 — collect-and-continue like the reference
            errors.append(f"{f}: {e}")
    print(f"corrected {len(files) - len(errors)}/{len(files)}")
    for e in errors:
        print("ERROR", e)


if __name__ == "__main__":
    main()
