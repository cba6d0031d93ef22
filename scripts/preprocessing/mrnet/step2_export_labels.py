#!/usr/bin/env python
"""MRNet step 2: merge per-pathology label CSVs (port of reference
`scripts/preprocessing/mrnet/step2_export_labels.py`)."""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

PATHOLOGIES = ["abnormal", "acl", "meniscus"]


def merge_labels(path_in: Path, prefix: str) -> pd.DataFrame:
    df_all = pd.DataFrame()
    for pathology in PATHOLOGIES:
        df = pd.read_csv(path_in / f"{prefix}-{pathology}.csv",
                         names=["ID", pathology])
        df_all = pd.merge(df_all, df, on="ID") if len(df_all) else df
    return df_all


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    args = ap.parse_args(argv)
    root = Path(args.path_root)
    path_in = root / "download" / "MRNet-v1.0"
    path_out = root / "preprocessed"
    path_out.mkdir(parents=True, exist_ok=True)
    merge_labels(path_in, "train").to_csv(path_out / "train.csv", index=False)
    merge_labels(path_in, "valid").to_csv(path_out / "valid.csv", index=False)


if __name__ == "__main__":
    main()
