#!/usr/bin/env python
"""LIDC step 3: malignancy labels + patient-grouped stratified splits.

Port of reference `scripts/preprocessing/lidc/step3_create_split.py`:
mean-round malignancy across raters per nodule (:20), drop indeterminate
==3 (:27), binarize >3 (:28), StratifiedGroupKFold(5) by patient with a
nested second split for train/val (:41-53) -> `splits/split.csv`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedGroupKFold


def create_split(df: pd.DataFrame) -> pd.DataFrame:
    unique_cols = ["patient_id", "study_instance_uid", "series_instance_uid",
                   "scan_id", "nodule_idx"]
    df1 = (df.groupby(unique_cols)["malignancy"]
             .apply(lambda x: int(round(x.mean()))).reset_index())
    df2 = df.drop_duplicates(unique_cols).drop(columns="malignancy")
    df = pd.merge(df1, df2, on=unique_cols).reset_index(drop=True)

    df = df[df["malignancy"] != 3]  # drop indeterminate
    df["Malignant"] = (df["malignancy"] > 3).astype(int)
    df = df.reset_index(drop=True)

    splits = []
    sgkf = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    sgkf2 = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    for fold_i, (train_val_idx, test_idx) in enumerate(
        sgkf.split(df["scan_id"], df["Malignant"], groups=df["patient_id"])
    ):
        df_split = df.copy()
        df_split["Fold"] = fold_i
        df_trainval = df_split.loc[train_val_idx]
        tr, va = list(sgkf2.split(df_trainval["scan_id"], df_trainval["Malignant"],
                                  groups=df_trainval["patient_id"]))[0]
        tr, va = df_trainval.iloc[tr].index, df_trainval.iloc[va].index
        df_split.loc[tr, "Split"] = "train"
        df_split.loc[va, "Split"] = "val"
        df_split.loc[test_idx, "Split"] = "test"
        splits.append(df_split)
    return pd.concat(splits)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True,
                    help="LIDC root containing preprocessed/annotation.csv")
    args = ap.parse_args(argv)
    root = Path(args.path_root) / "preprocessed"
    df = pd.read_csv(root / "annotation.csv")
    print("Number Annotations:", len(df))
    print("Number Patients:", df["patient_id"].nunique())
    out = create_split(df)
    out_dir = root / "splits"
    out_dir.mkdir(parents=True, exist_ok=True)
    out.to_csv(out_dir / "split.csv", index=False)
    print("Malignant:", out[out["Fold"] == 0]["Malignant"].value_counts().to_dict())


if __name__ == "__main__":
    main()
