#!/usr/bin/env python
"""DUKE step 3: per-side malignancy labels + patient-grouped splits.

Port of reference `scripts/preprocessing/duke/step3_create_split.py`:
from the clinical features table, the tumor side column (index 36) and
bilateral flag (index 38, 'NC' rows dropped) define per-side `Malignant`
(:11-21: malignant if tumor side matches or bilateral); then
StratifiedGroupKFold(5) by patient with nested train/val split (:24-37)
-> `splits/split.csv` with `UID = {patient}_{side}`.

The clinical table may be the original xlsx (needs openpyxl) or a CSV
export with columns `PatientID, Location, Bilateral`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd
from sklearn.model_selection import StratifiedGroupKFold


def build_labels(df: pd.DataFrame) -> pd.DataFrame:
    dfs = []
    for side in ["left", "right"]:
        dfs.append(pd.DataFrame({
            "PatientID": df["PatientID"].str.split("_").str[2],
            "UID": df["PatientID"].str.split("_").str[2] + f"_{side}",
            "Malignant": df[["Location", "Bilateral"]].apply(
                lambda ds: int((ds.iloc[0] == side[0].upper()) | (ds.iloc[1] == 1)),
                axis=1,
            ),
        }))
    return pd.concat(dfs, ignore_index=True).reset_index(drop=True)


def create_split(df: pd.DataFrame) -> pd.DataFrame:
    splits = []
    sgkf = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    sgkf2 = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    for fold_i, (train_val_idx, test_idx) in enumerate(
        sgkf.split(df["UID"], df["Malignant"], groups=df["PatientID"])
    ):
        df_split = df.copy()
        df_split["Fold"] = fold_i
        df_trainval = df_split.loc[train_val_idx]
        tr, va = list(sgkf2.split(df_trainval["UID"], df_trainval["Malignant"],
                                  groups=df_trainval["PatientID"]))[0]
        df_split.loc[df_trainval.iloc[tr].index, "Split"] = "train"
        df_split.loc[df_trainval.iloc[va].index, "Split"] = "val"
        df_split.loc[test_idx, "Split"] = "test"
        splits.append(df_split)
    return pd.concat(splits)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--clinical", default=None,
                    help="clinical table (xlsx original or CSV with "
                         "PatientID/Location/Bilateral columns)")
    args = ap.parse_args(argv)
    root = Path(args.path_root)
    clinical = Path(args.clinical) if args.clinical else (
        root / "download" / "Clinical_and_Other_Features.xlsx"
    )
    if clinical.suffix == ".csv":
        df = pd.read_csv(clinical)
    else:
        try:
            raw = pd.read_excel(clinical, header=[0, 1, 2])
        except ImportError as e:
            raise SystemExit(
                f"reading {clinical.name} needs openpyxl (not bundled); "
                "export the table to CSV with columns "
                "PatientID,Location,Bilateral and pass --clinical"
            ) from e
        raw = raw[raw[raw.columns[38]] != "NC"]
        raw = raw[[raw.columns[0], raw.columns[36], raw.columns[38]]]
        raw.columns = ["PatientID", "Location", "Bilateral"]
        df = raw
    out = create_split(build_labels(df))
    out_dir = root / "preprocessed_crop" / "splits"
    out_dir.mkdir(parents=True, exist_ok=True)
    out.to_csv(out_dir / "split.csv", index=False)
    print(f"{len(out)} rows -> {out_dir / 'split.csv'}")


if __name__ == "__main__":
    main()
