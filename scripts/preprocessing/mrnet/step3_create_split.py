#!/usr/bin/env python
"""MRNet step 3: stratified train/val folds; official valid set = test.

Port of reference `scripts/preprocessing/mrnet/step3_create_split.py`:
StratifiedKFold(5) on the train set stratified by `abnormal`, the official
validation set kept as the fixed test split, loop broken after fold 0
(:26-43) -> `splits/split.csv`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd
from sklearn.model_selection import StratifiedKFold


def create_split(df_train: pd.DataFrame, df_valid: pd.DataFrame) -> pd.DataFrame:
    df_train = df_train.reset_index(drop=True)
    splits = []
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=0)
    for fold_i, (train_idx, val_idx) in enumerate(
        skf.split(df_train["ID"], df_train["abnormal"])
    ):
        df_split = df_train.copy()
        df_split["Fold"] = fold_i
        df_split["Folder"] = "train/"
        df_split.loc[df_train.iloc[train_idx].index, "Split"] = "train"
        df_split.loc[df_train.iloc[val_idx].index, "Split"] = "val"
        df_valid_copy = df_valid.copy()
        df_valid_copy["Fold"] = fold_i
        df_valid_copy["Folder"] = "valid/"
        df_valid_copy["Split"] = "test"
        splits.append(pd.concat([df_split, df_valid_copy]))
        break  # test set is the same for every fold (reference :43)
    return pd.concat(splits)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    args = ap.parse_args(argv)
    root = Path(args.path_root) / "preprocessed"
    df_train = pd.read_csv(root / "train.csv")
    df_valid = pd.read_csv(root / "valid.csv")
    out = create_split(df_train, df_valid)
    out_dir = root / "splits"
    out_dir.mkdir(parents=True, exist_ok=True)
    out.to_csv(out_dir / "split.csv", index=False)
    print(f"{len(out)} rows -> {out_dir / 'split.csv'}")


if __name__ == "__main__":
    main()
