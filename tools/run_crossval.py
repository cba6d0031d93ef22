#!/usr/bin/env python
"""K-fold cross-validation driver: train + evaluate every fold, aggregate.

    python tools/run_crossval.py --dataset LIDC --model DinoV2ClassifierSlice \
        --path_root /data/LIDC [--folds 5] [--run_dir runs] \
        [--compare_to runs/LIDC/crossval_ResNetSliceTrans] \
        [--train_args "--model_size small --freeze"]

For each fold k: `main_train --fold k` then `main_predict` on that fold's
test split. Emits under `<run_dir>/<dataset>/crossval_<model>/`:

  crossval.csv      pooled per-case rows (uid, GT, NN_pred, fold)
  summary.json      per-fold AUC + pooled AUC (DeLong variance + 95% CI)
  + the per-fold run dirs

`--compare_to` points at another crossval directory (a different model on
the same dataset/splits): cases are inner-joined on uid and a PAIRED
DeLong test on the pooled predictions reports whether the AUC difference
is significant — the analysis the reference ships `mst/utils/delong.py`
for but never wires up (SURVEY: "imported nowhere in-repo").

In k-fold CV every case appears in exactly one fold's test split, so the
pooled rows are one prediction per case — the standard pooled-CV AUC.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def _fold_auc(df: pd.DataFrame):
    from mst_tpu.utils.delong import delong_roc_variance

    gt = df["GT"].to_numpy(int)
    pred = df["NN_pred"].to_numpy(float)
    if len(np.unique(gt)) < 2:
        return None, None
    auc, var = delong_roc_variance(gt, pred)
    return float(auc), float(var)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="LIDC")
    ap.add_argument("--model", default="DinoV2ClassifierSlice")
    ap.add_argument("--path_root", default=None)
    ap.add_argument("--run_dir", default="runs")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--train_args", default="",
                    help="extra main_train flags, one shell-style string "
                         "(e.g. \"--model_size small --max_epochs 50\")")
    ap.add_argument("--predict_args", default="",
                    help="extra main_predict flags (e.g. \"--use_tta\")")
    ap.add_argument("--compare_to", default=None,
                    help="another crossval output dir: paired DeLong test "
                         "on the pooled predictions (same dataset/splits)")
    args = ap.parse_args(argv)

    from scripts.main_predict import main as predict_main
    from scripts.main_train import main as train_main

    out_root = Path(args.run_dir) / args.dataset / f"crossval_{args.model}"
    out_root.mkdir(parents=True, exist_ok=True)

    base = ["--dataset", args.dataset, "--model", args.model,
            "--run_dir", str(out_root)]
    if args.path_root:
        base += ["--path_root", args.path_root]
    extra_train = args.train_args.split()
    extra_pred = args.predict_args.split()
    if args.path_root:
        extra_pred = ["--path_root", args.path_root] + extra_pred

    rows, per_fold = [], []
    for fold in range(args.folds):
        print(f"=== fold {fold}/{args.folds - 1} ===", flush=True)
        run_dir, _ = train_main(base + ["--fold", str(fold)] + extra_train)
        pred_out = predict_main(["--run_folder", str(run_dir)] + extra_pred)
        df = pd.read_csv(Path(pred_out) / "results.csv")
        df["fold"] = fold
        rows.append(df)
        auc, var = _fold_auc(df)
        per_fold.append({"fold": fold, "run_dir": str(run_dir),
                         "n": int(len(df)), "auc": auc,
                         "auc_se": None if var is None
                         else float(np.sqrt(var))})
        if auc is not None:
            print(f"fold {fold}: AUC {auc:.4f} (n={len(df)})", flush=True)

    pooled = pd.concat(rows, ignore_index=True)
    pooled.to_csv(out_root / "crossval.csv", index=False)

    auc, var = _fold_auc(pooled)
    se = float(np.sqrt(var)) if var is not None else None
    fold_aucs = [f["auc"] for f in per_fold if f["auc"] is not None]
    summary = {
        "dataset": args.dataset, "model": args.model, "folds": args.folds,
        "per_fold": per_fold,
        "fold_auc_mean": float(np.mean(fold_aucs)) if fold_aucs else None,
        "fold_auc_std": float(np.std(fold_aucs)) if fold_aucs else None,
        "pooled_auc": auc,
        "pooled_auc_se": se,
        "pooled_auc_ci95": (None if auc is None else
                            [auc - 1.96 * se, auc + 1.96 * se]),
        "n_cases": int(len(pooled)),
    }

    if args.compare_to:
        from mst_tpu.utils.delong import delong_roc_test

        other = pd.read_csv(Path(args.compare_to) / "crossval.csv")
        merged = pooled.merge(other, on="uid", suffixes=("_a", "_b"))
        if (merged["GT_a"] != merged["GT_b"]).any():
            raise SystemExit("--compare_to: ground truth disagrees on "
                             "shared uids — different splits?")
        if len(merged) < len(pooled):
            print(f"warning: only {len(merged)}/{len(pooled)} cases shared "
                  "with --compare_to; paired test runs on the overlap",
                  flush=True)
        p, log10p = delong_roc_test(merged["GT_a"].to_numpy(int),
                                    merged["NN_pred_a"].to_numpy(float),
                                    merged["NN_pred_b"].to_numpy(float))
        auc_b, _ = _fold_auc(merged.rename(
            columns={"GT_b": "GT", "NN_pred_b": "NN_pred"}))
        summary["compare_to"] = {
            "dir": str(args.compare_to), "n_shared": int(len(merged)),
            "other_pooled_auc": auc_b,
            "delong_p": None if np.isnan(p) else float(p),
            "delong_log10p": None if np.isnan(log10p) else float(log10p),
        }
        print(f"paired DeLong vs {args.compare_to}: p={p:.4g}", flush=True)

    (out_root / "summary.json").write_text(json.dumps(summary, indent=1))
    if auc is not None:
        print(f"pooled AUC {auc:.4f} ± {se:.4f} over {len(pooled)} cases "
              f"({args.folds} folds) -> {out_root}", flush=True)
    if len(per_fold) > 1:
        dirs = [f["run_dir"] for f in per_fold]
        print("deployment ensemble of the fold models (external/fixed-test "
              "data only — cross-fold ensembling leaks on rotating-test "
              "splits):\n  python scripts/main_predict.py --run_folder "
              f"{dirs[0]} --ensemble {' '.join(dirs[1:])}", flush=True)
    return out_root, summary


if __name__ == "__main__":
    main()
