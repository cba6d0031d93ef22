#!/usr/bin/env python
"""One-command AUC-parity runbook (VERDICT r2 #6).

The north-star gate — "TPU build matches the PyTorch reference's AUC on
real LIDC/DUKE/MRNet data with converted pretrained weights" — cannot be
proven in this environment (no datasets, no egress for DINOv2 weights).
This script IS the runbook for the day both are mountable: it executes the
whole chain end-to-end and prints the exact reference command to run
beside it.

    python tools/parity_runbook.py \
        --dataset LIDC --path_root /data/LIDC \
        --weights /weights/dinov2_vits14_pretrain.pth \
        [--model DinoV2ClassifierSlice] [--epochs 1000]

Chain (mirrors reference scripts/main_train.py + main_predict.py):
  1. sanity-check the data artifacts the dataset consumes
     (split.csv + nii.gz/h5 layout);
  2. train fold 0 with the reference hyperparameters
     (`scripts/main_train.py --pretrained_path <weights>`);
  3. predict on the held-out test split (`scripts/main_predict.py`);
  4. read results.csv, print ACC + bootstrap AUC, and the matching
     reference command line:
         python scripts/main_train.py --dataset LIDC --model DinoV2ClassifierSlice
         python scripts/main_predict.py --run_folder <ref_run>
     Parity = |AUC_tpu - AUC_ref| within the reference's own seed-to-seed
     spread (±1 bootstrap std, printed by both predict CLIs).

Hermetic smoke test: `--dataset Synthetic --smoke` runs the same chain on
the built-in synthetic dataset with a tiny encoder and no weights —
asserted in tests/test_parity_runbook.py, so the runbook itself cannot
rot.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def check_artifacts(dataset: str, path_root: str) -> None:
    """Fail fast with a precise message when the on-disk layout is not
    what the dataset class will read (reference dataset contracts,
    SURVEY §2.1 'Datasets')."""
    root = Path(path_root)
    if dataset == "LIDC":
        need = [root / "preprocessed" / "splits" / "split.csv"]
    elif dataset == "DUKE":
        need = [root / "preprocessed" / "splits" / "split.csv",
                root / "preprocessed" / "data_compressed.h5"]
    elif dataset == "MRNet":
        need = [root / "preprocessed" / "splits" / "split.csv"]
    else:
        return
    missing = [str(p) for p in need if not p.exists()]
    if missing:
        raise SystemExit(
            "data artifacts missing — run the preprocessing steps first "
            f"(scripts/preprocessing/{dataset.lower()}/):\n  "
            + "\n  ".join(missing))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="LIDC",
                    choices=["LIDC", "DUKE", "MRNet", "Synthetic"])
    ap.add_argument("--path_root", default=None)
    ap.add_argument("--model", default="DinoV2ClassifierSlice")
    ap.add_argument("--weights", default=None,
                    help="pretrained torch state_dict (hub DINOv2 / HF "
                         "DINOv3 / torchvision ResNet) — converted by "
                         "models/convert.py; omit for random init")
    ap.add_argument("--epochs", type=int, default=1000)
    # fold 0 is the trained fold, matching the reference CLI (neither
    # exposes a fold flag; get_dataset defaults to fold 0)
    ap.add_argument("--run_dir", default="runs")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny hermetic config (Synthetic dataset, tiny "
                         "encoder, 2 epochs) — the CI self-test")
    args = ap.parse_args(argv)

    from scripts.main_predict import main as predict_main
    from scripts.main_train import main as train_main

    if args.dataset != "Synthetic":
        if not args.path_root:
            raise SystemExit("--path_root is required for real datasets")
        check_artifacts(args.dataset, args.path_root)

    train_argv = ["--dataset", args.dataset, "--model", args.model,
                  "--run_dir", args.run_dir,
                  "--max_epochs", "2" if args.smoke else str(args.epochs)]
    if args.path_root:
        train_argv += ["--path_root", args.path_root]
    if args.weights:
        train_argv += ["--pretrained_path", args.weights]
    if args.smoke:
        train_argv += ["--model_size", "tiny", "--fusion_heads", "4",
                       "--dtype", "float32", "--batch_size", "4",
                       "--num_train_samples", "16"]
    print(f"[runbook] train: main_train.py {' '.join(train_argv)}")
    run_dir, _ = train_main(train_argv)

    pred_argv = ["--run_folder", str(run_dir)]
    if args.path_root:
        pred_argv += ["--path_root", args.path_root]
    if args.smoke:
        pred_argv += ["--dtype", "float32"]
    print(f"[runbook] predict: main_predict.py {' '.join(pred_argv)}")
    predict_main(pred_argv)

    import numpy as np
    import pandas as pd

    from mst_tpu.utils.metrics import binary_auroc

    results = pd.read_csv(Path(run_dir) / "results" / "results.csv")
    acc = float((results["GT"] == results["NN"]).mean())
    auc = float(binary_auroc(results["NN_pred"].to_numpy(),
                             results["GT"].to_numpy()))
    summary = {"run_dir": str(run_dir), "n_test": int(len(results)),
               "ACC": round(acc, 4), "AUC": round(auc, 4)}
    print("[runbook] " + json.dumps(summary))
    print(
        "[runbook] reference commands for the parity comparison "
        "(run in the reference repo with the same data root):\n"
        f"    python scripts/main_train.py --dataset {args.dataset} "
        f"--model {args.model}\n"
        "    python scripts/main_predict.py --run_folder "
        f"runs/{args.dataset}/{args.model}_<stamp>\n"
        "[runbook] parity = AUC difference within +/-1 bootstrap std "
        "(both predict CLIs print the bootstrap band; seeds differ, so "
        "compare bands, not point values)")
    np.testing.assert_(0.0 <= auc <= 1.0)
    return summary


if __name__ == "__main__":
    main()
