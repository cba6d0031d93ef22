"""K-fold cross-validation driver (`tools/run_crossval.py`): orchestrates
train+predict per fold, pools per-case rows, aggregates DeLong AUC, and
runs the paired model-comparison test."""

import json
from pathlib import Path

import pandas as pd
import pytest

TINY = ["--train_args",
        "--model_size tiny --fusion_heads 4 --dtype float32 "
        "--max_epochs 1 --batch_size 4 --num_train_samples 8"]


@pytest.mark.slow
def test_crossval_two_folds_and_paired_delong(tmp_path):
    from tools.run_crossval import main as crossval_main

    out, summary = crossval_main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--folds", "2", "--run_dir", str(tmp_path)] + TINY)

    assert (Path(out) / "summary.json").exists()
    assert summary["folds"] == 2
    assert len(summary["per_fold"]) == 2
    assert summary["pooled_auc"] is not None
    assert 0.0 <= summary["pooled_auc"] <= 1.0
    lo, hi = summary["pooled_auc_ci95"]
    assert lo <= summary["pooled_auc"] <= hi
    df = pd.read_csv(Path(out) / "crossval.csv")
    assert set(df["fold"]) == {0, 1}
    assert {"uid", "GT", "NN_pred"} <= set(df.columns)

    # paired DeLong against itself: identical predictions -> p == 1
    out2, summary2 = crossval_main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--folds", "1", "--run_dir", str(tmp_path / "b"),
        "--compare_to", str(out)] + TINY)
    cmp = summary2["compare_to"]
    assert cmp["n_shared"] > 0
    assert cmp["delong_p"] is None or 0.0 <= cmp["delong_p"] <= 1.0
    assert json.loads((Path(out2) / "summary.json").read_text())[
        "compare_to"]["dir"] == str(out)
