"""End-to-end smoke: train CLI on the synthetic dataset, predict CLI with
TTA + attention artifacts, multi-chip dry run (SURVEY §4 d, e)."""

import glob
import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from scripts.main_train import main

    run_dir, result = main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
        "--max_epochs", "2", "--patience", "5", "--batch_size", "4",
        "--num_train_samples", "16",
        "--run_dir", str(tmp_path_factory.mktemp("runs")),
    ])
    return run_dir, result


def test_train_produces_checkpoints_and_history(trained_run):
    run_dir, result = trained_run
    assert (Path(run_dir) / "best_checkpoint.json").exists()
    assert (Path(run_dir) / "last").exists()
    history = [json.loads(l) for l in (Path(run_dir) / "history.jsonl").open()]
    assert len(history) == result.epochs_run
    assert all(np.isfinite(h["train_loss"]) for h in history)


def test_predict_plain(trained_run):
    import pandas as pd

    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out = predict_main(["--run_folder", str(run_dir)])
    df = pd.read_csv(Path(out) / "results.csv")
    assert {"uid", "GT", "NN", "NN_pred"} <= set(df.columns)
    assert len(df) == 16
    assert df["NN_pred"].between(0, 1).all()
    assert (Path(out) / "roc.png").exists()
    assert (Path(out) / "confusion_matrix.png").exists()


def test_predict_tta_attention(trained_run):
    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out = predict_main([
        "--run_folder", str(run_dir), "--use_tta", "--get_attention",
        "--output_dir", str(Path(run_dir) / "results_tta"),
    ])
    cases = glob.glob(str(Path(out) / "case_*"))
    assert len(cases) == 8  # positives only
    for c in cases[:1]:
        assert (Path(c) / "attention.png").exists()
        assert (Path(c) / "input.png").exists()


def test_predict_segmentation(trained_run):
    """--get_segmentation: saliency -> 99.9th-pct mask -> Dice/IoU/ASSD vs
    the >=2-rater synthetic ground truth -> results_seg.csv."""
    import pandas as pd

    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out = predict_main([
        "--run_folder", str(run_dir), "--get_segmentation",
        "--output_dir", str(Path(run_dir) / "results_seg"),
    ])
    df = pd.read_csv(Path(out) / "results_seg.csv")
    assert {"uid", "GT", "NN", "Dice", "IoU", "ASSD"} <= set(df.columns)
    assert len(df) == 16
    assert df["Dice"].between(0, 1).all() or df["Dice"].isna().any()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_tta_flip_equivariance():
    """A spatially flipped input under full TTA must give the same
    prediction (the ensemble enumerates all flips) — SURVEY §4 (f)."""
    import jax.numpy as jnp

    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.predictor import make_predict_fn

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    import jax

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    predict = make_predict_fn(model, tta=True, with_saliency=False)
    p1, _ = predict(params, x, None)
    p2, _ = predict(params, jnp.flip(x, axis=(2, 3, 4)), None)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_rollout_saliency_mode():
    """plane_mode='rollout' produces a normalised volume-shaped map."""
    import jax

    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.predictor import make_predict_fn

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    predict = make_predict_fn(model, with_saliency=True, plane_mode="rollout")
    probs, sal = predict(params, x, None)
    assert sal.shape == (1, 4, 28, 28)
    assert np.isfinite(np.asarray(sal)).all()
