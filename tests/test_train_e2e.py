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


def test_predict_ensemble_self_and_nifti_saliency(trained_run):
    """--ensemble with the run itself (x3 identical members) must reproduce
    the single-model predictions (averaging identical softmaxes is the
    identity); --save_saliency writes per-case NIfTI volumes in the (X,Y,Z)
    file frame, loadable by our own reader and co-registered with the
    exported input volume."""
    import pandas as pd

    from mst_tpu.utils.nifti import read_nifti
    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out_a = predict_main([
        "--run_folder", str(run_dir),
        "--output_dir", str(Path(run_dir) / "res_base"),
    ])
    out_b = predict_main([
        "--run_folder", str(run_dir),
        "--ensemble", str(run_dir), str(run_dir), "--save_saliency",
        "--output_dir", str(Path(run_dir) / "res_ens"),
    ])
    a = pd.read_csv(Path(out_a) / "results.csv").sort_values("uid")
    b = pd.read_csv(Path(out_b) / "results.csv").sort_values("uid")
    # tolerance: the ensemble run computes saliency too, whose forward sows
    # attention aux — same math, potentially different fusion/layout
    atol = 1e-4
    np.testing.assert_allclose(a["NN_pred"].to_numpy(),
                               b["NN_pred"].to_numpy(), atol=atol)
    # argmax equality only where the probability is decisively off 0.5 —
    # within atol of the boundary the two compiled forwards may legally
    # disagree on the argmax (ADVICE r3)
    decisive = np.abs(a["NN_pred"].to_numpy() - 0.5) > atol
    assert (a["NN"].to_numpy()[decisive] == b["NN"].to_numpy()[decisive]).all()

    cases = sorted(Path(out_b).glob("case_*"))
    assert len(cases) == 16  # every case, not only positives
    sal, aff = read_nifti(cases[0] / "saliency.nii.gz")
    src, aff2 = read_nifti(cases[0] / "input.nii.gz")
    assert sal.shape == src.shape  # co-registered grids
    assert np.allclose(aff, np.eye(4)) and np.allclose(aff2, aff)
    assert np.isfinite(sal).all() and sal.max() > 0


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


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


TRAIN_ARGS = [
    "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
    "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
    "--patience", "5", "--batch_size", "4", "--num_train_samples", "8",
]


def _leaves(tree):
    import jax

    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.slow
def test_true_resume_bit_identical(tmp_path):
    """--resume restores the FULL TrainState (optimizer moments, step,
    dropout rng, epoch counters): 1 epoch + resume + 1 epoch must equal an
    uninterrupted 2-epoch run bit-for-bit (VERDICT r1 #7)."""
    from mst_tpu.utils.checkpoint import load_checkpoint
    from scripts.main_train import main

    run_a, _ = main(TRAIN_ARGS + ["--max_epochs", "2",
                                  "--run_dir", str(tmp_path / "a")])
    run_b, _ = main(TRAIN_ARGS + ["--max_epochs", "1",
                                  "--run_dir", str(tmp_path / "b")])
    run_c, _ = main(TRAIN_ARGS + ["--max_epochs", "2",
                                  "--run_dir", str(tmp_path / "c"),
                                  "--resume", str(run_b)])
    # resume continues IN the original run dir (the restored best/patience
    # bookkeeping refers to checkpoints living there)
    assert Path(run_c) == Path(run_b)

    pa = _leaves(load_checkpoint(run_a, "last")["params"])
    pc = _leaves(load_checkpoint(run_c, "last")["params"])
    assert pa.keys() == pc.keys()
    for k in pa:
        np.testing.assert_array_equal(pa[k], pc[k], err_msg=k)
    # optimizer moments must also match (true resume, not warm start)
    oa = _leaves(load_checkpoint(run_a, "last")["opt_state"])
    oc = _leaves(load_checkpoint(run_c, "last")["opt_state"])
    for k in oa:
        np.testing.assert_array_equal(oa[k], oc[k], err_msg=k)


def _random_hub_state_dict(rng, embed=32, depth=2, grid=16, patch=14):
    """A random torch.hub-layout DINOv2 ViT state_dict (tiny geometry)."""
    sd = {
        "cls_token": rng.normal(size=(1, 1, embed)),
        "pos_embed": rng.normal(size=(1, grid * grid + 1, embed)),
        "patch_embed.proj.weight": rng.normal(size=(embed, 3, patch, patch)),
        "patch_embed.proj.bias": rng.normal(size=(embed,)),
        "norm.weight": rng.normal(size=(embed,)),
        "norm.bias": rng.normal(size=(embed,)),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": rng.normal(size=(embed,)),
            f"{p}.norm1.bias": rng.normal(size=(embed,)),
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * embed, embed)),
            f"{p}.attn.qkv.bias": rng.normal(size=(3 * embed,)),
            f"{p}.attn.proj.weight": rng.normal(size=(embed, embed)),
            f"{p}.attn.proj.bias": rng.normal(size=(embed,)),
            f"{p}.ls1.gamma": rng.normal(size=(embed,)),
            f"{p}.ls2.gamma": rng.normal(size=(embed,)),
            f"{p}.norm2.weight": rng.normal(size=(embed,)),
            f"{p}.norm2.bias": rng.normal(size=(embed,)),
            f"{p}.mlp.fc1.weight": rng.normal(size=(4 * embed, embed)),
            f"{p}.mlp.fc1.bias": rng.normal(size=(4 * embed,)),
            f"{p}.mlp.fc2.weight": rng.normal(size=(embed, 4 * embed)),
            f"{p}.mlp.fc2.bias": rng.normal(size=(embed,)),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


@pytest.mark.slow
def test_pretrained_path_e2e(tmp_path):
    """--pretrained_path: torch-layout weights on disk reach the encoder
    through the train CLI (VERDICT r1 #4; reference loads hub weights at
    construction, dino.py:59-63). With --freeze the encoder must come out
    of training exactly equal to the converted values."""
    torch = pytest.importorskip("torch")

    from mst_tpu.models.convert import convert_dinov2_vit
    from mst_tpu.utils.checkpoint import load_best_checkpoint, load_hparams
    from scripts.main_train import main

    sd = _random_hub_state_dict(np.random.default_rng(0))
    pth = tmp_path / "encoder.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

    run_dir, _ = main(TRAIN_ARGS + [
        "--max_epochs", "1", "--run_dir", str(tmp_path / "runs"),
        "--pretrained_path", str(pth), "--freeze",
    ])
    ck = load_best_checkpoint(run_dir)
    expect = convert_dinov2_vit(sd, depth=2)
    got = _leaves(ck["params"]["encoder"])
    want = _leaves(expect)
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # hparams must record the grid so predict rebuilds the right encoder
    assert load_hparams(run_dir)["pos_embed_grid"] == 16


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


@pytest.mark.slow
def test_resnet_slice_trans_e2e(tmp_path):
    """MST-ResNet through both CLIs: exercises batch_stats checkpointing
    and the slice-attention x Grad-CAM++ saliency path end-to-end."""
    from scripts.main_predict import main as predict_main
    from scripts.main_train import main

    run_dir, _ = main([
        "--dataset", "Synthetic", "--model", "ResNetSliceTrans",
        "--dtype", "float32", "--max_epochs", "1", "--batch_size", "4",
        "--num_train_samples", "8", "--run_dir", str(tmp_path)])
    out = predict_main(["--run_folder", str(run_dir), "--get_attention"])
    assert (Path(out) / "results.csv").exists()
    assert glob.glob(str(Path(out) / "case_*"))


@pytest.mark.slow
def test_dinov3_e2e(tmp_path):
    """DinoV3 config (2D in-plane RoPE) through both CLIs — the reference's
    DinoV3ClassifierSlice as a config of the same module."""
    from scripts.main_predict import main as predict_main
    from scripts.main_train import main

    run_dir, _ = main([
        "--dataset", "Synthetic", "--model", "DinoV3ClassifierSlice",
        "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
        "--max_epochs", "1", "--batch_size", "4", "--num_train_samples", "8",
        # 28px synthetic slices: override the v3-native patch 16
        "--patch_size", "14",
        "--run_dir", str(tmp_path)])
    out = predict_main(["--run_folder", str(run_dir)])
    assert (Path(out) / "results.csv").exists()


def test_predict_batched(trained_run):
    """--batch_size > 1 for plain eval: same rows as bs=1, one program per
    batch (serving throughput mode); remainder batches handled."""
    import pandas as pd

    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out1 = predict_main(["--run_folder", str(run_dir),
                         "--output_dir", str(Path(run_dir) / "res_bs1")])
    out5 = predict_main(["--run_folder", str(run_dir), "--batch_size", "5",
                         "--output_dir", str(Path(run_dir) / "res_bs5")])
    df1 = pd.read_csv(Path(out1) / "results.csv").sort_values("uid")
    df5 = pd.read_csv(Path(out5) / "results.csv").sort_values("uid")
    assert len(df5) == len(df1) == 16
    np.testing.assert_allclose(df1["NN_pred"].to_numpy(),
                               df5["NN_pred"].to_numpy(), atol=1e-5)
    assert (df1["NN"].to_numpy() == df5["NN"].to_numpy()).all()


def test_predict_data_parallel_devices(trained_run):
    """--num_devices N: plain eval shards batches over a local pure-data
    mesh (shard_map serving); rows equal the single-device run, including
    the remainder batch that falls back to one program."""
    import pandas as pd

    from scripts.main_predict import main as predict_main

    run_dir, _ = trained_run
    out1 = predict_main(["--run_folder", str(run_dir),
                         "--output_dir", str(Path(run_dir) / "res_dp1")])
    # bs=6 over 16 rows on 2 devices: batches of 6, 6, 4 — all divisible,
    # all take the shard_map path (the indivisible fallback is covered by
    # tests/test_parallel.py::test_predict_fn_mesh_matches_single_device)
    out2 = predict_main(["--run_folder", str(run_dir), "--batch_size", "6",
                         "--num_devices", "2",
                         "--output_dir", str(Path(run_dir) / "res_dp2")])
    df1 = pd.read_csv(Path(out1) / "results.csv").sort_values("uid")
    df2 = pd.read_csv(Path(out2) / "results.csv").sort_values("uid")
    assert len(df2) == len(df1) == 16
    np.testing.assert_allclose(df1["NN_pred"].to_numpy(),
                               df2["NN_pred"].to_numpy(), atol=1e-5)
    assert (df1["NN"].to_numpy() == df2["NN"].to_numpy()).all()
