"""AOT serving artifacts (`mst_tpu/export.py`, `scripts/main_export.py`)
and the persistent compilation cache: export -> serialize -> reload ->
call must reproduce the live predict program's rows exactly, with no
model code needed on the loading side."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def _tiny_model_and_params(key=0):
    from mst_tpu.models.mst import DinoSliceClassifier

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(key), (1, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(key + 1), x)["params"]
    return model, params


def test_export_roundtrip_buckets_and_padding(tmp_path):
    """save_exported/load_exported: bucket dispatch pads short batches and
    reproduces the live program's rows bit-for-bit (same XLA program)."""
    from mst_tpu.export import load_exported, save_exported
    from mst_tpu.train.predictor import make_predict_fn

    model, params = _tiny_model_and_params()
    out = save_exported(tmp_path / "art", model, params,
                        batch_sizes=[2, 4], depth=2, hw=28)
    meta = json.loads((out / "meta.json").read_text())
    assert meta["batch_sizes"] == [2, 4]
    assert (out / "program_b2.bin").stat().st_size > 0

    loaded = load_exported(out)
    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(7), (3, 1, 2, 28, 28)), np.float32)
    ref, _ = make_predict_fn(model, with_saliency=False)(
        params, jnp.asarray(vols), None)

    # batch 3 -> bucket 4 (padded); batch 2 -> exact bucket
    probs, sal = loaded.predict(vols)
    assert sal is None and probs.shape == (3, 2)
    np.testing.assert_allclose(probs, np.asarray(ref), atol=1e-6)
    probs2, _ = loaded.predict(vols[:2])
    np.testing.assert_allclose(probs2, np.asarray(ref)[:2], atol=1e-6)

    with pytest.raises(ValueError):
        loaded.predict(np.repeat(vols, 2, axis=0))  # 6 > largest bucket

    # BatchingPredictor-compatible call signature (full buckets only)
    probs3, _ = loaded(loaded.params, vols[:2], None)
    np.testing.assert_allclose(probs3, np.asarray(ref)[:2], atol=1e-6)
    with pytest.raises(ValueError):
        loaded(loaded.params, vols[:2], np.zeros((2, 3), bool))


def test_export_saliency_program(tmp_path):
    """The saliency-emitting program exports too (probs + volume map)."""
    from mst_tpu.export import load_exported, save_exported
    from mst_tpu.train.predictor import make_predict_fn

    model, params = _tiny_model_and_params(3)
    out = save_exported(tmp_path / "art", model, params, batch_sizes=[2],
                        depth=2, hw=28, with_saliency=True)
    loaded = load_exported(out)
    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(9), (2, 1, 2, 28, 28)), np.float32)
    probs, sal = loaded.predict(vols)
    ref_p, ref_s = make_predict_fn(model, with_saliency=True)(
        params, jnp.asarray(vols), None)
    np.testing.assert_allclose(probs, np.asarray(ref_p), atol=1e-6)
    np.testing.assert_allclose(sal, np.asarray(ref_s), atol=1e-6)


def test_export_with_mask_matches_live(tmp_path):
    """with_mask=True: the exported program takes a [B, D] key-padding
    mask (MRNet contract); masked rows match the live program, and an
    absent mask behaves like mask=None."""
    from mst_tpu.export import load_exported, save_exported
    from mst_tpu.train.predictor import make_predict_fn

    model, params = _tiny_model_and_params(5)
    out = save_exported(tmp_path / "art", model, params, batch_sizes=[2],
                        depth=2, hw=28, with_mask=True)
    loaded = load_exported(out)
    assert loaded.meta["with_mask"] is True

    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(11), (2, 1, 2, 28, 28)), np.float32)
    mask = np.array([[False, True], [False, False]])  # pad slice 1 of vol 0
    live = make_predict_fn(model, with_saliency=False)
    ref_m, _ = live(params, jnp.asarray(vols), jnp.asarray(mask))
    ref_0, _ = live(params, jnp.asarray(vols), None)

    probs_m, _ = loaded.predict(vols, mask=mask)
    np.testing.assert_allclose(probs_m, np.asarray(ref_m), atol=1e-6)
    probs_0, _ = loaded.predict(vols)  # no mask -> all-False == None
    np.testing.assert_allclose(probs_0, np.asarray(ref_0), atol=1e-6)
    # the mask actually changed something (the padded slice mattered)
    assert np.abs(probs_m - probs_0).max() > 1e-6
    # serve-compatible call signature passes the mask through
    probs_c, _ = loaded(loaded.params, vols, mask)
    np.testing.assert_allclose(probs_c, np.asarray(ref_m), atol=1e-6)


def test_export_batch_stats_model(tmp_path):
    """Models with batch_stats (the ResNet family) export too — the stats
    are baked into the program as constants."""
    from mst_tpu.export import load_exported, save_exported
    from mst_tpu.models.resnet import ResNetSliceTrans
    from mst_tpu.train.predictor import make_predict_fn

    model = ResNetSliceTrans(out_ch=2, variant=18, fusion_heads=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 32, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    out = save_exported(tmp_path / "art", model, params, batch_sizes=[2],
                        depth=2, hw=32, batch_stats=batch_stats)
    loaded = load_exported(out)
    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(2), (2, 1, 2, 32, 32)), np.float32)
    ref, _ = make_predict_fn(model, with_saliency=False,
                             batch_stats=batch_stats)(
        params, jnp.asarray(vols), None)
    probs, _ = loaded.predict(vols)
    np.testing.assert_allclose(probs, np.asarray(ref), atol=1e-6)


def test_params_npz_roundtrip_ml_dtypes(tmp_path):
    """bf16 (an ml_dtypes numpy extension npz cannot store natively) and
    int8/f32 leaves all round-trip with dtype + values intact."""
    from mst_tpu.export import _load_params_npz, _save_params_npz

    tree = {
        "encoder": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                    "w_bf16": jnp.arange(4, dtype=jnp.bfloat16).reshape(2, 2)},
        "head": {"q_int8": np.array([-128, 127], np.int8)},
    }
    tree = jax.tree.map(np.asarray, tree)
    path = tmp_path / "p.npz"
    dtypes = _save_params_npz(path, tree)
    assert dtypes == {"encoder/w_bf16": "bfloat16"}
    back = _load_params_npz(path, dtypes)
    assert back["encoder"]["w_bf16"].dtype == jnp.bfloat16
    assert back["head"]["q_int8"].dtype == np.int8
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_compilation_cache_writes_entries(tmp_path):
    """enable_compilation_cache: compiled executables persist to disk."""
    from mst_tpu.export import enable_compilation_cache

    cache = tmp_path / "xla_cache"
    assert enable_compilation_cache(str(cache)) == str(cache)

    @jax.jit
    def fn(x):
        return jnp.tanh(x) * 3.25 + 0.125  # unique program per test run

    fn(jnp.arange(17, dtype=jnp.float32)).block_until_ready()
    entries = list(cache.rglob("*"))
    assert any(p.is_file() for p in entries), entries

    # None + no env var leaves the cache untouched
    import os

    os.environ.pop("MST_COMPILATION_CACHE", None)
    assert enable_compilation_cache(None) is None


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    """main_train -> main_export -> load_exported matches the live run;
    main_serve --exported serves it over HTTP with no model rebuild."""
    import io
    import urllib.request

    from scripts.main_export import main as export_main
    from scripts.main_train import main as train_main

    run_dir, _ = train_main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
        "--max_epochs", "1", "--batch_size", "4", "--num_train_samples", "8",
        "--run_dir", str(tmp_path),
    ])
    art = export_main([
        "--run_folder", str(run_dir), "--out", str(tmp_path / "art"),
        "--batch_sizes", "2", "--depth", "2", "--hw", "28",
        "--dtype", "float32",
    ])

    from mst_tpu.export import load_exported
    from mst_tpu.serve import load_run_model
    from mst_tpu.train.predictor import make_predict_fn

    loaded = load_exported(art)
    vols = np.asarray(jax.random.normal(
        jax.random.PRNGKey(2), (2, 1, 2, 28, 28)), np.float32)
    model, params, _ = load_run_model(run_dir, dtype=jnp.float32)
    ref, _ = make_predict_fn(model, with_saliency=False)(
        params, jnp.asarray(vols), None)
    probs, _ = loaded.predict(vols)
    np.testing.assert_allclose(probs, np.asarray(ref), atol=1e-6)

    import argparse

    from scripts.main_serve import build_server

    args = argparse.Namespace(
        run_folder=None, exported=str(art), host="127.0.0.1", port=0,
        batch_size=2, max_wait_ms=20.0, num_devices=1, dtype="float32",
        int8=False, int8_calib=0, compilation_cache=None)
    server, predictor = build_server(args)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["exported"] == str(art)

        buf = io.BytesIO()
        np.save(buf, vols[0])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())
        np.testing.assert_allclose(got["probs"], np.asarray(ref)[0],
                                   atol=1e-6)
    finally:
        server.shutdown()
        predictor.close()

    # bucket mismatch is a clear startup error
    args.batch_size = 3
    with pytest.raises(SystemExit):
        build_server(args)
