"""Trainer unit behavior: early stopping, top-1 checkpoint deletion,
optimizer schedules, freeze masking."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from mst_tpu.data.datamodule import DataModule
from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
from mst_tpu.models.mst import DinoSliceClassifier
from mst_tpu.train.trainer import Trainer, make_optimizer

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def _fit(tmp_path, max_epochs=4, patience=1, lr=0.0):
    ds = Synthetic_Dataset3D(num_samples=8, shape_cdhw=(1, 2, 28, 28))
    dm = DataModule(ds_train=ds, ds_val=ds, batch_size=4, num_train_samples=8)
    model = DinoSliceClassifier(out_ch=2, **TINY)
    trainer = Trainer(tmp_path, max_epochs=max_epochs, patience=patience,
                      keep_last=True)
    example = next(iter(dm.val_dataloader()))
    state = trainer.init_state(model, example, make_optimizer(lr), seed=0)
    return trainer.fit(model, state, dm, hparams={"m": "tiny"})


@pytest.mark.slow
def test_early_stopping_with_zero_lr(tmp_path):
    """lr=0 means the metric never improves after epoch 0 -> stop at
    1 + patience epochs."""
    state, result = _fit(tmp_path, max_epochs=10, patience=2, lr=0.0)
    assert result.best_epoch == 0
    assert result.epochs_run == 3  # epoch 0 best + 2 stale
    assert (Path(tmp_path) / "best_checkpoint.json").exists()
    assert (Path(tmp_path) / "last").exists()


@pytest.mark.slow
def test_top1_checkpoint_policy_deletes_superseded(tmp_path):
    ds = Synthetic_Dataset3D(num_samples=8, shape_cdhw=(1, 2, 28, 28))
    dm = DataModule(ds_train=ds, ds_val=ds, batch_size=4, num_train_samples=8)
    model = DinoSliceClassifier(out_ch=2, **TINY)
    trainer = Trainer(tmp_path, max_epochs=3, patience=10)
    example = next(iter(dm.val_dataloader()))
    state = trainer.init_state(model, example, make_optimizer(1e-2), seed=0)
    state, result = trainer.fit(model, state, dm)
    epoch_dirs = [p.name for p in Path(tmp_path).glob("epoch=*")
                  if p.is_dir()]
    assert len(epoch_dirs) == 1  # only the current best survives
    assert epoch_dirs[0] == f"epoch={result.best_epoch}"


def test_make_optimizer_schedules_and_freeze():
    tx = make_optimizer(1e-3, schedule="warmup_cosine", total_steps=10,
                        warmup_steps=2)
    params = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(jax.tree.leaves(updates)[0])).all()

    tx_f = make_optimizer(1e-3, freeze_encoder=True)
    state = tx_f.init(params)
    updates, _ = tx_f.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["encoder"]["w"]), 0.0)
    assert float(np.abs(np.asarray(updates["head"]["w"])).sum()) > 0.0


def test_make_optimizer_grad_accumulation():
    """`--accumulate_grad_batches k`: k micro-batch updates == ONE
    optimizer step on the mean gradient; the k-1 intermediate updates are
    exact no-ops on the params."""
    params = {"w": jnp.ones((4, 3))}
    g1 = {"w": jnp.full((4, 3), 0.5)}
    g2 = {"w": jnp.full((4, 3), 1.5)}
    gmean = {"w": jnp.full((4, 3), 1.0)}

    tx = make_optimizer(1e-3, accumulate_steps=2)
    state = tx.init(params)
    up1, state = tx.update(g1, state, params)
    np.testing.assert_array_equal(np.asarray(up1["w"]), 0.0)  # no-op step
    up2, state = tx.update(g2, state, params)

    tx_ref = make_optimizer(1e-3)
    sref = tx_ref.init(params)
    upref, _ = tx_ref.update(gmean, sref, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(upref["w"]),
                               atol=1e-7, rtol=1e-6)

    # composes with freeze masking (frozen leaves stay zero on apply steps)
    p2 = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    txf = make_optimizer(1e-3, freeze_encoder=True, accumulate_steps=2)
    sf = txf.init(p2)
    gs = jax.tree.map(jnp.ones_like, p2)
    _, sf = txf.update(gs, sf, p2)
    up, _ = txf.update(gs, sf, p2)
    np.testing.assert_array_equal(np.asarray(up["encoder"]["w"]), 0.0)
    assert float(np.abs(np.asarray(up["head"]["w"])).sum()) > 0.0


def test_make_optimizer_adafactor_factored_state():
    """`--optimizer adafactor`: finite updates, factored second-moment
    statistics (no full moment tree — for a [R, C] matrix the optimizer
    state holds O(R)+O(C) vectors, the giant2-on-one-chip enabler), and
    composition with freeze masking."""
    mat = {"w": jnp.ones((256, 512))}
    tx = make_optimizer(1e-3, optimizer="adafactor")
    state = tx.init(mat)
    sizes = sorted(int(np.prod(l.shape)) for l in jax.tree.leaves(state)
                   if hasattr(l, "shape") and np.prod(l.shape) > 1)
    assert sizes and max(sizes) <= 256 + 512, sizes  # factored, not full
    updates, _ = tx.update(jax.tree.map(jnp.ones_like, mat), state, mat)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert float(np.abs(np.asarray(updates["w"])).sum()) > 0.0

    params = {"encoder": {"w": jnp.ones((8, 8))}, "head": {"w": jnp.ones(3)}}
    tx_f = make_optimizer(1e-3, optimizer="adafactor", freeze_encoder=True)
    state = tx_f.init(params)
    updates, _ = tx_f.update(jax.tree.map(jnp.ones_like, params), state,
                             params)
    np.testing.assert_array_equal(np.asarray(updates["encoder"]["w"]), 0.0)
    assert float(np.abs(np.asarray(updates["head"]["w"])).sum()) > 0.0

    with pytest.raises(ValueError):
        make_optimizer(1e-3, optimizer="sgd")


@pytest.mark.slow
def test_history_contains_perf_stats(tmp_path):
    _fit(tmp_path, max_epochs=2, patience=5, lr=1e-3)
    rows = [json.loads(l) for l in (Path(tmp_path) / "history.jsonl").open()]
    assert any("perf/p50_ms" in r for r in rows)


def test_should_use_fused_train_gate():
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.resnet import ResNet3DClassifier
    from mst_tpu.train.trainer import should_use_fused_train

    base = dict(out_ch=2, model_size="small", patch_size=14, fusion_heads=4)
    m = DinoSliceClassifier(**base)
    assert should_use_fused_train(m, False, "tpu")
    assert not should_use_fused_train(m, False, "cpu")
    assert not should_use_fused_train(m, True, "tpu")
    assert not should_use_fused_train(
        DinoSliceClassifier(rotary="RoPE", **base), False, "tpu")
    # the test-only 32-wide "tiny" config is rejected: Mosaic cannot
    # lower the fused kernels' token collapse below 128 lanes (measured
    # on v5e) — narrow widths take the flax path instead of crashing
    assert not should_use_fused_train(
        DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                            fusion_heads=4), False, "tpu")
    # round 3: rope (DINOv3) and frozen configs now ride the fused train
    # path (rope/eps train kernels + serving-kernels-under-stop_gradient)
    assert should_use_fused_train(
        DinoSliceClassifier(use_rope_2d=True, **base), False, "tpu")
    assert should_use_fused_train(
        DinoSliceClassifier(freeze=True, **base), False, "tpu")
    assert not should_use_fused_train(
        DinoSliceClassifier(slice_fusion="average", **base), False, "tpu")
    assert not should_use_fused_train(
        ResNet3DClassifier(out_ch=2), False, "tpu")


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save commits in the background; wait + restore round-trips."""
    import numpy as np

    from mst_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_async_saves,
    )

    tree = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": {"c": np.ones((2,), np.int32)}}
    save_checkpoint(tmp_path, "ck", tree, use_async=True)
    wait_for_async_saves()
    out = load_checkpoint(tmp_path, "ck")
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])
