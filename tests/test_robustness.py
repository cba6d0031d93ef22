"""Degenerate-input robustness: the failure shapes real medical datasets
produce (single-class splits, fully padded volumes, extreme intensities,
constant inputs) must degrade gracefully, not crash or emit NaN."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = dict(model_size="tiny", patch_size=14, use_flash=False, fusion_heads=4)


def test_flash_attention_extreme_magnitudes():
    """Scores ~ +-1e5 pre-softmax: the exp2 folded-scale online softmax
    must stay finite and match the reference masked softmax."""
    from mst_tpu.ops.attention import attention_reference, flash_attention

    q = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 33, 16)) * 50
    k = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 33, 16)) * 50
    v = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 33, 16)) * 50
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fully_padded_volume_is_finite():
    """Every slice masked (a degenerate/empty scan): the CLS token is
    always unmasked, so logits and predict probs stay finite."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.predictor import make_predict_fn

    model = DinoSliceClassifier(out_ch=2, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    mask = jnp.ones((1, 2), bool)  # everything padded
    logits = model.apply({"params": params}, x, mask, deterministic=True)
    assert bool(jnp.isfinite(logits).all())

    probs, sal = make_predict_fn(model, with_saliency=True)(params, x, mask)
    assert bool(jnp.isfinite(probs).all())
    assert bool(jnp.isfinite(sal).all())


def test_constant_volume_znorm_finite():
    """A constant scan (std == 0) through the percentile ZNorm path must
    not divide by zero (DUKE/MRNet normalization)."""
    from mst_tpu.data.transforms import znorm_percentile

    out = znorm_percentile(jnp.full((1, 4, 8, 8), 7.0), (0.5, 99.5))
    assert bool(jnp.isfinite(out).all())


def test_single_class_metrics_and_auc():
    """AUC over a single-class epoch is undefined -> NaN (not a crash),
    ACC still computes; the exact-midrank AUC handles it the same way."""
    from mst_tpu.utils.metrics import ClassificationMetrics

    m = ClassificationMetrics()
    m.update(jnp.asarray([[0.2, 0.8], [0.3, 0.7]]), jnp.asarray([1, 1]))
    out = m.compute()
    assert out["ACC"] == 1.0
    assert np.isnan(out["AUC_ROC"])


@pytest.mark.slow
def test_single_class_val_split_still_banks_a_checkpoint(tmp_path):
    """A val split with one class yields NaN AUC every epoch; the trainer
    must still save a best checkpoint (epoch 0) so the predict CLI can
    load the run."""
    from mst_tpu.data.datamodule import DataModule
    from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import Trainer, make_optimizer

    class OneClass(Synthetic_Dataset3D):
        def __getitem__(self, i):
            item = dict(super().__getitem__(i))
            item["target"] = 1
            return item

    ds = OneClass(num_samples=8, shape_cdhw=(1, 2, 28, 28))
    dm = DataModule(ds_train=ds, ds_val=ds, batch_size=4,
                    num_train_samples=8)
    model = DinoSliceClassifier(out_ch=2, **TINY)
    trainer = Trainer(tmp_path, max_epochs=2, patience=5)
    example = next(iter(dm.val_dataloader()))
    state = trainer.init_state(model, example, make_optimizer(1e-3), seed=0)
    _, result = trainer.fit(model, state, dm)
    assert result.best_epoch == 0  # first epoch banked despite NaN metric
    assert (Path(tmp_path) / "best_checkpoint.json").exists()
