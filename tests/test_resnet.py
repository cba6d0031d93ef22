"""ResNet family tests: shapes, BatchNorm plumbing, Grad-CAM++ saliency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models.resnet import (
    ResNet3DClassifier,
    ResNetBackbone,
    ResNetSliceTrans,
    resnet_out_channels,
)
from mst_tpu.ops.gradcam import grad_cam_map, grad_cam_weights
from mst_tpu.train.predictor import make_predict_fn


def test_backbone_2d_shapes():
    m = ResNetBackbone(variant=18)
    x = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 1, 1, 512)  # 32 / 2 / 2 / 8 = 1
    assert "batch_stats" in vars_


@pytest.mark.slow
def test_resnet3d_classifier_forward_and_variants():
    m = ResNet3DClassifier(out_ch=2, variant=18)
    x = jnp.ones((1, 1, 8, 32, 32))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(vars_, x)
    assert logits.shape == (1, 2)
    assert resnet_out_channels(50) == 2048
    assert resnet_out_channels(34) == 512


@pytest.mark.slow
def test_resnet3d_train_step_updates_batch_stats():
    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    m = ResNet3DClassifier(out_ch=2, variant=18)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 8, 16, 16)),
                    jnp.float32)
    t = jnp.array([0, 1])
    vars_ = m.init(jax.random.PRNGKey(0), x)
    state = TrainState.create(
        apply_fn=m.apply, params=vars_["params"], tx=make_optimizer(1e-3),
        dropout_rng=jax.random.PRNGKey(1), batch_stats=vars_["batch_stats"],
    )
    step = make_train_step(m, has_batch_stats=True)
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state2, loss, logits = step(state, x, t, None)
    assert np.isfinite(float(loss))
    after = jax.tree.leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_resnet_slice_trans_forward_with_mask():
    m = ResNetSliceTrans(out_ch=2, variant=18, fusion_heads=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 4, 32, 32)),
                    jnp.float32)
    mask = jnp.array([[False, False, True, True]])
    vars_ = m.init(jax.random.PRNGKey(0), x, mask)
    logits = m.apply(vars_, x, mask)
    assert logits.shape == (1, 2)
    # padded slices must not affect the output
    x2 = x.at[:, :, 2:].set(50.0)
    logits2 = m.apply(vars_, x2, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=2e-3)


def test_grad_cam_weights_golden():
    # gradcam (plain) reduces to spatial mean of grads
    g = jnp.arange(2 * 3 * 4 * 4, dtype=jnp.float32).reshape(2, 3, 4, 4)
    a = jnp.ones_like(g)
    w = grad_cam_weights(g, a, mode="gradcam")
    np.testing.assert_allclose(
        np.asarray(w)[..., 0, 0], np.asarray(g).mean((-1, -2)), rtol=1e-6
    )
    cam = grad_cam_map(a, g)
    assert cam.shape == (2, 1, 4, 4)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0


def test_resnet3d_gradcam_localises_signal():
    """CAM of a linear-ish model should be finite, normalised, volume-shaped."""
    m = ResNet3DClassifier(out_ch=2, variant=18)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 8, 32, 32)),
                    jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    predict = make_predict_fn(m, with_saliency=True,
                              batch_stats=vars_["batch_stats"])
    probs, sal = predict(vars_["params"], x, None)
    assert probs.shape == (1, 2)
    assert sal.shape == (1, 8, 32, 32)
    assert np.isfinite(np.asarray(sal)).all()


def test_resnet_slice_trans_saliency_pipeline():
    m = ResNetSliceTrans(out_ch=2, variant=18, fusion_heads=8)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 1, 4, 32, 32)),
                    jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    predict = make_predict_fn(m, with_saliency=True,
                              batch_stats=vars_["batch_stats"])
    probs, sal = predict(vars_["params"], x, None)
    assert sal.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(sal)).all()
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_resnet_classifier_2d_input():
    """The reference's spatial_dims=2 ResNet baseline (torchvision variant,
    `resnet.py:43-50`) maps to the same classifier here: the backbone is
    rank-generic, so a 4-D [B, C, H, W] batch classifies directly."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.models.resnet import ResNet3DClassifier

    m = ResNet3DClassifier(out_ch=2, variant=18)
    x = jnp.ones((2, 1, 32, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 2) and jnp.isfinite(out).all()
