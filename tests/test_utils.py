"""Utils tests: AUC vs sklearn, DeLong sanity, seg metrics golden values,
NIfTI round-trip, checkpoint pointer contract."""

import numpy as np
import pytest

from mst_tpu.utils.delong import delong_roc_test, delong_roc_variance
from mst_tpu.utils.metrics import (
    ClassificationMetrics,
    binary_auroc,
    cm2acc,
    cm2x,
    confusion_matrix,
)
from mst_tpu.utils.nifti import read_nifti, write_nifti
from mst_tpu.utils.seg_metrics import (
    average_surface_distance,
    dice_score,
    iou_score,
    saliency_to_mask,
)


def test_binary_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    s = rng.normal(size=200) + y * 0.8
    np.testing.assert_allclose(binary_auroc(s, y), roc_auc_score(y, s), atol=1e-12)
    # With ties
    s_t = np.round(s, 1)
    np.testing.assert_allclose(binary_auroc(s_t, y), roc_auc_score(y, s_t), atol=1e-12)


def test_classification_metrics_stream():
    m = ClassificationMetrics()
    logits = np.array([[2.0, -1.0], [0.0, 3.0], [1.0, 1.5]])
    labels = np.array([0, 1, 1])
    m.update(logits[:2], labels[:2])
    m.update(logits[2:], labels[2:])
    out = m.compute()
    assert out["ACC"] == 1.0
    assert out["AUC_ROC"] == 1.0


def test_cm_helpers():
    cm = confusion_matrix(np.array([0, 1, 1, 0]), np.array([0, 1, 0, 0]))
    assert cm2acc(cm) == 0.75
    ppv, npv, sens, spec = cm2x(cm)
    assert sens == 1.0 and spec == pytest.approx(2 / 3)


def test_delong_variance_and_test():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 300)
    good = y + rng.normal(0, 0.5, 300)
    bad = rng.normal(0, 1, 300)
    auc, var = delong_roc_variance(y, good)
    assert 0.8 < auc <= 1.0 and var > 0
    p_same, _ = delong_roc_test(y, good, good + 1e-9)
    p_diff, _ = delong_roc_test(y, good, bad)
    assert p_same > 0.9
    assert p_diff < 0.01


def test_seg_metrics_golden():
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool)
    a[2:6, 2:6, 2:6] = True  # 64 voxels
    b[3:7, 2:6, 2:6] = True  # overlap 48
    assert dice_score(a, b) == pytest.approx(2 * 48 / 128)
    assert iou_score(a, b) == pytest.approx(48 / 80)
    assert dice_score(a, a) == 1.0
    # identical masks -> zero surface distance; spacing scales distances
    assert average_surface_distance(a, a, spacing=(1, 1, 1)) == 0.0
    d1 = average_surface_distance(a, b, spacing=(1, 1, 1))
    d2 = average_surface_distance(a, b, spacing=(2, 1, 1))
    assert 0 < d1 < d2


def test_saliency_to_mask_quantile():
    s = np.arange(1000, dtype=np.float32).reshape(10, 10, 10)
    m = saliency_to_mask(s, quantile=0.999)
    assert m.sum() == 1 and m[9, 9, 9]


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
    aff = np.diag([0.7, 0.7, 3.0, 1.0])
    aff[:3, 3] = [1, 2, 3]
    p = tmp_path / "x.nii.gz"
    write_nifti(p, vol, aff)
    data, affine = read_nifti(p)
    np.testing.assert_allclose(data, vol, atol=0)
    np.testing.assert_allclose(affine, aff, atol=1e-6)
    # int dtype + plain .nii
    p2 = tmp_path / "y.nii"
    write_nifti(p2, (vol * 100).astype(np.int16))
    d2, _ = read_nifti(p2)
    assert d2.dtype == np.int16


def test_checkpoint_pointer_contract(tmp_path):
    import jax.numpy as jnp

    from mst_tpu.utils.checkpoint import (
        load_best_checkpoint,
        load_hparams,
        save_best_checkpoint,
        save_checkpoint,
    )

    state = {"params": {"w": jnp.ones((2, 2)), "b": jnp.zeros((2,))}, "step": 3}
    save_checkpoint(tmp_path, "epoch_3", state, hparams={"model": "tiny"})
    save_best_checkpoint(tmp_path, "epoch_3")
    loaded = load_best_checkpoint(tmp_path)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]), np.ones((2, 2)))
    assert load_hparams(tmp_path) == {"model": "tiny"}


def test_classification_metrics_valid_mask_drops_duplicates():
    """Padded-duplicate samples marked valid=False must not shift ACC/AUC:
    metrics over [real + duplicated pad] with the mask == metrics over the
    real samples alone."""
    from mst_tpu.utils.metrics import ClassificationMetrics

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(10, 2)).astype(np.float32)
    labels = (rng.random(10) > 0.5).astype(np.int32)

    ref = ClassificationMetrics()
    ref.update(logits, labels)
    want = ref.compute()

    m = ClassificationMetrics()
    m.update(logits[:6], labels[:6])  # no mask: all valid
    # pad batch: 4 real + 4 wrapped duplicates that would skew the metrics
    m.update(np.concatenate([logits[6:], logits[:4]]),
             np.concatenate([labels[6:], 1 - labels[:4]]),
             valid=np.array([True] * 4 + [False] * 4))
    got = m.compute()
    assert got == want
