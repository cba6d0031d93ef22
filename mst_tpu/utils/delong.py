"""Fast DeLong AUC variance and paired AUC significance test.

Capability twin of reference `mst/utils/delong.py` (midranks :11-33,
`fastDeLong` :36-78, `delong_roc_test` :115-129). Implemented from the
DeLong et al. 1988 / Sun & Xu 2014 formulation.
"""

from __future__ import annotations

import numpy as np
import scipy.stats


def compute_midrank(x: np.ndarray) -> np.ndarray:
    """Midranks of x (ties get the average rank)."""
    order = np.argsort(x, kind="mergesort")
    xs = x[order]
    n = x.size
    t = np.zeros(n, dtype=np.float64)
    i = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        t[i:j] = 0.5 * (i + j - 1) + 1
        i = j
    out = np.empty(n, dtype=np.float64)
    out[order] = t
    return out


def fast_delong(predictions_sorted_transposed: np.ndarray, label_1_count: int):
    """AUCs and DeLong covariance for k classifiers.

    predictions_sorted_transposed: [k, n] scores with the `label_1_count`
    positive examples first.
    """
    m = label_1_count
    preds = np.asarray(predictions_sorted_transposed, dtype=np.float64)
    n = preds.shape[1] - m
    pos = preds[:, :m]
    neg = preds[:, m:]
    k = preds.shape[0]

    tx = np.empty((k, m))
    ty = np.empty((k, n))
    tz = np.empty((k, m + n))
    for r in range(k):
        tx[r] = compute_midrank(pos[r])
        ty[r] = compute_midrank(neg[r])
        tz[r] = compute_midrank(preds[r])
    aucs = tz[:, :m].sum(axis=1) / (m * n) - (m + 1.0) / (2.0 * n)
    v01 = (tz[:, :m] - tx) / n
    v10 = 1.0 - (tz[:, m:] - ty) / m
    sx = np.cov(v01)
    sy = np.cov(v10)
    cov = sx / m + sy / n
    return aucs, np.atleast_2d(cov)


def delong_roc_variance(ground_truth, predictions):
    """AUC and its DeLong variance for one classifier."""
    order, label_1_count = _order_by_label(ground_truth)
    aucs, cov = fast_delong(
        np.asarray(predictions, dtype=np.float64)[np.newaxis, order], label_1_count
    )
    return float(aucs[0]), float(cov[0, 0])


def delong_roc_test(ground_truth, predictions_one, predictions_two):
    """Two-sided p-value (log10 in the reference; here the raw p-value AND
    log10(p) are returned) for AUC difference of two classifiers on the
    same data."""
    order, label_1_count = _order_by_label(ground_truth)
    preds = np.vstack(
        [np.asarray(predictions_one, np.float64), np.asarray(predictions_two, np.float64)]
    )[:, order]
    aucs, cov = fast_delong(preds, label_1_count)
    diff = aucs[0] - aucs[1]
    var = cov[0, 0] + cov[1, 1] - 2 * cov[0, 1]
    if var <= 0:
        return 1.0, 0.0
    z = diff / np.sqrt(var)
    p = 2.0 * scipy.stats.norm.sf(abs(z))
    log10p = float(np.log10(max(p, np.finfo(float).tiny)))
    return float(p), log10p


def _order_by_label(ground_truth):
    gt = np.asarray(ground_truth).ravel()
    assert np.array_equal(np.unique(gt), [0, 1]) or set(np.unique(gt)) <= {0, 1}
    order = (-gt).argsort(kind="mergesort")
    return order, int(gt.sum())
