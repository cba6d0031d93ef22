"""Bootstrap ROC curve + plot artifacts (reference `mst/utils/roc_curve.py`).

Keeps the reference's output contract: `plot_roc_curve` draws the mean ROC
with a ±1 std band and the Youden working point onto a matplotlib axis and
returns `(tprs, fprs, auc_val, thrs, opt_idx, cm)`
(reference `roc_curve.py:22-77`); `auc_bootstrapping` resamples with
replacement and interpolates tpr on a fixed fpr grid
(reference `roc_curve.py:5-18`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from sklearn.metrics import roc_curve as sk_roc_curve

from mst_tpu.utils.metrics import binary_auroc, confusion_matrix


def auc_bootstrapping(
    y_true, y_score, n_bootstrap: int = 1000, drop_intermediate: bool = False,
    fpr_grid_points: int = 100, seed: int = 0,
):
    """Bootstrap ROC: returns (tprs [n, grid], aucs [n], thrs [n]).

    thrs is the per-sample optimal (Youden J) threshold
    (reference `roc_curve.py:5-18`).
    """
    y_true = np.asarray(y_true).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    if np.unique(y_true).size < 2:
        # every resample would be rejected below — fail fast instead of
        # looping forever on a single-class split
        raise ValueError("auc_bootstrapping requires both classes in y_true")
    rng = np.random.default_rng(seed)
    mean_fpr = np.linspace(0, 1, fpr_grid_points)
    tprs, aucs, thrs = [], [], []
    n = y_true.size
    while len(aucs) < n_bootstrap:
        idx = rng.integers(0, n, n)
        if np.unique(y_true[idx]).size < 2:
            continue
        fpr, tpr, thr = sk_roc_curve(
            y_true[idx], y_score[idx], drop_intermediate=drop_intermediate
        )
        tprs.append(np.interp(mean_fpr, fpr, tpr))
        tprs[-1][0] = 0.0
        aucs.append(binary_auroc(y_score[idx], y_true[idx]))
        opt = np.argmax(tpr - fpr)
        thrs.append(thr[opt])
    return np.asarray(tprs), np.asarray(aucs), np.asarray(thrs)


def plot_roc_curve(
    y_true,
    y_score,
    axis,
    n_bootstrap: int = 1000,
    name: Optional[str] = None,
    color: str = "b",
    fontdict: Optional[dict] = None,
):
    """Draw mean ROC ± std band + working point; return
    (tprs, fprs, auc_val, thrs, opt_idx, cm) as the reference does
    (`roc_curve.py:22-77`)."""
    fontdict = fontdict or {}
    y_true = np.asarray(y_true).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()

    tprs, aucs, thrs = auc_bootstrapping(y_true, y_score, n_bootstrap)
    mean_fpr = np.linspace(0, 1, tprs.shape[1])
    mean_tpr = tprs.mean(0)
    std_tpr = tprs.std(0)

    fprs_c, tprs_c, thresholds = sk_roc_curve(y_true, y_score, drop_intermediate=False)
    auc_val = binary_auroc(y_score, y_true)
    opt_idx = int(np.argmax(tprs_c - fprs_c))
    opt_thr = thresholds[opt_idx]
    y_pred = (y_score >= opt_thr).astype(int)
    cm = confusion_matrix(y_pred, y_true)

    label = f"AUC = {auc_val:.2f} ± {aucs.std():.2f}"
    if name:
        label = f"{name}: {label}"
    axis.plot(mean_fpr, mean_tpr, color=color, label=label)
    axis.fill_between(
        mean_fpr,
        np.maximum(mean_tpr - std_tpr, 0),
        np.minimum(mean_tpr + std_tpr, 1),
        color=color,
        alpha=0.2,
    )
    axis.plot(fprs_c[opt_idx], tprs_c[opt_idx], color + "o")
    axis.plot([0, 1], [0, 1], "k--", alpha=0.5)
    axis.set_xlabel("1 - Specificity", fontdict=fontdict)
    axis.set_ylabel("Sensitivity", fontdict=fontdict)
    axis.legend(loc="lower right")
    return tprs, fprs_c, auc_val, thrs, opt_idx, cm
