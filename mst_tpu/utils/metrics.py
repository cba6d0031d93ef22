"""Classification metrics: streaming accuracy/AUROC + confusion utilities.

Replaces the reference's torchmetrics `AUROC`/`Accuracy` aggregation
(`mst/models/base_model.py:141-178`) and the `cm2acc`/`cm2x` helpers
(`mst/utils/roc_curve.py:80-102`).

Design: per-step predictions are tiny (batch of 2 floats at reference
scale), so epoch metrics accumulate scores/labels on host and compute
exact rank-based AUC — numerically identical to sklearn's
`roc_auc_score` including tie handling. A jittable pairwise AUC
(`binary_auroc_jax`) is provided for in-graph logging and `psum`-style
cross-device reduction of its sufficient statistics.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


def binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUC via midranks (handles ties like sklearn)."""
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(bool)
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(scores.size, dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def binary_auroc_jax(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Jittable pairwise AUC (O(n^2), fine for epoch-sized buffers)."""
    pos = labels.astype(bool)
    s = scores.astype(jnp.float32)
    diff = s[:, None] - s[None, :]
    wins = jnp.where(diff > 0, 1.0, jnp.where(diff == 0, 0.5, 0.0))
    pair_mask = pos[:, None] & (~pos)[None, :]
    n_pairs = jnp.sum(pair_mask)
    return jnp.sum(wins * pair_mask) / jnp.maximum(n_pairs, 1)


def accuracy(pred_classes: np.ndarray, labels: np.ndarray) -> float:
    pred_classes = np.asarray(pred_classes).ravel()
    labels = np.asarray(labels).ravel()
    return float((pred_classes == labels).mean()) if labels.size else float("nan")


def confusion_matrix(pred: np.ndarray, target: np.ndarray, n_classes: int = 2):
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    for t, p in zip(np.asarray(target).ravel(), np.asarray(pred).ravel()):
        cm[int(t), int(p)] += 1
    return cm


def cm2acc(cm: np.ndarray) -> float:
    """Accuracy from confusion matrix (reference `roc_curve.py:80-85`)."""
    return float(np.trace(cm) / np.clip(cm.sum(), 1, None))


def cm2x(cm: np.ndarray):
    """(ppv, npv, sensitivity, specificity) from a 2x2 confusion matrix
    (reference `roc_curve.py:88-102`); rows = ground truth, cols = pred."""
    tn, fp = cm[0, 0], cm[0, 1]
    fn, tp = cm[1, 0], cm[1, 1]

    def _div(a, b):
        return float(a / b) if b > 0 else float("nan")

    ppv = _div(tp, tp + fp)
    npv = _div(tn, tn + fn)
    sens = _div(tp, tp + fn)
    spec = _div(tn, tn + fp)
    return ppv, npv, sens, spec


def gather_across_hosts(*arrays):
    """All-gather per-host metric buffers in multi-host runs (the analogue
    of torchmetrics' `sync_dist=True`, reference `base_model.py:170,177`).
    No-op in single-process runs."""
    import jax

    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    return tuple(
        np.asarray(multihost_utils.process_allgather(a)).reshape(-1, *np.asarray(a).shape[1:])
        for a in arrays
    )


class ClassificationMetrics:
    """Streaming epoch accumulator (torchmetrics `.update()/.compute()`
    analogue, reference `base_model.py:141-178`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._scores: List[np.ndarray] = []
        self._preds: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []
        self._valid: List[np.ndarray] = []

    def update(self, logits, labels, valid=None):
        """`valid`: optional per-sample bool mask — False marks the
        wrap-padding duplicates multi-host eval adds so every host runs
        equal batch counts (`DataModule._eval_indices`); they are dropped
        exactly at compute() instead of skewing the epoch metrics."""
        logits = np.asarray(logits, dtype=np.float32)
        labels = np.asarray(labels)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        self._scores.append(probs[:, 1] if probs.shape[-1] > 1 else probs[:, 0])
        self._preds.append(logits.argmax(-1))
        self._labels.append(labels)
        self._valid.append(
            np.ones(labels.shape[0], bool) if valid is None
            else np.asarray(valid, bool))

    def compute(self) -> Dict[str, float]:
        if not self._labels:
            return {"ACC": float("nan"), "AUC_ROC": float("nan")}
        scores = np.concatenate(self._scores)
        preds = np.concatenate(self._preds)
        labels = np.concatenate(self._labels)
        valid = np.concatenate(self._valid)
        # Multi-host: every host sees the global buffers (sync_dist
        # analogue) so early stopping / best-checkpoint agree everywhere.
        scores, preds, labels, valid = gather_across_hosts(
            scores, preds, labels, valid)
        keep = np.asarray(valid, bool).ravel()
        scores, preds, labels = scores[keep], preds[keep], labels[keep]
        return {
            "ACC": accuracy(preds, labels),
            "AUC_ROC": binary_auroc(scores, labels),
        }
