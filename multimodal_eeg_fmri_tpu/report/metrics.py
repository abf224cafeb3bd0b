"""On-device evaluation metrics.

The reference computes every metric with sklearn on host
(``run_fmri_v11.py:483-504``, ``CrossModal_EEG_scr.ipynb §23``:
accuracy/F1/precision/recall/AUC; MSE/RMSE/MAE/R2 for regression), forcing a
device→host sync per evaluation. Here the same metrics are pure jnp
functions, so model selection (best-F1 tracking) runs *inside* the compiled
training scan — no host round-trip per epoch. All functions accept an
optional ``weights`` mask so padded rows in fixed-shape fold batches drop out.

Parity contract: tested against sklearn on random fixtures
(tests/test_metrics.py); AUC uses the rank-statistic (Mann-Whitney)
formulation with midrank tie handling, which equals
``sklearn.metrics.roc_auc_score`` exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def _w(weights: Optional[jnp.ndarray], n: int) -> jnp.ndarray:
    if weights is None:
        return jnp.ones((n,), jnp.float32)
    return weights.astype(jnp.float32)


def accuracy(preds, labels, weights=None) -> jnp.ndarray:
    w = _w(weights, labels.shape[0])
    return jnp.sum((preds == labels) * w) / jnp.maximum(jnp.sum(w), 1e-8)


def _binary_counts(preds, labels, w):
    tp = jnp.sum((preds == 1) * (labels == 1) * w)
    fp = jnp.sum((preds == 1) * (labels == 0) * w)
    fn = jnp.sum((preds == 0) * (labels == 1) * w)
    tn = jnp.sum((preds == 0) * (labels == 0) * w)
    return tp, fp, fn, tn


def precision_recall_f1(preds, labels, weights=None):
    """Binary precision/recall/F1 for the positive class (sklearn
    ``average='binary'`` — the reference's convention)."""
    w = _w(weights, labels.shape[0])
    tp, fp, fn, _ = _binary_counts(preds, labels, w)
    precision = tp / jnp.maximum(tp + fp, 1e-8)
    recall = tp / jnp.maximum(tp + fn, 1e-8)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-8)
    return precision, recall, f1


def auc_roc(scores, labels, weights=None) -> jnp.ndarray:
    """ROC AUC via the Mann-Whitney U statistic with midranks (tie-correct).

    AUC = P(score_pos > score_neg) + 0.5·P(score_pos == score_neg), computed
    with a weighted pairwise comparison — exact with sample weights/masks,
    and O(n²) elementwise on the VPU which is faster than a host round-trip
    for the n ≤ a-few-hundred evaluation sets this workload has.
    """
    w = _w(weights, labels.shape[0])
    s = scores.astype(jnp.float32)
    lt = (s[None, :] < s[:, None]).astype(jnp.float32)  # [i,j] = s_j < s_i
    eq = (s[None, :] == s[:, None]).astype(jnp.float32)
    wn = w * (labels == 0)
    wp = w * (labels == 1)
    n_pos = jnp.sum(wp)
    n_neg = jnp.sum(wn)
    # for each positive i: weighted # negatives below + 0.5 · # tied
    contrib = lt @ wn + 0.5 * (eq @ wn)
    u = jnp.sum(contrib * wp)
    return u / jnp.maximum(n_pos * n_neg, 1e-8)


def binary_classification_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """The reference's classification metric dict: accuracy, f1, precision,
    recall, auc (class-1 probability scores)."""
    preds = jnp.argmax(logits, axis=-1)
    probs1 = _softmax(logits)[:, 1]
    p, r, f1 = precision_recall_f1(preds, labels, weights)
    w = _w(weights, labels.shape[0])
    _, fp, _, tn = _binary_counts(preds, labels, w)
    return {
        "accuracy": accuracy(preds, labels, weights),
        "f1": f1,
        "precision": p,
        "recall": r,  # == sensitivity (the reference's LOSO term)
        "specificity": tn / jnp.maximum(tn + fp, 1e-8),
        "auc": auc_roc(probs1, labels, weights),
    }


def _softmax(logits):
    z = logits.astype(jnp.float32)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def softmax_probs(logits: jnp.ndarray) -> jnp.ndarray:
    return _softmax(logits)


def regression_metrics(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """MSE / RMSE / MAE / R2 (reference ``run_fmri_v11.py:496-504``)."""
    w = _w(weights, targets.shape[0])
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    p = preds.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    mse = jnp.sum(w * (p - t) ** 2) / wsum
    mae = jnp.sum(w * jnp.abs(p - t)) / wsum
    tmean = jnp.sum(w * t) / wsum
    ss_tot = jnp.sum(w * (t - tmean) ** 2)
    ss_res = jnp.sum(w * (p - t) ** 2)
    r2 = 1.0 - ss_res / jnp.maximum(ss_tot, 1e-8)
    return {"mse": mse, "rmse": jnp.sqrt(mse), "mae": mae, "r2": r2}
