"""Per-fold clinical decision report over a finished CV run.

Glues the decision toolkit (calibration, operating point, conformal
coverage) onto `train/cv.CVResult`, which already carries every fold's
held-out probabilities/labels/padding mask — so the report is pure host
math on stored outputs, no re-evaluation, usable on any protocol the CV
drivers produce (SGKF / LOSO / LOOCV / fMRI k-fold).

Per fold: ECE, Brier, best-F1 operating point. Conformal coverage is
**leave-one-fold-out**: fold f's prediction sets use a q̂ calibrated on
the OTHER folds' held-out outputs (within-fold calibrate-and-test would
be circular). Summary rows are mean ± std across folds, the same form as
``CVResult.summary``.

The reference reports raw fold metrics only (`CrossModal_EEG_scr.ipynb
§44`); this is the framework's deployment-readiness extension.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.report.calibration import (
    brier_score,
    expected_calibration_error,
    optimal_threshold,
)
from multimodal_eeg_fmri_tpu.report.conformal import (
    conformal_calibrate,
    conformal_sets,
    coverage_and_size,
)


def clinical_report(
    result,                       # train.cv.CVResult (binary task)
    alpha: float = 0.1,
    n_bins: int = 10,
) -> Dict[str, Dict]:
    """{"per_fold": {name: (n_folds,)}, "summary": {name: (mean, std)}}.

    Requires ``result.test_probs/test_labels/test_weight`` (populated by
    ``run_cv`` for classification) — raises otherwise.
    """
    if result.test_probs is None or result.test_labels is None:
        raise ValueError("CVResult carries no per-sample test outputs — "
                         "clinical_report needs a classification run_cv "
                         "result")
    probs = np.asarray(result.test_probs, np.float32)   # (F, n, C)
    labels = np.asarray(result.test_labels, np.int64)   # (F, n)
    weight = (np.asarray(result.test_weight, np.float32)
              if result.test_weight is not None
              else np.ones(labels.shape, np.float32))
    n_folds = probs.shape[0]

    per: Dict[str, np.ndarray] = {
        k: np.zeros(n_folds, np.float64)
        for k in ("ece", "brier", "opt_threshold", "opt_f1",
                  "conformal_coverage", "conformal_set_size")
    }
    for f in range(n_folds):
        p1 = jnp.asarray(probs[f, :, 1])
        y = jnp.asarray(labels[f])
        w = jnp.asarray(weight[f])
        per["ece"][f] = float(expected_calibration_error(
            p1, y, n_bins=n_bins, weights=w))
        per["brier"][f] = float(brier_score(p1, y, weights=w))
        t, v = optimal_threshold(p1, y, metric="f1", weights=w)
        per["opt_threshold"][f] = float(t)
        per["opt_f1"][f] = float(v)

        # leave-one-fold-out conformal: q̂ from every OTHER fold's rows.
        # With a single fold there is no other fold — fall back to
        # leave-one-SAMPLE-out within the fold (the pooled-report rule)
        # instead of calibrating on zero rows.
        others = [g for g in range(n_folds) if g != f]
        if others:
            cal_p = probs[others].reshape(-1, probs.shape[-1])
            cal_y = labels[others].reshape(-1)
            cal_w = weight[others].reshape(-1)
            q = conformal_calibrate(jnp.asarray(cal_p), jnp.asarray(cal_y),
                                    alpha=alpha, weights=jnp.asarray(cal_w))
            sets = conformal_sets(jnp.asarray(probs[f]), q)
            cov, size = coverage_and_size(sets, y, weights=w)
            per["conformal_coverage"][f] = float(cov)
            per["conformal_set_size"][f] = float(size)
        else:
            m = weight[f] > 0
            cov_f, size_f = _loo_conformal(probs[f][m], labels[f][m], alpha)
            per["conformal_coverage"][f] = cov_f
            per["conformal_set_size"][f] = size_f

    summary: Dict[str, Tuple[float, float]] = {
        k: (float(v.mean()), float(v.std())) for k, v in per.items()
    }
    return {"per_fold": per, "summary": summary, "alpha": alpha}


def pooled_clinical_report(
    probs: np.ndarray,            # (n, C) pooled held-out probabilities
    labels: np.ndarray,           # (n,)
    alpha: float = 0.1,
    n_bins: int = 10,
) -> Dict[str, float]:
    """Clinical report for pooled one-row-per-fold protocols (LOOCV/LOSO
    subject predictions), where per-fold calibration is meaningless.

    Conformal coverage here is **leave-one-out**: subject i's q̂ comes from
    every OTHER subject's nonconformity score (the LOOCV analogue of the
    leave-one-fold-out rule; the O(n²) loop is trivial at subject counts).
    """
    probs = np.asarray(probs, np.float32)
    labels = np.asarray(labels, np.int64)
    n = len(labels)
    p1 = jnp.asarray(probs[:, 1])
    y = jnp.asarray(labels)
    t, v = optimal_threshold(p1, y, metric="f1")
    out = {
        "ece": float(expected_calibration_error(p1, y, n_bins=n_bins)),
        "brier": float(brier_score(p1, y)),
        "opt_threshold": float(t),
        "opt_f1": float(v),
        "alpha": alpha,
    }
    cov, size = _loo_conformal(probs, labels, alpha)
    out["conformal_coverage"] = cov
    out["conformal_set_size"] = size
    return out


def _loo_conformal(probs: np.ndarray, labels: np.ndarray,
                   alpha: float) -> Tuple[float, float]:
    """Leave-one-out conformal (coverage, mean set size): row i's q̂ comes
    from every other row's LAC score. O(n²), trivial at subject counts."""
    n = len(labels)
    scores = 1.0 - probs[np.arange(n), labels]          # LAC score
    covered, sizes = np.zeros(n, bool), np.zeros(n)
    for i in range(n):
        others = np.delete(scores, i)
        m = len(others)
        rank = min(int(np.ceil((m + 1) * (1 - alpha))), m)
        qhat = np.sort(others)[rank - 1]
        covered[i] = scores[i] <= qhat
        sizes[i] = int((1.0 - probs[i] <= qhat).sum())
    return float(covered.mean()), float(sizes.mean())
