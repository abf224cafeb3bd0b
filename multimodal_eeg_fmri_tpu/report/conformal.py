"""Split-conformal prediction sets (distribution-free coverage).

Calibrated probabilities (report/calibration.py) make confidences honest
on average; conformal prediction goes further and wraps EVERY prediction
in a set with a finite-sample marginal coverage guarantee — for a
clinical gate ("defer to a human when the set is not a singleton") that
guarantee holds regardless of how wrong the model is. The reference has
no notion of abstention or coverage.

Split conformal (Vovk et al.; Angelopoulos & Bates 2023 tutorial form):
hold out a calibration fold, compute a nonconformity score per example,
take the ⌈(n+1)(1−α)⌉/n empirical quantile q̂, and at test time include
every class whose score ≤ q̂. Two standard scores:

- ``lac``  (Least Ambiguous set-valued Classifier): score = 1 − p_y.
  Smallest average sets; no conditional-coverage adaptivity.
- ``aps``  (Adaptive Prediction Sets): score = cumulative probability mass
  of classes ranked above y, plus y's own mass. Larger sets, better
  class-conditional behavior. (Deterministic variant — no tie-breaking
  randomization — which is slightly conservative, the standard practical
  choice.)

Everything is jnp with static shapes: calibration is one sort, test-time
set construction is a comparison against q̂ — both vmap over folds.
Finite-sample coverage is exercised in tests/test_conformal.py over many
resampled splits.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.metrics import _w as _weights


def _scores(probs: jnp.ndarray, labels: jnp.ndarray,
            method: str) -> jnp.ndarray:
    """Per-example nonconformity score of the TRUE class."""
    p_true = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    if method == "lac":
        return 1.0 - p_true
    if method == "aps":
        # mass of classes with prob strictly above the true class + own mass
        above = jnp.sum(
            jnp.where(probs > p_true[:, None], probs, 0.0), axis=-1)
        return above + p_true
    raise ValueError(f"unknown method {method!r} (use 'lac' or 'aps')")


def conformal_calibrate(
    probs_cal: jnp.ndarray,        # (n, C) calibration-fold probabilities
    labels_cal: jnp.ndarray,       # (n,)
    alpha: float = 0.1,            # 1 - target coverage
    method: str = "lac",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q̂: the ⌈(n+1)(1−α)⌉/n empirical quantile of calibration scores.

    ``weights`` is the framework's 0/1 padding mask (padded rows must not
    count toward n — they would bias q̂): masked rows get score −inf so
    they sort first and the quantile index is computed from the REAL row
    count.
    """
    probs_cal = probs_cal.astype(jnp.float32)
    w = _weights(weights, probs_cal.shape[0])
    scores = _scores(probs_cal, labels_cal, method)
    scores = jnp.where(w > 0, scores, -jnp.inf)
    n_real = jnp.sum(w > 0)
    # finite-sample-corrected quantile rank (1-indexed), clipped to n
    rank = jnp.minimum(
        jnp.ceil((n_real + 1) * (1.0 - alpha)).astype(jnp.int32), n_real)
    sorted_scores = jnp.sort(scores)
    pad = scores.shape[0] - n_real          # number of −inf entries in front
    qhat = sorted_scores[pad + rank - 1]
    # An all-masked calibration fold (n_real == 0) would land on a −inf
    # sentinel and silently produce EMPTY sets downstream; a vacuous
    # calibration must fail conservative instead: q̂ = +inf → full sets.
    return jnp.where(n_real > 0, qhat, jnp.inf)


def conformal_sets(
    probs: jnp.ndarray,            # (m, C) test probabilities
    qhat: jnp.ndarray,
    method: str = "lac",
) -> jnp.ndarray:
    """Boolean membership (m, C): class c is in the set iff its score ≤ q̂."""
    probs = probs.astype(jnp.float32)
    if method == "lac":
        return (1.0 - probs) <= qhat
    if method == "aps":
        order = jnp.argsort(-probs, axis=-1)
        p_sorted = jnp.take_along_axis(probs, order, axis=-1)
        cum = jnp.cumsum(p_sorted, axis=-1)
        keep_sorted = cum <= qhat
        # always include the top class (cum[0] may already exceed q̂)
        keep_sorted = keep_sorted.at[:, 0].set(True)
        inv = jnp.argsort(order, axis=-1)
        return jnp.take_along_axis(keep_sorted, inv, axis=-1)
    raise ValueError(f"unknown method {method!r} (use 'lac' or 'aps')")


def coverage_and_size(
    sets: jnp.ndarray,             # (m, C) bool
    labels: jnp.ndarray,           # (m,)
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(empirical coverage, average set size) under the padding mask."""
    w = _weights(weights, sets.shape[0])
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    hit = jnp.take_along_axis(sets, labels[:, None], axis=-1)[:, 0]
    cov = jnp.sum(w * hit) / wsum
    size = jnp.sum(w * jnp.sum(sets, axis=-1)) / wsum
    return cov, size
