"""Probability calibration + decision-threshold analysis (on device).

The reference decides at a fixed argmax/0.5 threshold and never inspects
probability quality (`CrossModal_EEG_scr.ipynb §23`, `_test_bridge.py`
evaluation loops) — for a clinical outcome classifier that leaves real
operating-point information on the table. This module extends the metric
layer with the standard calibration toolkit, written like the rest of
`report/metrics.py`: pure jnp, f32 reductions, optional sample-weight
masks (padded fold rows drop out), everything jit/vmap-friendly with
static shapes so per-fold calibration runs as one batched device call.

- ``reliability_curve`` / ``expected_calibration_error``: equal-width
  confidence bins via one segment-sum (no host loop over bins).
- ``brier_score``: weighted squared error of the positive-class
  probability.
- ``fit_temperature``: temperature scaling (Guo et al. 2017) by Newton
  steps on the NLL in log-T — deterministic, fixed iteration count,
  compiles into an eval scan.
- ``threshold_sweep`` / ``optimal_threshold``: vectorized metric sweep
  over candidate thresholds (masked-weight formulation, no sorting
  tricks), maximizing F1 or Youden's J.

Oracle parity: tests/test_calibration.py checks bins against
sklearn.calibration.calibration_curve, Brier against brier_score_loss,
and the threshold sweep against a brute-force loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.metrics import _w  # shared mask helper


def reliability_curve(
    probs: jnp.ndarray,            # (N,) positive-class probability
    labels: jnp.ndarray,           # (N,) {0,1}
    n_bins: int = 10,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Equal-width reliability diagram data.

    Returns ``{"confidence", "accuracy", "count"}``, each (n_bins,);
    empty bins report 0 count and NaN confidence/accuracy (sklearn's
    ``calibration_curve`` drops them — comparison masks on count > 0).
    """
    probs = probs.astype(jnp.float32)
    w = _w(weights, probs.shape[0])
    # right-edge binning like np.digitize(right=False) - 1, clipped so
    # p == 1.0 lands in the last bin
    idx = jnp.clip((probs * n_bins).astype(jnp.int32), 0, n_bins - 1)
    wsum = jax.ops.segment_sum(w, idx, n_bins)
    conf = jax.ops.segment_sum(w * probs, idx, n_bins)
    acc = jax.ops.segment_sum(w * (labels == 1), idx, n_bins)
    safe = jnp.where(wsum > 0, wsum, 1.0)
    return {
        "confidence": jnp.where(wsum > 0, conf / safe, jnp.nan),
        "accuracy": jnp.where(wsum > 0, acc / safe, jnp.nan),
        "count": wsum,
    }


def expected_calibration_error(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    n_bins: int = 10,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ECE = Σ_b (n_b/N) · |acc_b − conf_b| over equal-width bins."""
    curve = reliability_curve(probs, labels, n_bins, weights)
    n = jnp.maximum(jnp.sum(curve["count"]), 1e-8)
    gap = jnp.abs(curve["accuracy"] - curve["confidence"])
    return jnp.nansum(curve["count"] / n * jnp.nan_to_num(gap))


def brier_score(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    w = _w(weights, probs.shape[0])
    sq = (probs.astype(jnp.float32) - (labels == 1)) ** 2
    return jnp.sum(w * sq) / jnp.maximum(jnp.sum(w), 1e-8)


def fit_temperature(
    logits: jnp.ndarray,           # (N, C)
    labels: jnp.ndarray,           # (N,)
    weights: Optional[jnp.ndarray] = None,
    n_steps: int = 48,
    log_t_bound: float = 4.0,
) -> jnp.ndarray:
    """Temperature T > 0 minimizing weighted NLL of ``softmax(logits/T)``.

    Golden-section search on u = log T over [−bound, bound]
    (T ∈ [0.018, 54.6] at the default): the NLL is quasi-convex in u but
    NOT convex — on a perfectly-separated eval set it decreases
    monotonically toward u → −∞, where an unguarded Newton walks to the
    wrong stationary point (this happened; see tests). A bounded,
    derivative-free bracket is robust to both that degeneracy and f32
    saturation, still a fixed-iteration ``lax.scan`` (48 steps shrink the
    bracket below 1e-8). Apply with ``logits / T``.
    """
    logits = logits.astype(jnp.float32)
    w = _w(weights, logits.shape[0])
    wsum = jnp.maximum(jnp.sum(w), 1e-8)

    def nll(u):
        z = logits * jnp.exp(-u)
        logp = jax.nn.log_softmax(z, axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return -jnp.sum(w * picked) / wsum

    return jnp.exp(_golden_min(nll, log_t_bound, n_steps))


def fit_temperature_ensemble(
    member_logits: jnp.ndarray,    # (K, N, C) one row of logits per member
    labels: jnp.ndarray,           # (N,)
    weights: Optional[jnp.ndarray] = None,
    n_steps: int = 48,
    log_t_bound: float = 4.0,
) -> jnp.ndarray:
    """Shared temperature for a late-fusion ensemble.

    The ensemble probability is the MEAN of member softmaxes (the
    reference's late fusion, `CrossModal_EEG_scr.ipynb §34`), so the
    temperature must sit inside each member's softmax —
    ``mean_k softmax(z_k / T)`` — and the NLL is not the plain softmax NLL
    ``fit_temperature`` minimizes. Same bounded golden-section scaffold.
    """
    member_logits = member_logits.astype(jnp.float32)
    w = _w(weights, member_logits.shape[1])
    wsum = jnp.maximum(jnp.sum(w), 1e-8)

    def nll(u):
        p = jax.nn.softmax(member_logits * jnp.exp(-u), axis=-1)
        mean_p = jnp.mean(p, axis=0)                      # (N, C)
        picked = jnp.take_along_axis(mean_p, labels[:, None], axis=-1)[:, 0]
        return -jnp.sum(w * jnp.log(picked + 1e-9)) / wsum

    return jnp.exp(_golden_min(nll, log_t_bound, n_steps))


def _golden_min(f, bound: float, n_steps: int) -> jnp.ndarray:
    """Golden-section minimum of scalar ``f`` over [−bound, bound] as a
    fixed-length ``lax.scan`` (see fit_temperature for why not Newton).

    Classic single-evaluation form: each step keeps one interior point and
    its value, so only the NEW point's ``f`` is computed (one objective
    eval per step, not two)."""
    phi = 0.6180339887498949  # 1/golden ratio
    lo0 = jnp.float32(-bound)
    hi0 = jnp.float32(bound)
    m10 = hi0 - phi * (hi0 - lo0)
    m20 = lo0 + phi * (hi0 - lo0)

    def step(carry, _):
        lo, m1, m2, hi, f1, f2 = carry
        shrink_hi = f1 < f2  # keep [lo, m2]; m1 survives as the new m2
        lo_n = jnp.where(shrink_hi, lo, m1)
        hi_n = jnp.where(shrink_hi, m2, hi)
        m1_n = hi_n - phi * (hi_n - lo_n)
        m2_n = lo_n + phi * (hi_n - lo_n)
        m_new = jnp.where(shrink_hi, m1_n, m2_n)
        f_new = f(m_new)
        f1_n = jnp.where(shrink_hi, f_new, f2)
        f2_n = jnp.where(shrink_hi, f1, f_new)
        return (lo_n, m1_n, m2_n, hi_n, f1_n, f2_n), None

    init = (lo0, m10, m20, hi0, f(m10), f(m20))
    (lo, _, _, hi, _, _), _ = jax.lax.scan(step, init, None, length=n_steps)
    return (lo + hi) / 2.0


def threshold_sweep(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    thresholds: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Weighted confusion metrics at every threshold (vectorized).

    Returns ``{"f1", "youden", "sensitivity", "specificity"}``, each of
    shape ``thresholds.shape``. Prediction rule: positive iff
    ``p >= threshold`` (ties at the threshold count positive, matching
    ``(probs >= 0.5)`` argmax for symmetric binary logits).
    """
    probs = probs.astype(jnp.float32)
    w = _w(weights, probs.shape[0])
    pos = (labels == 1).astype(jnp.float32) * w
    neg = (labels == 0).astype(jnp.float32) * w
    pred = (probs[None, :] >= thresholds[:, None]).astype(jnp.float32)
    tp = pred @ pos
    fp = pred @ neg
    fn = jnp.sum(pos) - tp
    tn = jnp.sum(neg) - fp
    sens = tp / jnp.maximum(tp + fn, 1e-8)
    spec = tn / jnp.maximum(tn + fp, 1e-8)
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-8)
    return {"f1": f1, "youden": sens + spec - 1.0,
            "sensitivity": sens, "specificity": spec}


def optimal_threshold(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    metric: str = "f1",            # or "youden"
    n_grid: int = 101,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(threshold, value) maximizing ``metric`` on an even [0, 1] grid.

    A fixed grid (rather than the sorted unique probabilities) keeps the
    shape static under jit/vmap; at n_grid=101 the resolution (0.01) is
    finer than any fold of the reference's 66-subject data can resolve.
    """
    ts = jnp.linspace(0.0, 1.0, n_grid)
    vals = threshold_sweep(probs, labels, ts, weights)[metric]
    i = jnp.argmax(vals)
    return ts[i], vals[i]
