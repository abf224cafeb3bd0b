"""Calibration/threshold metrics vs sklearn + brute-force oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.calibration import (
    brier_score,
    expected_calibration_error,
    fit_temperature,
    optimal_threshold,
    reliability_curve,
    threshold_sweep,
)


@pytest.fixture(scope="module")
def binary_probs():
    r = np.random.default_rng(0)
    n = 400
    labels = r.integers(0, 2, n)
    # overconfident probabilities: an informative score sharpened 3× past
    # its honest log-odds (classic miscalibration shape)
    logit = 3.0 * (labels * 2 - 1) + r.standard_normal(n) * 2.5
    probs = 1.0 / (1.0 + np.exp(-3.0 * logit))
    return probs.astype(np.float32), labels.astype(np.int32)


def test_reliability_curve_matches_sklearn(binary_probs):
    from sklearn.calibration import calibration_curve

    probs, labels = binary_probs
    curve = reliability_curve(jnp.asarray(probs), jnp.asarray(labels),
                              n_bins=10)
    frac_pos, mean_pred = calibration_curve(labels, probs, n_bins=10,
                                            strategy="uniform")
    mask = np.asarray(curve["count"]) > 0
    np.testing.assert_allclose(np.asarray(curve["accuracy"])[mask],
                               frac_pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(curve["confidence"])[mask],
                               mean_pred, atol=1e-6)


def test_ece_hand_computed(binary_probs):
    probs, labels = binary_probs
    ece = float(expected_calibration_error(jnp.asarray(probs),
                                           jnp.asarray(labels), n_bins=10))
    # hand NumPy reference
    idx = np.clip((probs * 10).astype(int), 0, 9)
    tot = 0.0
    for b in range(10):
        m = idx == b
        if m.sum():
            tot += m.sum() / len(probs) * abs(
                labels[m].mean() - probs[m].mean())
    assert abs(ece - tot) < 1e-6
    assert ece > 0.05  # the fixture is deliberately miscalibrated


def test_brier_matches_sklearn(binary_probs):
    from sklearn.metrics import brier_score_loss

    probs, labels = binary_probs
    got = float(brier_score(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(got - brier_score_loss(labels, probs)) < 1e-6


def test_weights_drop_padded_rows(binary_probs):
    probs, labels = binary_probs
    pad_p = np.concatenate([probs, np.full(37, 0.99, np.float32)])
    pad_l = np.concatenate([labels, np.zeros(37, np.int32)])
    w = np.concatenate([np.ones_like(probs), np.zeros(37, np.float32)])
    for fn in (expected_calibration_error, brier_score):
        a = float(fn(jnp.asarray(probs), jnp.asarray(labels)))
        b = float(fn(jnp.asarray(pad_p), jnp.asarray(pad_l),
                     weights=jnp.asarray(w)))
        assert abs(a - b) < 1e-6, fn.__name__


def test_temperature_scaling_reduces_nll_and_ece(binary_probs):
    probs, labels = binary_probs
    # rebuild two-class logits from the overconfident probabilities
    # (clip first: the sharpened fixture saturates some probs to 1.0 in f32)
    p = np.clip(probs.astype(np.float64), 1e-7, 1 - 1e-7)
    logit = np.log(p) - np.log1p(-p)
    logits = np.stack([np.zeros_like(logit), logit], -1) * 3.0  # extra-sharp
    T = float(fit_temperature(jnp.asarray(logits), jnp.asarray(labels)))
    assert T > 1.0  # overconfident → temperature must soften

    def nll(z):
        z = z - z.max(-1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
        return -logp[np.arange(len(labels)), labels].mean()

    assert nll(logits / T) < nll(logits) - 1e-3
    p_cal = 1.0 / (1.0 + np.exp(-(logits[:, 1] - logits[:, 0]) / T))
    ece_raw = float(expected_calibration_error(
        jnp.asarray(1 / (1 + np.exp(-logits[:, 1] + logits[:, 0]))),
        jnp.asarray(labels)))
    ece_cal = float(expected_calibration_error(jnp.asarray(p_cal),
                                               jnp.asarray(labels)))
    assert ece_cal < ece_raw


def test_temperature_identity_when_calibrated():
    """Logits that ARE the true log-odds need T ≈ 1."""
    r = np.random.default_rng(3)
    n = 4000
    logit = r.standard_normal(n) * 2.0
    p = 1 / (1 + np.exp(-logit))
    labels = (r.random(n) < p).astype(np.int32)
    logits = np.stack([np.zeros_like(logit), logit], -1)
    T = float(fit_temperature(jnp.asarray(logits), jnp.asarray(labels)))
    assert 0.9 < T < 1.1, T


def test_temperature_degenerate_separable_sharpens():
    """Perfectly-separated eval set: NLL decreases monotonically toward
    T→0, which drove the old Newton implementation to T ≈ 1e5 (the wrong
    stationary direction). The bracketed search must return the sharpening
    bound instead."""
    n = 64
    labels = (np.arange(n) % 2).astype(np.int32)
    logit = 0.2 * (labels * 2 - 1)  # tiny margins, all argmax-correct
    logits = np.stack([np.zeros(n, np.float32), logit.astype(np.float32)], -1)
    T = float(fit_temperature(jnp.asarray(logits), jnp.asarray(labels)))
    assert T < 0.05, T  # sharpen (lower bound), never explode


def test_temperature_ensemble_reduces_to_single(binary_probs):
    """K identical members: the ensemble fit must equal the plain fit."""
    from multimodal_eeg_fmri_tpu.report.calibration import (
        fit_temperature_ensemble,
    )

    probs, labels = binary_probs
    p = np.clip(probs.astype(np.float64), 1e-7, 1 - 1e-7)
    logit = (np.log(p) - np.log1p(-p)).astype(np.float32)
    logits = np.stack([np.zeros_like(logit), logit], -1) * 3.0
    t1 = float(fit_temperature(jnp.asarray(logits), jnp.asarray(labels)))
    tk = float(fit_temperature_ensemble(
        jnp.asarray(np.stack([logits] * 3)), jnp.asarray(labels)))
    assert abs(t1 - tk) / t1 < 1e-3


def test_threshold_sweep_matches_bruteforce(binary_probs):
    probs, labels = binary_probs
    ts = np.linspace(0, 1, 21).astype(np.float32)
    got = threshold_sweep(jnp.asarray(probs), jnp.asarray(labels),
                          jnp.asarray(ts))
    for i, t in enumerate(ts):
        pred = (probs >= t).astype(int)
        tp = ((pred == 1) & (labels == 1)).sum()
        fp = ((pred == 1) & (labels == 0)).sum()
        fn = ((pred == 0) & (labels == 1)).sum()
        tn = ((pred == 0) & (labels == 0)).sum()
        f1 = 2 * tp / max(2 * tp + fp + fn, 1e-8)
        sens = tp / max(tp + fn, 1e-8)
        spec = tn / max(tn + fp, 1e-8)
        assert abs(float(got["f1"][i]) - f1) < 1e-5
        assert abs(float(got["youden"][i]) - (sens + spec - 1)) < 1e-5


def test_optimal_threshold_beats_default(binary_probs):
    probs, labels = binary_probs
    # skew the operating point: shift probabilities so 0.5 is suboptimal
    skewed = np.clip(probs * 0.6, 0, 1).astype(np.float32)
    t, v = optimal_threshold(jnp.asarray(skewed), jnp.asarray(labels),
                             metric="f1")
    at_half = threshold_sweep(jnp.asarray(skewed), jnp.asarray(labels),
                              jnp.asarray(np.array([0.5], np.float32)))
    assert float(v) >= float(at_half["f1"][0])
    assert float(t) < 0.5  # the sweep must find the shifted operating point
