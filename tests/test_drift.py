"""Drift detectors vs NumPy replays, null behavior, and detection delay."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.drift import (
    CUSUMState,
    cusum_init,
    cusum_step,
    ewma_init,
    ewma_step,
    make_drift_monitor,
)


def _scan(step, state, xs):
    return jax.lax.scan(step, state, jnp.asarray(xs))


def test_cusum_matches_numpy_replay():
    r = np.random.default_rng(0)
    z = r.standard_normal(500).astype(np.float32)
    k, h = 0.5, 4.0

    def step(s, zi):
        return cusum_step(s, zi, k=k, h=h)

    state, alarms = _scan(step, cusum_init(()), z)

    sp = sn = 0.0
    ref_alarms, ref_count = [], 0
    for zi in z:
        sp = max(0.0, sp + zi - k)
        sn = max(0.0, sn - zi - k)
        a = sp > h or sn > h
        if a:
            sp = sn = 0.0
            ref_count += 1
        ref_alarms.append(a)
    np.testing.assert_array_equal(np.asarray(alarms), ref_alarms)
    assert int(state.alarms) == ref_count


def test_ewma_matches_numpy_replay():
    r = np.random.default_rng(1)
    x = r.standard_normal((200, 3)).astype(np.float32)
    alpha = 0.1

    def step(s, xi):
        s = ewma_step(s, xi, alpha=alpha)
        return s, s.mean

    state, means = _scan(step, ewma_init((3,)), x)

    m = x[0].astype(np.float64)
    v = np.zeros(3)
    for xi in x[1:]:
        d = xi - m
        m = m + alpha * d
        v = (1 - alpha) * (v + alpha * d * d)
    np.testing.assert_allclose(np.asarray(state.mean), m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.var), v, rtol=1e-4,
                               atol=1e-6)


def test_monitor_null_and_shift_detection():
    """Calibrated h: silent on in-distribution data; after a 2σ mean shift
    on one feature the alarm fires with roughly h/(δ−k) delay and names
    the drifted feature."""
    r = np.random.default_rng(2)
    F, T = 8, 400
    ref = r.standard_normal((5000, F)).astype(np.float32)
    init, step = make_drift_monitor(ref.mean(0), ref.std(0), k=0.5, h=8.0)

    null = r.standard_normal((T, F)).astype(np.float32)
    _, outs = _scan(step, init(), null)
    assert not bool(np.asarray(outs["alarm"]).any()), "false alarm under H0"

    shifted = r.standard_normal((T, F)).astype(np.float32)
    shifted[:, 3] += 2.0  # 2σ shift on feature 3 from t=0
    _, outs = _scan(step, init(), shifted)
    alarms = np.asarray(outs["alarm"])
    assert alarms.any(), "2σ shift must be detected"
    first = int(np.nonzero(alarms)[0][0])
    # expected delay ≈ h/(δ−k) = 8/1.5 ≈ 5.3 samples; allow generous slack
    assert first < 30, first
    per_feat = np.asarray(outs["per_feature"])[first]
    assert per_feat[3] and per_feat.sum() == 1


def test_monitor_does_not_adapt_to_drift():
    """Standardization uses frozen reference stats: a slow ramp must still
    alarm (an adaptive baseline would track it and stay silent)."""
    r = np.random.default_rng(3)
    F, T = 4, 600
    ref = r.standard_normal((5000, F)).astype(np.float32)
    init, step = make_drift_monitor(ref.mean(0), ref.std(0), k=0.5, h=8.0)
    ramp = r.standard_normal((T, F)).astype(np.float32)
    ramp[:, 0] += np.linspace(0, 3.0, T).astype(np.float32)
    _, outs = _scan(step, init(), ramp)
    assert bool(np.asarray(outs["alarm"]).any())


def test_vmapped_parallel_monitors():
    r = np.random.default_rng(4)
    F = 5
    ref = r.standard_normal((1000, F)).astype(np.float32)
    init, step = make_drift_monitor(ref.mean(0), ref.std(0))
    xs = r.standard_normal((2, 100, F)).astype(np.float32)
    xs[1, 50:] += 3.0

    states = jax.vmap(lambda _: init())(jnp.arange(2))
    _, outs = jax.lax.scan(
        lambda s, x: jax.vmap(lambda si, xi: step(si, xi))(s, x),
        states, jnp.asarray(xs.transpose(1, 0, 2)))
    alarms = np.asarray(outs["alarm"])  # (T, 2)
    assert not alarms[:, 0].any()
    assert alarms[:, 1].any()
