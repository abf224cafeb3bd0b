"""Input-drift monitoring for deployed predictors (CUSUM / EWMA).

A served clinical model fails silently when the incoming feature
distribution moves (electrode degradation, montage changes, scanner
recalibration). The reference has no monitoring story at all; this module
supplies the standard sequential change detectors in the framework's
house style — shape-static jnp ``step`` functions whose carry is an
explicit state pytree, so a monitor runs inside the same ``lax.scan`` /
per-chunk loop as `data/streaming.py` and batches over features (and over
parallel streams with ``vmap``).

- ``ewma_step``: exponentially-weighted running mean/var (the smoothed
  health signal dashboards plot).
- ``cusum_step``: two-sided standardized CUSUM (Page 1954): S⁺/S⁻
  accumulate standardized deviations beyond a slack ``k``; an alarm fires
  when either exceeds ``h``. With k = δ/2 it is the classic tuning for
  detecting a δ·σ mean shift; under H₀ the no-alarm run length grows
  exponentially in h.
- ``make_drift_monitor``: per-feature two-sided CUSUM against reference
  statistics (fit on training data), alarming when ANY feature drifts —
  the deployment-shaped wrapper.

Oracle: tests/test_drift.py replays both detectors against a plain NumPy
loop, checks null behavior (no alarms at calibrated h) and detection
delay ≈ h/δ after an injected shift.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class EWMAState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    initialized: jnp.ndarray   # bool scalar — first sample seeds the mean


def ewma_init(shape) -> EWMAState:
    return EWMAState(mean=jnp.zeros(shape, jnp.float32),
                     var=jnp.zeros(shape, jnp.float32),
                     initialized=jnp.bool_(False))


def ewma_step(state: EWMAState, x: jnp.ndarray,
              alpha: float = 0.05) -> EWMAState:
    """One EWMA update (West 1979 incremental form for the variance)."""
    x = x.astype(jnp.float32)
    mean0 = jnp.where(state.initialized, state.mean, x)
    delta = x - mean0
    mean = mean0 + alpha * delta
    var = jnp.where(state.initialized,
                    (1 - alpha) * (state.var + alpha * delta * delta),
                    state.var)
    return EWMAState(mean=mean, var=var, initialized=jnp.bool_(True))


class CUSUMState(NamedTuple):
    s_pos: jnp.ndarray
    s_neg: jnp.ndarray
    alarms: jnp.ndarray        # int32 cumulative alarm count (same shape)


def cusum_init(shape) -> CUSUMState:
    z = jnp.zeros(shape, jnp.float32)
    return CUSUMState(s_pos=z, s_neg=z,
                      alarms=jnp.zeros(shape, jnp.int32))


def cusum_step(
    state: CUSUMState,
    z: jnp.ndarray,            # standardized observation(s)
    k: float = 0.5,            # slack (δ/2 for a targeted δ·σ shift)
    h: float = 5.0,            # decision threshold
    reset: bool = True,        # restart the statistic after an alarm
) -> Tuple[CUSUMState, jnp.ndarray]:
    """Two-sided CUSUM update; returns (state, alarm_now bool array)."""
    z = z.astype(jnp.float32)
    s_pos = jnp.maximum(0.0, state.s_pos + z - k)
    s_neg = jnp.maximum(0.0, state.s_neg - z - k)
    alarm = (s_pos > h) | (s_neg > h)
    if reset:
        s_pos = jnp.where(alarm, 0.0, s_pos)
        s_neg = jnp.where(alarm, 0.0, s_neg)
    return CUSUMState(s_pos=s_pos, s_neg=s_neg,
                      alarms=state.alarms + alarm.astype(jnp.int32)), alarm


class DriftState(NamedTuple):
    cusum: CUSUMState
    ewma: EWMAState
    n: jnp.ndarray             # int32 samples seen


def make_drift_monitor(
    ref_mean: np.ndarray,      # (F,) training-set feature means
    ref_std: np.ndarray,       # (F,) training-set feature stds
    k: float = 0.5,
    h: float = 8.0,
    alpha: float = 0.05,
):
    """Build ``(init, step)`` watching feature vectors against reference
    statistics.

    ``step(state, x (F,)) -> (state, out)`` with ``out = {"alarm"
    (bool scalar: any feature drifted on this sample), "per_feature"
    (F,) bool, "ewma_mean" (F,)}``. Standardization uses the FROZEN
    reference statistics — the monitor must not adapt to the drift it is
    trying to detect (the EWMA is reporting-only).
    """
    mu = jnp.asarray(np.asarray(ref_mean, np.float32))
    sd = jnp.maximum(jnp.asarray(np.asarray(ref_std, np.float32)), 1e-8)
    shape = mu.shape

    def init() -> DriftState:
        return DriftState(cusum=cusum_init(shape), ewma=ewma_init(shape),
                          n=jnp.int32(0))

    def step(state: DriftState, x: jnp.ndarray):
        z = (x.astype(jnp.float32) - mu) / sd
        cusum, alarm = cusum_step(state.cusum, z, k=k, h=h)
        ewma = ewma_step(state.ewma, x, alpha=alpha)
        out = {"alarm": jnp.any(alarm), "per_feature": alarm,
               "ewma_mean": ewma.mean}
        return DriftState(cusum=cusum, ewma=ewma, n=state.n + 1), out

    return init, step
