"""SciPy-oracle parity tests for the on-device signal layer (ops/signal.py).

SURVEY §7: "parity with scipy.signal.filtfilt within tolerance is the
north-star requirement" for the preprocessing layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.ops import signal as S


@pytest.fixture(autouse=True)
def _x64():
    """Enable float64 ONLY within these oracle-parity tests. A module-level
    config update would leak into every other test in the session (pytest
    imports all modules at collection) and perturb their numerics."""
    with jax.enable_x64():
        yield


@pytest.fixture(scope="module")
def sig(rng=None):
    r = np.random.default_rng(0)
    return r.standard_normal((512, 4)).astype(np.float64)  # (T, C)


def test_lfilter_matches_scipy(sig):
    from scipy.signal import butter, lfilter as sp_lfilter

    b, a = butter(4, [8, 13], btype="bandpass", fs=250)
    ours = np.asarray(S.lfilter(jnp.asarray(b), jnp.asarray(a),
                                jnp.asarray(sig)))
    ref = sp_lfilter(b, a, sig, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_filtfilt_matches_scipy(sig):
    from scipy.signal import butter, filtfilt as sp_filtfilt

    b, a, zi = S.butter_bandpass(8, 13, 250, order=4)
    ours = np.asarray(
        S.filtfilt(jnp.asarray(b), jnp.asarray(a), jnp.asarray(sig),
                   jnp.asarray(zi))
    )
    ref = sp_filtfilt(b, a, sig, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_bandpass_filtfilt_batched(sig):
    from scipy.signal import butter, filtfilt as sp_filtfilt

    batch = np.stack([sig, sig * 2 + 1], axis=0)  # (B, T, C)
    ours = np.asarray(S.bandpass_filtfilt(jnp.asarray(batch), 8, 13, 250))
    b, a = butter(4, [8, 13], btype="bandpass", fs=250)
    ref = sp_filtfilt(b, a, batch, axis=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_sosfilt_matches_scipy(sig):
    from scipy.signal import butter, sosfilt as sp_sosfilt

    sos = butter(4, [8, 13], btype="bandpass", fs=250, output="sos")
    ours = np.asarray(S.sosfilt(sos, jnp.asarray(sig)))
    ref = sp_sosfilt(sos, sig, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_sosfiltfilt_matches_scipy(sig):
    from scipy.signal import sosfiltfilt as sp_sosfiltfilt

    sos, zi = S.butter_bandpass_sos(8, 13, 250, order=4)
    ours = np.asarray(S.sosfiltfilt(sos, jnp.asarray(sig), zi))
    ref = sp_sosfiltfilt(sos, sig, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_bandpass_float32_stable():
    """The TPU path has no float64: the SOS cascade must stay stable and
    energy-reducing in float32 where the expanded transfer function blows
    up (this exact failure was observed with the (b, a) form)."""
    from scipy.signal import sosfiltfilt as sp_sosfiltfilt

    r = np.random.default_rng(5)
    x32 = r.standard_normal((4, 2000, 18)).astype(np.float32)
    y = np.asarray(S.bandpass_filtfilt(jnp.asarray(x32), 8, 13, 250.0))
    assert y.dtype == np.float32
    # band-passed white noise keeps only (13-8)/125 of the band → std ≪ 1
    ratio = y.std() / x32.std()
    assert ratio < 0.5, f"unstable filter: std ratio {ratio}"
    sos, _ = S.butter_bandpass_sos(8, 13, 250.0, 4)
    ref = sp_sosfiltfilt(sos, x32.astype(np.float64), axis=1)
    np.testing.assert_allclose(y, ref, rtol=1e-2, atol=2e-4)


def test_stft_matches_scipy(sig):
    from scipy.signal import stft as sp_stft

    x = sig[:, 0]
    ours = np.asarray(S.stft(jnp.asarray(x), nperseg=128, noverlap=64))
    _, _, ref = sp_stft(x, nperseg=128, noverlap=64, boundary=None,
                        padded=False, window="hann")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)


def test_hilbert_matches_scipy(sig):
    from scipy.signal import hilbert as sp_hilbert

    ours = np.asarray(S.hilbert_analytic(jnp.asarray(sig), axis=0))
    ref = sp_hilbert(sig, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("num", [256, 300, 1024, 511])
def test_resample_matches_scipy(sig, num):
    from scipy.signal import resample as sp_resample

    x = sig[:, 0]
    ours = np.asarray(S.resample(jnp.asarray(x), num))
    ref = sp_resample(x, num)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_plv_known_signal():
    """Two perfectly phase-locked channels → PLV 1; independent noise ≈ low."""
    t = np.linspace(0, 4, 1000)
    r = np.random.default_rng(1)
    base = np.sin(2 * np.pi * 10 * t)
    locked = np.sin(2 * np.pi * 10 * t + 0.7)
    noise = r.standard_normal(1000)
    x = np.stack([base, locked, noise], axis=-1)[None]  # (1 epoch, T, 3)
    plv = np.asarray(S.plv_matrix(S.hilbert_analytic(jnp.asarray(x), axis=-2)))
    assert plv[0, 1] > 0.99
    assert plv[0, 2] < 0.3
    assert np.allclose(np.diag(plv), 1.0, atol=1e-6)


def test_wpli_zero_lag_suppressed():
    """WPLI of zero-phase-lag (instantaneous) coupling is ~0; quarter-cycle
    lag gives high WPLI — the defining property vs PLV."""
    t = np.linspace(0, 4, 1000)
    base = np.sin(2 * np.pi * 8 * t)
    lagged = np.sin(2 * np.pi * 8 * t - np.pi / 2)
    x = np.stack([base, base * 0.9, lagged], axis=-1)[None]
    an = S.hilbert_analytic(jnp.asarray(x), axis=-2)
    wpli = np.asarray(S.wpli_matrix(an))
    assert wpli[0, 2] > 0.9          # quarter-cycle lag
    # zero-lag pair: Im(S) ~ 0 everywhere → ratio not well-defined but small
    plv = np.asarray(S.plv_matrix(an))
    assert plv[0, 1] > 0.99          # PLV sees zero-lag coupling


def test_connectivity_features_dim():
    """18 channels × 3 metrics → the reference's 459-d CONN vector."""
    r = np.random.default_rng(2)
    x = r.standard_normal((4, 250, 18)).astype(np.float32)  # 4 epochs
    feats = np.asarray(S.connectivity_features(jnp.asarray(x)))
    assert feats.shape == (459,)
    mats = np.asarray(S.connectivity_matrices(jnp.asarray(x)))
    assert mats.shape == (18, 18, 3)


def test_band_power_shapes():
    r = np.random.default_rng(3)
    x = r.standard_normal((2, 18, 1000)).astype(np.float32)  # (B, C, T)
    p = S.spectrogram_power(jnp.asarray(x), nperseg=250, noverlap=125)
    freqs = S.rfft_freqs(250, 250.0)
    bands = {"alpha": (8.0, 13.0), "beta": (13.0, 30.0)}
    bp = np.asarray(S.band_power(p, jnp.asarray(freqs), bands))
    assert bp.shape == (2, 18, 2, p.shape[-1])
    assert np.all(bp >= 0)


def test_roi_pipeline():
    r = np.random.default_rng(4)
    V, R, T = 100, 5, 20
    labels = r.integers(0, R + 1, V)
    vols = r.standard_normal((2, T, V)).astype(np.float32)
    mem = S.roi_onehot(labels, R)
    ts = np.asarray(S.roi_timeseries(jnp.asarray(vols), jnp.asarray(mem)))
    assert ts.shape == (2, T, R)
    # oracle: manual mean per ROI
    for rr in range(R):
        mask = labels == rr + 1
        if mask.sum():
            np.testing.assert_allclose(
                ts[..., rr], vols[..., mask].mean(-1), rtol=1e-5, atol=1e-5
            )
    agg = np.asarray(S.roi_aggregate(jnp.asarray(ts), "both"))
    assert agg.shape == (2, 2 * R)


def test_epoch_and_zscore():
    x = jnp.arange(100, dtype=jnp.float32).reshape(100, 1)
    ep = S.epoch_signal(x, 25)
    assert ep.shape == (4, 25, 1)
    z = np.asarray(S.zscore(x, axis=0))
    assert abs(z.mean()) < 1e-6 and abs(z.std() - 1) < 1e-3
