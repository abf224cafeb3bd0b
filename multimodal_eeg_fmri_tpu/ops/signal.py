"""On-device signal processing.

The reference *loads* precomputed features — MATLAB/FieldTrip produced the
power spectra, ERP averages and PLV/COH/WPLI connectivity that
``eeg_data_utils.py`` reads from ``.mat`` files, and some external pipeline
produced the fMRI ROI CSVs (SURVEY §7 scope note). This module makes the
framework able to *generate* those features on device, so raw-signal and
precomputed-file pathways converge on the same tensors and preprocessing
fuses into the training step (BASELINE north star).

Everything is batched, channels-last, jit/vmap-safe, and avoids data-
dependent shapes. Filter *design* (Butterworth coefficients, lfilter initial
conditions) is host-side numpy — those are compile-time constants; the
*filtering* runs on device.

Parity contract (tests/test_signal.py): matches scipy.signal
(lfilter/filtfilt/hilbert/resample/stft) and reference-formula connectivity
within float tolerance.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# IIR filtering: lfilter / filtfilt  (zero-phase bandpass for EEG bands)
# ---------------------------------------------------------------------------

def butter_bandpass(low: float, high: float, fs: float, order: int = 4):
    """Host-side Butterworth band-pass design (scipy). Returns (b, a, zi)
    as numpy arrays; zi is the lfilter_zi steady-state template."""
    from scipy.signal import butter, lfilter_zi

    b, a = butter(order, [low, high], btype="bandpass", fs=fs)
    zi = lfilter_zi(b, a)
    return (np.asarray(b, np.float64), np.asarray(a, np.float64),
            np.asarray(zi, np.float64))


def lfilter(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray,
            zi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Direct-form-II-transposed IIR filter along axis 0 of ``x`` (T, ...).

    A linear recurrence is inherently sequential; on TPU we express it as a
    ``lax.scan`` whose body is a handful of VPU FMAs over the batched trailing
    dims — the batch dimension, not time, carries the vector parallelism.
    Matches ``scipy.signal.lfilter`` (with matching ``zi``) to float64
    round-off — **when x64 is enabled**.

    CPU-oracle utility: the expanded transfer-function form of a high-order
    band-pass is numerically unstable in float32 (the very reason the device
    path uses the SOS cascade — ``sosfiltfilt``/``bandpass_filtfilt``), and
    without ``jax.enable_x64()`` JAX silently downcasts the float64 math
    here to float32. Use this under an x64 context on CPU for parity
    testing; use the SOS functions on TPU.
    """
    if not jax.config.jax_enable_x64:
        import warnings

        warnings.warn(
            "lfilter/filtfilt run in float32 without jax.enable_x64(); "
            "high-order transfer-function filtering is unstable in f32 — "
            "use sosfiltfilt/bandpass_filtfilt (the device path) instead",
            stacklevel=2)
    b = jnp.asarray(b, jnp.float64)
    a = jnp.asarray(a, jnp.float64)
    b = b / a[0]
    a = a / a[0]
    n = b.shape[0]
    xt = x.astype(jnp.float64)
    state_shape = (n - 1,) + xt.shape[1:]
    if zi is None:
        z0 = jnp.zeros(state_shape, jnp.float64)
    elif zi.ndim == 1:  # (n-1,) steady-state template, broadcast over batch
        z0 = jnp.broadcast_to(
            zi.reshape((n - 1,) + (1,) * (xt.ndim - 1)), state_shape
        ).astype(jnp.float64)
    else:  # full per-sample state (n-1, ...)
        z0 = zi.astype(jnp.float64)

    def step(z, xk):
        yk = b[0] * xk + z[0]
        znew = [b[i] * xk - a[i] * yk + (z[i] if i < n - 1 else 0.0)
                for i in range(1, n)]
        return jnp.stack(znew), yk

    _, y = jax.lax.scan(step, z0, xt)
    return y.astype(x.dtype)


def filtfilt(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray,
             zi: jnp.ndarray, padlen: Optional[int] = None) -> jnp.ndarray:
    """Zero-phase forward-backward filtering along axis 0, matching
    ``scipy.signal.filtfilt`` defaults (odd-reflection padding,
    padlen = 3·max(len(a), len(b)), steady-state initial conditions)."""
    n = max(b.shape[0], a.shape[0])
    if padlen is None:
        padlen = 3 * n
    T = x.shape[0]
    if T <= padlen:
        raise ValueError(f"input length {T} must exceed padlen {padlen}")
    # odd extension: 2*x[0] - x[padlen:0:-1] … 2*x[-1] - x[-2:-padlen-2:-1]
    front = 2 * x[:1] - x[1 : padlen + 1][::-1]
    back = 2 * x[-1:] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([front, x, back], axis=0)

    zi_shaped = zi.reshape((zi.shape[0],) + (1,) * (x.ndim - 1))
    y = lfilter(b, a, ext, zi=zi_shaped * ext[0][None])
    y = y[::-1]
    y = lfilter(b, a, y, zi=zi_shaped * y[0][None])
    y = y[::-1]
    return y[padlen : padlen + T]


# ---------------------------------------------------------------------------
# Second-order sections — the float32-stable form (TPU has no float64)
# ---------------------------------------------------------------------------

def butter_bandpass_sos(low: float, high: float, fs: float, order: int = 4):
    """Host-side Butterworth design in cascaded second-order sections.
    A high-order bandpass expanded to a single transfer function is
    numerically unstable in float32 (poles cluster near the unit circle);
    the SOS cascade is the standard stable factorization and is what the
    TPU path uses. Returns (sos (S,6), zi (S,2))."""
    from scipy.signal import butter, sosfilt_zi

    sos = butter(order, [low, high], btype="bandpass", fs=fs, output="sos")
    zi = sosfilt_zi(sos)
    return np.asarray(sos, np.float64), np.asarray(zi, np.float64)


def sosfilt(sos: np.ndarray, x: jnp.ndarray,
            zi: Optional[jnp.ndarray] = None,
            return_zf: bool = False):
    """Cascaded biquad filtering along axis 0 of ``x`` (T, ...), matching
    ``scipy.signal.sosfilt``. ``sos`` is a HOST numpy array — its
    coefficients become compile-time constants; the scan body is S fused
    biquads of VPU FMAs over the batched trailing dims.

    ``return_zf=True`` also returns the final filter state ``(y, zf)`` —
    scipy's ``sosfilt(..., zi=...)`` pair form — so a caller can continue
    the SAME filter on the next chunk (the streaming featurizer's carry)."""
    sos = np.asarray(sos)
    S_ = sos.shape[0]
    coeff = [tuple(float(c) for c in row) for row in sos]
    xt = x
    state_shape = (S_, 2) + x.shape[1:]
    if zi is None:
        z0 = jnp.zeros(state_shape, x.dtype)
    elif zi.ndim == 2:  # (S, 2) steady-state template
        z0 = jnp.broadcast_to(
            zi.reshape((S_, 2) + (1,) * (x.ndim - 1)), state_shape
        ).astype(x.dtype)
    else:  # full per-sample state (S, 2, ...)
        z0 = zi.astype(x.dtype)

    def step(z, xk):
        yk = xk
        zs = []
        for s in range(S_):
            b0, b1, b2, _, a1, a2 = coeff[s]
            out = b0 * yk + z[s, 0]
            z0_new = b1 * yk - a1 * out + z[s, 1]
            z1_new = b2 * yk - a2 * out
            zs.append(jnp.stack([z0_new, z1_new]))
            yk = out
        return jnp.stack(zs), yk

    zf, y = jax.lax.scan(step, z0, xt)
    return (y, zf) if return_zf else y


def sosfiltfilt(sos: np.ndarray, x: jnp.ndarray, zi: np.ndarray,
                padlen: Optional[int] = None) -> jnp.ndarray:
    """Zero-phase forward-backward biquad-cascade filtering along axis 0,
    matching ``scipy.signal.sosfiltfilt`` defaults (odd-reflection padding,
    steady-state per-section initial conditions)."""
    sos = np.asarray(sos)
    if padlen is None:
        n_sections = sos.shape[0]
        ntaps = 2 * n_sections + 1
        ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
        padlen = 3 * int(ntaps)
    T = x.shape[0]
    if T <= padlen:
        raise ValueError(f"input length {T} must exceed padlen {padlen}")
    front = 2 * x[:1] - x[1 : padlen + 1][::-1]
    back = 2 * x[-1:] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([front, x, back], axis=0)

    zi_shaped = jnp.asarray(
        zi.reshape((sos.shape[0], 2) + (1,) * (x.ndim - 1)), dtype=x.dtype
    )
    y = sosfilt(sos, ext, zi=zi_shaped * ext[0][None, None])
    y = y[::-1]
    y = sosfilt(sos, y, zi=zi_shaped * y[0][None, None])
    y = y[::-1]
    return y[padlen : padlen + T]


def bandpass_filtfilt(
    x: jnp.ndarray,  # (..., T, C) — time on axis -2
    low: float,
    high: float,
    fs: float,
    order: int = 4,
) -> jnp.ndarray:
    """Zero-phase Butterworth band-pass over the time axis of a batched
    (..., T, C) array. Runs as a cascade of second-order sections — stable
    in float32 (the TPU native dtype); coefficients designed on host once
    per (band, fs)."""
    sos, zi = butter_bandpass_sos(low, high, fs, order)
    moved = jnp.moveaxis(x, -2, 0)  # (T, ..., C)
    y = sosfiltfilt(sos, moved, zi)
    return jnp.moveaxis(y, 0, -2)


# ---------------------------------------------------------------------------
# Spectral: frame / STFT / spectrogram / band power
# ---------------------------------------------------------------------------

def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Slide windows over the time axis (first axis): (T, ...) →
    (n_frames, frame_len, ...). Gather-based; static shapes."""
    T = x.shape[0]
    n_frames = 1 + (T - frame_len) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return x[idx]


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (scipy.signal.stft default)."""
    return (0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n))).astype(dtype)


def stft(
    x: jnp.ndarray,  # (..., T) — time LAST here (spectral convention)
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    scale: bool = True,
) -> jnp.ndarray:
    """Short-time Fourier transform matching ``scipy.signal.stft`` with
    ``boundary=None, padded=False`` — returns (..., freq, frames) complex.

    Framing is a reshape+gather; the FFT batches over (batch × channel ×
    frame) and maps onto XLA's native TPU FFT.
    """
    if noverlap is None:
        noverlap = nperseg // 2
    hop = nperseg - noverlap
    if window is None:
        window = hann_window(nperseg)
    T = x.shape[-1]
    n_frames = 1 + (T - nperseg) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(nperseg)[None, :]
    frames = x[..., idx]                      # (..., frames, nperseg)
    frames = frames * window
    spec = jnp.fft.rfft(frames, axis=-1)      # (..., frames, freq)
    if scale:
        spec = spec / jnp.sum(window)         # scipy 'spectrum'-mode scaling
    return jnp.moveaxis(spec, -1, -2)         # (..., freq, frames)


def spectrogram_power(
    x: jnp.ndarray, nperseg: int = 256, noverlap: Optional[int] = None
) -> jnp.ndarray:
    """Power spectrogram |STFT|² — the ``powspctrm``-style feature the
    reference loads from FieldTrip .mat files (``eeg_data_utils.py:86-119``)."""
    s = stft(x, nperseg, noverlap)
    return (s.real**2 + s.imag**2).astype(jnp.float32)


def band_power(
    spec_power: jnp.ndarray,  # (..., freq, frames)
    freqs: jnp.ndarray,       # (freq,) bin centers in Hz
    bands: Dict[str, Tuple[float, float]],
) -> jnp.ndarray:
    """Average power per canonical EEG band → (..., n_bands, frames).
    Band table mirrors ``EEG_CODE/config.py`` freq bands."""
    outs = []
    for lo, hi in bands.values():
        mask = ((freqs >= lo) & (freqs < hi)).astype(spec_power.dtype)
        denom = jnp.maximum(mask.sum(), 1.0)
        outs.append(
            jnp.einsum("...ft,f->...t", spec_power, mask) / denom
        )
    return jnp.stack(outs, axis=-2)


def rfft_freqs(nperseg: int, fs: float) -> np.ndarray:
    return np.fft.rfftfreq(nperseg, 1.0 / fs)


# ---------------------------------------------------------------------------
# Resampling (Fourier method, scipy.signal.resample parity)
# ---------------------------------------------------------------------------

def resample(x: jnp.ndarray, num: int, axis: int = -1) -> jnp.ndarray:
    """FFT-domain resampling identical to ``scipy.signal.resample`` for real
    inputs: copy min(num, T)//2+1 low-frequency bins, with scipy's
    Nyquist-bin scaling (×2 when downsampling past it, ×½ when upsampling
    splits it), then inverse-rFFT at the new length."""
    T = x.shape[axis]
    ax = axis if axis >= 0 else x.ndim + axis
    X = jnp.fft.rfft(x, axis=ax)
    n_out = num // 2 + 1
    N = min(num, T)
    nyq = N // 2 + 1

    def slice_ax(arr, sl):
        idx = [slice(None)] * arr.ndim
        idx[ax] = sl
        return arr[tuple(idx)]

    Y = slice_ax(X, slice(0, min(nyq, n_out)))
    if N % 2 == 0:
        head = slice_ax(Y, slice(0, N // 2))
        ny = slice_ax(Y, slice(N // 2, N // 2 + 1))
        tail = slice_ax(Y, slice(N // 2 + 1, None))
        if num < T:
            ny = ny * 2.0
        elif num > T:
            ny = ny * 0.5
        Y = jnp.concatenate([head, ny, tail], axis=ax)
    pad = n_out - Y.shape[ax]
    if pad > 0:
        pad_shape = list(Y.shape)
        pad_shape[ax] = pad
        Y = jnp.concatenate([Y, jnp.zeros(pad_shape, Y.dtype)], axis=ax)
    y = jnp.fft.irfft(Y, n=num, axis=ax)
    return (y * (num / T)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization / epoching
# ---------------------------------------------------------------------------

def zscore(x: jnp.ndarray, axis=None, eps: float = 1e-8) -> jnp.ndarray:
    mu = jnp.mean(x, axis=axis, keepdims=True)
    sd = jnp.std(x, axis=axis, keepdims=True)
    return (x - mu) / (sd + eps)


def epoch_signal(x: jnp.ndarray, epoch_len: int, hop: Optional[int] = None):
    """Cut a continuous (T, C) recording into (n_epochs, epoch_len, C)."""
    return frame_signal(x, epoch_len, hop or epoch_len)


# ---------------------------------------------------------------------------
# Analytic signal + connectivity (PLV / COH / WPLI)
# ---------------------------------------------------------------------------

def hilbert_analytic(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Analytic signal via the FFT method (``scipy.signal.hilbert``)."""
    T = x.shape[axis]
    X = jnp.fft.fft(x.astype(jnp.float32), axis=axis)
    h = np.zeros(T)
    if T % 2 == 0:
        h[0] = h[T // 2] = 1
        h[1 : T // 2] = 2
    else:
        h[0] = 1
        h[1 : (T + 1) // 2] = 2
    shape = [1] * x.ndim
    shape[axis if axis >= 0 else x.ndim + axis] = T
    return jnp.fft.ifft(X * jnp.asarray(h).reshape(shape), axis=axis)


def _pair_upper_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(n, k=1)
    return iu[0], iu[1]


def plv_matrix(analytic: jnp.ndarray) -> jnp.ndarray:
    """Phase-locking value over trials+time.

    ``analytic``: (..., E, T, C) complex — epochs × time × channels.
    PLV_ij = |mean_t,e exp(i(φ_i - φ_j))|. Computed as a Gram matrix of the
    unit-phase signals — one complex matmul on the MXU instead of C(n,2)
    pairwise loops.
    """
    phase = analytic / jnp.maximum(jnp.abs(analytic), 1e-12)
    z = phase.reshape(*phase.shape[:-3], -1, phase.shape[-1])  # (..., E*T, C)
    n = z.shape[-2]
    gram = jnp.einsum("...tc,...td->...cd", z, jnp.conj(z)) / n
    return jnp.abs(gram)


def coherence_matrix(analytic: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-squared-root coherence |S_ij| / sqrt(S_ii S_jj), cross-
    spectra averaged over epochs and time of the analytic signal."""
    z = analytic.reshape(*analytic.shape[:-3], -1, analytic.shape[-1])
    n = z.shape[-2]
    S = jnp.einsum("...tc,...td->...cd", z, jnp.conj(z)) / n
    p = jnp.real(jnp.einsum("...cc->...c", S))
    denom = jnp.sqrt(p[..., :, None] * p[..., None, :])
    return jnp.abs(S) / jnp.maximum(denom, 1e-12)


def wpli_matrix(analytic: jnp.ndarray) -> jnp.ndarray:
    """Weighted phase-lag index: |E[Im S_ij]| / E[|Im S_ij|], expectation
    over epochs × time."""
    z = analytic.reshape(*analytic.shape[:-3], -1, analytic.shape[-1])
    # per-sample cross spectra imag part: Im(z_i * conj(z_j))
    cross_im = jnp.einsum("...tc,...td->...tcd", z.imag, z.real) - jnp.einsum(
        "...tc,...td->...tcd", z.real, z.imag
    )
    num = jnp.abs(jnp.mean(cross_im, axis=-3))
    den = jnp.mean(jnp.abs(cross_im), axis=-3)
    return num / jnp.maximum(den, 1e-12)


def connectivity_features(
    x: jnp.ndarray,  # (E, T, C) epoched band-limited real signal
    metrics: Tuple[str, ...] = ("plv", "coh", "wpli"),
) -> jnp.ndarray:
    """Upper-triangle connectivity feature vector, concatenated per metric —
    the reference's 459-d CONN layout (3 metrics × C(18,2) pairs,
    ``EEG_CODE/eeg_data_utils.py:46-83``)."""
    analytic = hilbert_analytic(x, axis=-2)  # along time
    C = x.shape[-1]
    iu, ju = _pair_upper_indices(C)
    feats = []
    table = {"plv": plv_matrix, "coh": coherence_matrix, "wpli": wpli_matrix}
    for m in metrics:
        mat = table[m](analytic)
        feats.append(mat[..., iu, ju])
    return jnp.concatenate(feats, axis=-1)


def connectivity_matrices(
    x: jnp.ndarray, metrics: Tuple[str, ...] = ("plv", "coh", "wpli")
) -> jnp.ndarray:
    """(…, C, C, M) stacked matrices — input format of the GNN encoder."""
    analytic = hilbert_analytic(x, axis=-2)
    table = {"plv": plv_matrix, "coh": coherence_matrix, "wpli": wpli_matrix}
    return jnp.stack([table[m](analytic) for m in metrics], axis=-1)


# ---------------------------------------------------------------------------
# fMRI: volume normalization + ROI time-series reduction
# ---------------------------------------------------------------------------

def normalize_volumes(vols: jnp.ndarray, axis=(-3, -2, -1),
                      eps: float = 1e-8) -> jnp.ndarray:
    """Per-volume z-scoring of 4D (..., T, X, Y, Z) BOLD data."""
    return zscore(vols, axis=axis, eps=eps)


def roi_onehot(roi_labels: np.ndarray, n_rois: int) -> np.ndarray:
    """(V,) voxel→ROI labels (0 = background) → (V, R) membership matrix
    normalized per ROI, so ROI means become ONE matmul."""
    onehot = (roi_labels[:, None] == np.arange(1, n_rois + 1)[None, :]
              ).astype(np.float32)
    return onehot / np.maximum(onehot.sum(axis=0, keepdims=True), 1.0)


def roi_timeseries(
    vols_flat: jnp.ndarray,  # (..., T, V) flattened voxels
    membership: jnp.ndarray,  # (V, R) normalized one-hot
) -> jnp.ndarray:
    """ROI mean time series via matmul on the MXU: (..., T, R)."""
    return jnp.einsum("...tv,vr->...tr", vols_flat, membership)


def roi_aggregate(
    ts: jnp.ndarray, method: str = "both"
) -> jnp.ndarray:
    """Aggregate ROI time series over time: mean / std / both —
    reference ``load_activation_features`` agg (``run_fmri_v11.py:99-104``)."""
    mean = jnp.mean(ts, axis=-2)
    std = jnp.std(ts, axis=-2)
    if method == "mean":
        return mean
    if method == "std":
        return std
    if method == "both":
        return jnp.concatenate([mean, std], axis=-1)
    raise ValueError(f"unknown agg method {method!r}")
