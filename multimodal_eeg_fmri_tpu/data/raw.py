"""Turnkey raw-recording → tri-modal feature pathway.

The reference consumes features precomputed by MATLAB/FieldTrip; this module
generates the same feature tensors from raw continuous EEG on device
(BASELINE configs #2/#3: "bandpass filter + STFT spectrogram batch",
"normalization + ROI timeseries"), so the raw-signal and .mat-file pathways
converge on identical dataset dicts:

raw (N, T, C) @ fs →
  per band b: zero-phase SOS band-pass → epoch → Hilbert →
    PLV/COH/WPLI upper-triangle features (conn)
  broadband: epoch → mean over epochs (ERP (T_epoch, C))
  spectrogram: STFT power → per-band power over time (PW)

Everything is one jitted function of the raw batch; shapes are static per
(fs, epoch_len, bands) so XLA compiles it once per configuration.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.ops import signal as S


def make_raw_eeg_featurizer(
    fs: float = 250.0,
    epoch_len: int = 250,
    bands: Optional[Mapping[str, Tuple[float, float]]] = None,
    conn_band: str = "alpha",
    nperseg: int = 128,
    filter_order: int = 4,
):
    """Build a jitted ``featurize(raw (N, T, C)) -> {'erp','pw','conn'}``.

    - erp: (N, epoch_len, C) epoch-averaged broadband waveform
    - pw:  (N, frames, C·n_bands) band-power time series (channels-last)
    - conn: (N, 3·C(C,2)) PLV/COH/WPLI of the ``conn_band``-limited signal
    """
    bands = dict(bands or {
        "delta": (1.0, 4.0), "theta": (4.0, 8.0), "alpha": (8.0, 13.0),
        "beta": (13.0, 30.0), "gamma": (30.0, 45.0),
    })
    # host-side filter design per band (compile-time constants)
    sos_zi = {b: S.butter_bandpass_sos(lo, hi, fs, filter_order)
              for b, (lo, hi) in bands.items()}
    freqs = jnp.asarray(S.rfft_freqs(nperseg, fs))

    def featurize(raw: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        N, T, C = raw.shape
        # ERP: broadband epochs, averaged per recording
        epochs = jax.vmap(lambda x: S.epoch_signal(x, epoch_len))(raw)
        erp = jnp.mean(epochs, axis=1)

        # PW: spectrogram power → band power over frames
        spec = S.spectrogram_power(
            jnp.moveaxis(raw, -1, -2), nperseg=nperseg,
            noverlap=nperseg // 2)                       # (N, C, F, frames)
        bp = S.band_power(spec, freqs, bands)            # (N, C, B, frames)
        pw = bp.reshape(N, -1, bp.shape[-1]).transpose(0, 2, 1)

        # CONN: band-limited epoched connectivity
        sos, zi = sos_zi[conn_band]
        banded = jnp.moveaxis(
            S.sosfiltfilt(sos, jnp.moveaxis(raw, 1, 0), zi), 0, 1)
        banded_epochs = jax.vmap(lambda x: S.epoch_signal(x, epoch_len))(
            banded)
        conn = jax.vmap(S.connectivity_features)(banded_epochs)
        return {"erp": erp, "pw": pw, "conn": conn}

    return jax.jit(featurize)


def raw_recordings_to_dataset(
    raw: np.ndarray,          # (N, T, C) continuous recordings
    labels: np.ndarray,       # (N,)
    subjects: Optional[np.ndarray] = None,
    **featurizer_kwargs,
) -> Dict[str, np.ndarray]:
    """One call: raw batch → training-ready tri-modal dataset dict."""
    featurize = make_raw_eeg_featurizer(**featurizer_kwargs)
    feats = jax.device_get(featurize(jnp.asarray(raw, jnp.float32)))
    out = {k: np.asarray(v) for k, v in feats.items()}
    out["label"] = np.asarray(labels, np.int32)
    out["subject"] = (np.asarray(subjects, np.int32) if subjects is not None
                      else np.arange(1, len(labels) + 1, dtype=np.int32))
    return out
