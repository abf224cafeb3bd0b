"""Online (streaming) raw-EEG featurization for continuous monitoring.

The reference's pipeline — and this framework's ``data/raw.py`` — is
offline: whole recordings arrive at once and are zero-phase filtered
(``sosfiltfilt`` needs future samples). A bedside/monitoring deployment
sees the signal as an endless stream of small chunks instead. This module
is the causal counterpart: fixed-size chunks stream through one jitted
``step`` whose carry holds the biquad filter state (`ops/signal.sosfilt`
``zi``) and a rolling epoch buffer, emitting the same feature triple
(per-epoch ERP waveform, band powers, PLV/COH/WPLI connectivity) every
time an epoch boundary completes.

Design for TPU/XLA:
- ``step`` is shape-static (``chunk_len`` must divide ``epoch_len``), so a
  whole session replays as ONE ``lax.scan`` over its chunk axis — the
  online path and the batch path are literally the same compiled body.
- Features are computed unconditionally and gated by a ``ready`` flag
  (``lax.cond`` would compile both branches anyway); callers read outputs
  where ``ready`` is set.
- Causality contract (tested): the carried-state band signals equal a
  one-shot causal ``sosfilt`` over the concatenated stream *exactly* —
  chunking is invisible. Relative to the offline zero-phase path the
  filters introduce the standard causal group delay; coefficients are
  identical.

Reference analogue: none (SURVEY: MATLAB/FieldTrip preprocessing is
offline batch) — this is framework headroom for production monitoring.
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.ops import signal as S


class StreamState(NamedTuple):
    """Carry of the streaming featurizer (one recording/channel-set)."""

    zi: jnp.ndarray           # (n_bands, S, 2, C) causal filter states
    buf_raw: jnp.ndarray      # (epoch_len, C) broadband epoch buffer
    buf_band: jnp.ndarray     # (n_bands, epoch_len, C) band-limited buffers
    fill: jnp.ndarray         # scalar int32: samples currently buffered
    epoch_idx: jnp.ndarray    # scalar int32: completed epochs so far


def make_streaming_featurizer(
    fs: float = 250.0,
    epoch_len: int = 250,
    chunk_len: int = 50,
    bands: Optional[Mapping[str, Tuple[float, float]]] = None,
    conn_band: str = "alpha",
    nperseg: int = 128,
    filter_order: int = 4,
):
    """Build ``(init, step)`` for online featurization.

    - ``init(n_channels) -> StreamState``
    - ``step(state, chunk (chunk_len, C)) -> (state, out)`` with ``out =
      {"ready", "erp", "pw", "conn"}``; when ``ready`` (a bool scalar) is
      True the feature entries describe the JUST-COMPLETED epoch:
      erp (epoch_len, C) waveform, pw (frames, C·n_bands) band power,
      conn (3·C(C,2),) connectivity of ``conn_band``.

    ``chunk_len`` must divide ``epoch_len`` (static emission schedule).
    Batch many parallel streams with ``jax.vmap`` over state+chunk; replay
    a recorded session with ``jax.lax.scan(step, state, chunks)``.
    """
    if epoch_len % chunk_len:
        raise ValueError(
            f"chunk_len ({chunk_len}) must divide epoch_len ({epoch_len})")
    bands = dict(bands or {
        "delta": (1.0, 4.0), "theta": (4.0, 8.0), "alpha": (8.0, 13.0),
        "beta": (13.0, 30.0), "gamma": (30.0, 45.0),
    })
    if conn_band not in bands:
        raise ValueError(f"conn_band {conn_band!r} not in {sorted(bands)}")
    band_names = list(bands)
    conn_i = band_names.index(conn_band)
    sos_list = [S.butter_bandpass_sos(lo, hi, fs, filter_order)[0]
                for lo, hi in bands.values()]
    n_sections = sos_list[0].shape[0]
    freqs = jnp.asarray(S.rfft_freqs(nperseg, fs))

    def init(n_channels: int) -> StreamState:
        return StreamState(
            zi=jnp.zeros((len(band_names), n_sections, 2, n_channels),
                         jnp.float32),
            buf_raw=jnp.zeros((epoch_len, n_channels), jnp.float32),
            buf_band=jnp.zeros((len(band_names), epoch_len, n_channels),
                               jnp.float32),
            fill=jnp.int32(0),
            epoch_idx=jnp.int32(0),
        )

    def _roll_in(buf, chunk):
        """Shift the rolling buffer left by chunk_len and append."""
        return jnp.concatenate([buf[chunk_len:], chunk], axis=0)

    def step(state: StreamState, chunk: jnp.ndarray):
        chunk = chunk.astype(jnp.float32)
        # causal band filtering with carried per-band state
        # (ops/signal.sosfilt's pair form — scipy sosfilt(..., zi=...))
        new_band, new_zi = [], []
        for i, sos in enumerate(sos_list):
            y, z = S.sosfilt(sos, chunk, state.zi[i], return_zf=True)
            new_band.append(y)
            new_zi.append(z)
        buf_band = jnp.stack([
            _roll_in(state.buf_band[i], new_band[i])
            for i in range(len(band_names))])
        buf_raw = _roll_in(state.buf_raw, chunk)
        fill = state.fill + chunk_len
        ready = fill >= epoch_len

        # features of the (possibly just-completed) buffered epoch
        erp = buf_raw
        spec = S.spectrogram_power(buf_raw.T[None], nperseg=nperseg,
                                   noverlap=nperseg // 2)   # (1, C, F, fr)
        bp = S.band_power(spec, freqs, bands)               # (1, C, B, fr)
        pw = bp[0].reshape(-1, bp.shape[-1]).T              # (fr, C·B)
        conn = S.connectivity_features(buf_band[conn_i][None])

        out = {"ready": ready, "erp": erp, "pw": pw, "conn": conn}
        return StreamState(
            zi=jnp.stack(new_zi),
            buf_raw=buf_raw,
            buf_band=buf_band,
            fill=jnp.where(ready, fill - epoch_len, fill),
            epoch_idx=state.epoch_idx + jnp.where(ready, 1, 0),
        ), out

    return init, step


def stream_session(
    raw: jnp.ndarray,             # (T, C) with T % chunk_len == 0
    chunk_len: int,
    init,
    step,
) -> Dict[str, jnp.ndarray]:
    """Replay a whole recorded session through the online path as ONE
    compiled scan. Returns the per-chunk output stack; epochs are the
    entries where ``out["ready"]`` is True."""
    T, C = raw.shape
    if T % chunk_len:
        raise ValueError(f"T ({T}) must be a multiple of chunk_len")
    chunks = raw.reshape(T // chunk_len, chunk_len, C)
    _, outs = jax.lax.scan(step, init(C), chunks)
    return outs
