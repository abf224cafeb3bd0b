"""Streaming featurizer: chunked-causal == one-shot oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.data.streaming import (
    make_streaming_featurizer,
    stream_session,
)
from multimodal_eeg_fmri_tpu.ops import signal as S

FS, EPOCH, CHUNK, C = 250.0, 250, 50, 6


@pytest.fixture(scope="module")
def raw():
    r = np.random.default_rng(0)
    return r.standard_normal((4 * EPOCH, C)).astype(np.float32)


def test_sosfilt_carry_matches_oneshot_and_scipy(raw):
    """Chunk boundaries must be invisible: N sequential carried calls equal
    one whole-signal sosfilt, and both match scipy with explicit zi."""
    from scipy.signal import sosfilt as scipy_sosfilt

    sos, _ = S.butter_bandpass_sos(8.0, 13.0, FS, 4)
    zi = jnp.zeros((sos.shape[0], 2, C), jnp.float32)
    pieces = []
    z = zi
    for k in range(0, raw.shape[0], CHUNK):
        y, z = S.sosfilt(sos, jnp.asarray(raw[k:k + CHUNK]), z,
                         return_zf=True)
        pieces.append(np.asarray(y))
    streamed = np.concatenate(pieces, axis=0)

    oneshot = np.asarray(S.sosfilt(sos, jnp.asarray(raw)))
    np.testing.assert_allclose(streamed, oneshot, rtol=1e-5, atol=1e-5)

    ref, _ = scipy_sosfilt(sos, raw.astype(np.float64), axis=0,
                           zi=np.zeros((sos.shape[0], 2, C)))
    np.testing.assert_allclose(streamed, ref, rtol=1e-4, atol=1e-4)


def test_epoch_emission_schedule(raw):
    init, step = make_streaming_featurizer(
        fs=FS, epoch_len=EPOCH, chunk_len=CHUNK)
    outs = stream_session(jnp.asarray(raw), CHUNK, init, step)
    ready = np.asarray(outs["ready"])
    per_epoch = EPOCH // CHUNK
    expect = np.zeros_like(ready)
    expect[per_epoch - 1::per_epoch] = True
    np.testing.assert_array_equal(ready, expect)


def test_streamed_features_match_offline_causal(raw):
    """Each emitted epoch's features must equal computing the SAME causal
    pipeline offline on the full signal, sliced to that epoch."""
    init, step = make_streaming_featurizer(
        fs=FS, epoch_len=EPOCH, chunk_len=CHUNK)
    outs = stream_session(jnp.asarray(raw), CHUNK, init, step)
    ready = np.asarray(outs["ready"])
    idx = np.nonzero(ready)[0]

    # offline causal reference
    sos, _ = S.butter_bandpass_sos(8.0, 13.0, FS, 4)
    alpha_full = np.asarray(S.sosfilt(sos, jnp.asarray(raw)))
    freqs = jnp.asarray(S.rfft_freqs(128, FS))
    bands = {"delta": (1.0, 4.0), "theta": (4.0, 8.0), "alpha": (8.0, 13.0),
             "beta": (13.0, 30.0), "gamma": (30.0, 45.0)}

    for e, k in enumerate(idx):
        lo, hi = e * EPOCH, (e + 1) * EPOCH
        # ERP: raw epoch waveform
        np.testing.assert_allclose(np.asarray(outs["erp"][k]), raw[lo:hi],
                                   rtol=1e-6)
        # PW: band power of the raw epoch
        spec = S.spectrogram_power(jnp.asarray(raw[lo:hi]).T[None],
                                   nperseg=128, noverlap=64)
        bp = S.band_power(spec, freqs, bands)
        pw_ref = np.asarray(bp[0].reshape(-1, bp.shape[-1]).T)
        np.testing.assert_allclose(np.asarray(outs["pw"][k]), pw_ref,
                                   rtol=2e-4, atol=1e-5)
        # CONN: connectivity of the causally-filtered epoch
        conn_ref = np.asarray(S.connectivity_features(
            jnp.asarray(alpha_full[lo:hi])[None]))
        np.testing.assert_allclose(np.asarray(outs["conn"][k]), conn_ref,
                                   rtol=2e-3, atol=2e-4)


def test_vmapped_parallel_streams(raw):
    """Many bedside streams batch with vmap; each equals its solo run."""
    init, step = make_streaming_featurizer(
        fs=FS, epoch_len=EPOCH, chunk_len=CHUNK)
    r = np.random.default_rng(1)
    raws = np.stack([raw, r.standard_normal(raw.shape).astype(np.float32)])

    solo = [stream_session(jnp.asarray(x), CHUNK, init, step) for x in raws]

    states = jax.vmap(lambda _: init(C))(jnp.arange(2))
    chunks = raws.reshape(2, -1, CHUNK, C).transpose(1, 0, 2, 3)
    _, outs = jax.lax.scan(
        lambda s, ch: jax.vmap(step)(s, ch), states, jnp.asarray(chunks))
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(outs["conn"])[:, i], np.asarray(solo[i]["conn"]),
            rtol=1e-4, atol=1e-5)


def test_rejects_bad_chunking():
    with pytest.raises(ValueError, match="divide"):
        make_streaming_featurizer(epoch_len=250, chunk_len=49)
    init, step = make_streaming_featurizer(epoch_len=250, chunk_len=50)
    with pytest.raises(ValueError, match="multiple"):
        stream_session(jnp.zeros((251, 4)), 50, init, step)
