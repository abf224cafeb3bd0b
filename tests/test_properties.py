"""Property-based tests (hypothesis) for the framework's core invariants.

Shapes stay FIXED inside each test (one XLA compile); hypothesis drives the
VALUES. The key property is the one the whole fold-vmapped design rests on:
weight-0 padding rows never change any weighted loss or metric.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.ops.losses import (
    cross_entropy,
    focal_loss,
    label_smoothing_cross_entropy,
    weighted_cross_entropy,
)
from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
)

N, C = 16, 2


def _arrays(draw):
    logits = draw(st.lists(
        st.floats(-8, 8, allow_nan=False, width=32, allow_subnormal=False),
        min_size=N * C, max_size=N * C))
    labels = draw(st.lists(st.integers(0, C - 1), min_size=N, max_size=N))
    weights = draw(st.lists(
        st.floats(np.float32(0.1), np.float32(3.0), allow_nan=False, width=32, allow_subnormal=False),
        min_size=N, max_size=N))
    return (np.asarray(logits, np.float32).reshape(N, C),
            np.asarray(labels, np.int32),
            np.asarray(weights, np.float32))


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_padding_rows_never_change_losses(data):
    """Appending junk rows with weight 0 leaves every weighted loss
    unchanged — the invariant behind fixed-shape fold padding."""
    logits, labels, w = _arrays(data.draw)
    junk_logits = np.float32(data.draw(st.floats(-50, 50, allow_nan=False, allow_subnormal=False)))
    pad = 5
    logits_p = np.concatenate(
        [logits, np.full((pad, C), junk_logits, np.float32)])
    labels_p = np.concatenate([labels, np.ones(pad, np.int32)])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])
    cw = np.asarray([1.3, 0.7], np.float32)

    for fn in (
        lambda lo, la, sw: cross_entropy(lo, la, sw),
        lambda lo, la, sw: weighted_cross_entropy(lo, la, cw, sw),
        lambda lo, la, sw: focal_loss(lo, la, sample_weights=sw),
        lambda lo, la, sw: label_smoothing_cross_entropy(
            lo, la, sample_weights=sw),
    ):
        a = float(fn(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.asarray(w)))
        b = float(fn(jnp.asarray(logits_p), jnp.asarray(labels_p),
                     jnp.asarray(w_p)))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_padding_rows_never_change_metrics(data):
    logits, labels, w = _arrays(data.draw)
    pad = 7
    logits_p = np.concatenate([logits, np.zeros((pad, C), np.float32)])
    labels_p = np.concatenate([labels, np.zeros(pad, np.int32)])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])

    a = binary_classification_metrics(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    b = binary_classification_metrics(
        jnp.asarray(logits_p), jnp.asarray(labels_p), jnp.asarray(w_p))
    for k in a:
        np.testing.assert_allclose(float(b[k]), float(a[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_metrics_match_sklearn(data):
    from sklearn.metrics import (
        accuracy_score, f1_score, precision_score, recall_score,
        roc_auc_score)

    logits, labels, w = _arrays(data.draw)
    # ensure both classes appear so AUC/F1 are defined
    labels[0], labels[1] = 0, 1
    m = binary_classification_metrics(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    preds = np.argmax(logits, axis=1)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)[:, 1]
    kw = dict(sample_weight=w)
    np.testing.assert_allclose(
        float(m["accuracy"]), accuracy_score(labels, preds, **kw), atol=1e-6)
    np.testing.assert_allclose(
        float(m["f1"]), f1_score(labels, preds, zero_division=0, **kw),
        atol=1e-6)
    np.testing.assert_allclose(
        float(m["precision"]),
        precision_score(labels, preds, zero_division=0, **kw), atol=1e-6)
    np.testing.assert_allclose(
        float(m["recall"]),
        recall_score(labels, preds, zero_division=0, **kw), atol=1e-6)
    np.testing.assert_allclose(
        float(m["auc"]), roc_auc_score(labels, np.asarray(probs), **kw),
        atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_weighted_ce_matches_torch(data):
    torch = pytest.importorskip("torch")

    logits, labels, w = _arrays(data.draw)
    cw = np.asarray([data.draw(st.floats(np.float32(0.3), np.float32(3.0), width=32, allow_subnormal=False)),
                     data.draw(st.floats(np.float32(0.3), np.float32(3.0), width=32, allow_subnormal=False))], np.float32)
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(cw)))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long),
        weight=torch.tensor(cw))
    np.testing.assert_allclose(ours, float(ref), rtol=2e-5, atol=1e-6)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_zscore_normalizes(seed):
    from multimodal_eeg_fmri_tpu.ops.signal import zscore

    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(2.0, 3.0, size=(4, 64, 6)), jnp.float32)
    z = np.asarray(zscore(x, axis=1))
    np.testing.assert_allclose(z.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=1), 1.0, atol=1e-4)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_native_csv_fuzz_matches_numpy(tmp_path_factory, data):
    """Fuzz the native CSV parser (native/fastio.cpp via ctypes): random
    tables, with/without trailing newline, \\r\\n endings, NaN cells —
    parsed values must match the written matrix (NaN→0), exercising the
    unterminated-final-line path the round-1 advisor flagged."""
    from multimodal_eeg_fmri_tpu.data.native_io import (
        native_available, read_csv_f32)

    if not native_available():
        pytest.skip("native toolchain unavailable")

    rows = data.draw(st.integers(1, 12))
    cols = data.draw(st.integers(1, 8))
    vals = np.asarray(
        data.draw(st.lists(
            st.one_of(
                st.floats(-1e6, 1e6, allow_nan=False, width=32,
                          allow_subnormal=False),
                st.just(float("nan")),
            ),
            min_size=rows * cols, max_size=rows * cols)),
        np.float32).reshape(rows, cols)
    trailing_newline = data.draw(st.booleans())
    crlf = data.draw(st.booleans())

    eol = "\r\n" if crlf else "\n"
    header = ",".join(f"c{i}" for i in range(cols))
    body = eol.join(
        ",".join("nan" if np.isnan(v) else repr(float(v)) for v in row)
        for row in vals)
    text = header + eol + body + (eol if trailing_newline else "")

    d = tmp_path_factory.mktemp("csvfuzz")
    path = d / "t.csv"
    path.write_text(text)

    got = read_csv_f32(path)
    assert got is not None, "native parser returned failure"
    assert got.shape == (rows, cols)
    np.testing.assert_allclose(got, np.nan_to_num(vals), rtol=1e-6,
                               atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_native_mat_parser_matches_scipy(tmp_path_factory, data):
    """Hypothesis-driven MAT v5 round trip: arbitrary numeric dtype, shape
    (1-3 dims), values incl. NaN/inf edges, compression on/off — the
    native parser must agree with scipy.io.loadmat exactly (after the
    loaders' float32 + NaN→0 policy)."""
    from scipy.io import loadmat, savemat

    from multimodal_eeg_fmri_tpu.data.native_io import read_mat_f32

    dtype = data.draw(st.sampled_from(
        [np.float64, np.float32, np.int8, np.uint8, np.int16, np.uint16,
         np.int32, np.int64]))
    ndim = data.draw(st.integers(1, 3))
    shape = tuple(data.draw(st.integers(1, 9)) for _ in range(ndim))
    n = int(np.prod(shape))
    if np.issubdtype(dtype, np.floating):
        elem = st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False, width=32,
                      allow_subnormal=False),
            st.just(float("nan")))
        vals = np.asarray(data.draw(st.lists(
            elem, min_size=n, max_size=n)), dtype).reshape(shape)
    else:
        info = np.iinfo(dtype)
        lo = max(info.min, -(1 << 24))  # keep exactly representable in f32
        hi = min(info.max, 1 << 24)
        vals = np.asarray(data.draw(st.lists(
            st.integers(lo, hi), min_size=n, max_size=n)),
            dtype).reshape(shape)
    compressed = data.draw(st.booleans())

    d = tmp_path_factory.mktemp("matfuzz")
    path = d / "t.mat"
    savemat(str(path), {"x": vals}, do_compression=compressed)

    got = read_mat_f32(path)
    expected = np.nan_to_num(
        np.asarray(loadmat(str(path))["x"], np.float32), nan=0.0)
    assert got is not None, "native parser declined a supported file"
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)
