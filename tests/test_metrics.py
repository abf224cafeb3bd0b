"""On-device metrics vs sklearn oracles (the reference computes all of
these with sklearn on host — parity is the contract)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.metrics import (
    auc_roc,
    binary_classification_metrics,
    regression_metrics,
)


@pytest.fixture(params=[0, 1, 2])
def case(request):
    r = np.random.default_rng(request.param)
    n = 64
    logits = r.standard_normal((n, 2)).astype(np.float32) * 2
    labels = r.integers(0, 2, n).astype(np.int32)
    return logits, labels


def test_classification_metrics_match_sklearn(case):
    from scipy.special import softmax
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    logits, labels = case
    m = binary_classification_metrics(jnp.asarray(logits), jnp.asarray(labels))
    preds = logits.argmax(-1)
    probs1 = softmax(logits, axis=-1)[:, 1]
    assert float(m["accuracy"]) == pytest.approx(
        accuracy_score(labels, preds), abs=1e-6)
    assert float(m["f1"]) == pytest.approx(
        f1_score(labels, preds, zero_division=0), abs=1e-5)
    assert float(m["precision"]) == pytest.approx(
        precision_score(labels, preds, zero_division=0), abs=1e-5)
    assert float(m["recall"]) == pytest.approx(
        recall_score(labels, preds, zero_division=0), abs=1e-5)
    assert float(m["auc"]) == pytest.approx(
        roc_auc_score(labels, probs1), abs=1e-5)
    # specificity == recall of the negative class
    assert float(m["specificity"]) == pytest.approx(
        recall_score(1 - labels, 1 - preds, zero_division=0), abs=1e-5)


def test_auc_with_ties_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    scores = np.asarray([0.1, 0.5, 0.5, 0.5, 0.9, 0.9, 0.2, 0.7])
    labels = np.asarray([0, 0, 1, 1, 1, 0, 0, 1])
    ours = float(auc_roc(jnp.asarray(scores), jnp.asarray(labels)))
    assert ours == pytest.approx(roc_auc_score(labels, scores), abs=1e-6)


def test_masked_metrics_ignore_padding(case):
    logits, labels = case
    pad_logits = np.concatenate([logits, 100 * np.ones((8, 2), np.float32)])
    pad_labels = np.concatenate([labels, np.zeros(8, np.int32)])
    w = np.concatenate([np.ones(len(labels)), np.zeros(8)]).astype(np.float32)
    m_ref = binary_classification_metrics(jnp.asarray(logits),
                                          jnp.asarray(labels))
    m_pad = binary_classification_metrics(jnp.asarray(pad_logits),
                                          jnp.asarray(pad_labels),
                                          jnp.asarray(w))
    for k in m_ref:
        assert float(m_pad[k]) == pytest.approx(float(m_ref[k]), abs=1e-5), k


def test_regression_metrics_match_sklearn():
    from sklearn.metrics import (
        mean_absolute_error,
        mean_squared_error,
        r2_score,
    )

    r = np.random.default_rng(3)
    t = r.standard_normal(32)
    p = t + 0.3 * r.standard_normal(32)
    m = regression_metrics(jnp.asarray(p), jnp.asarray(t))
    assert float(m["mse"]) == pytest.approx(mean_squared_error(t, p), abs=1e-5)
    assert float(m["mae"]) == pytest.approx(mean_absolute_error(t, p), abs=1e-5)
    assert float(m["r2"]) == pytest.approx(r2_score(t, p), abs=1e-5)
