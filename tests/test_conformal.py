"""Split-conformal sets: finite-sample coverage, NumPy quantile oracle,
padding invariance, miscalibration robustness."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.conformal import (
    conformal_calibrate,
    conformal_sets,
    coverage_and_size,
)


def _sample_task(r, n, n_classes=3, sharpen=1.0):
    """Probabilities + labels DRAWN FROM those probabilities (honest model
    unless sharpen != 1, which miscalibrates the reported probs)."""
    logits = r.standard_normal((n, n_classes)) * 1.5
    true_p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = np.array([r.choice(n_classes, p=p) for p in true_p])
    rep = np.exp(logits * sharpen)
    rep = rep / rep.sum(-1, keepdims=True)
    return rep.astype(np.float32), labels.astype(np.int32)


@pytest.mark.parametrize("method", ["lac", "aps"])
def test_marginal_coverage(method):
    """Mean coverage over repeated splits ≥ 1−α (and not wildly above)."""
    r = np.random.default_rng(0)
    alpha, covs, sizes = 0.1, [], []
    for _ in range(40):
        p_cal, y_cal = _sample_task(r, 200)
        p_test, y_test = _sample_task(r, 200)
        q = conformal_calibrate(jnp.asarray(p_cal), jnp.asarray(y_cal),
                                alpha=alpha, method=method)
        sets = conformal_sets(jnp.asarray(p_test), q, method=method)
        cov, size = coverage_and_size(sets, jnp.asarray(y_test))
        covs.append(float(cov))
        sizes.append(float(size))
    mean_cov = np.mean(covs)
    assert mean_cov >= 1 - alpha - 0.01, (method, mean_cov)
    assert mean_cov <= 1 - alpha + 0.06, (method, mean_cov)  # not vacuous
    assert 1.0 <= np.mean(sizes) < 3.0  # informative sets on 3 classes


def test_coverage_survives_miscalibration():
    """Overconfident reported probabilities: calibration-free guarantees
    break, the conformal guarantee must not."""
    r = np.random.default_rng(1)
    alpha, covs = 0.1, []
    for _ in range(40):
        p_cal, y_cal = _sample_task(r, 200, sharpen=3.0)
        p_test, y_test = _sample_task(r, 200, sharpen=3.0)
        q = conformal_calibrate(jnp.asarray(p_cal), jnp.asarray(y_cal),
                                alpha=alpha, method="lac")
        sets = conformal_sets(jnp.asarray(p_test), q, method="lac")
        cov, _ = coverage_and_size(sets, jnp.asarray(y_test))
        covs.append(float(cov))
    assert np.mean(covs) >= 1 - alpha - 0.01
    # naive top-1 of the overconfident model under-covers badly (the
    # failure conformal fixes): argmax accuracy is well below 90%
    acc = np.mean(p_test.argmax(-1) == y_test)
    assert acc < 1 - alpha - 0.05


def test_qhat_matches_numpy_oracle():
    r = np.random.default_rng(2)
    p, y = _sample_task(r, 73)
    alpha = 0.17
    q = float(conformal_calibrate(jnp.asarray(p), jnp.asarray(y),
                                  alpha=alpha, method="lac"))
    scores = 1.0 - p[np.arange(len(y)), y]
    n = len(y)
    rank = min(int(np.ceil((n + 1) * (1 - alpha))), n)
    ref = np.sort(scores)[rank - 1]
    assert abs(q - ref) < 1e-6


def test_padding_mask_invariance():
    r = np.random.default_rng(3)
    p, y = _sample_task(r, 100)
    q0 = float(conformal_calibrate(jnp.asarray(p), jnp.asarray(y),
                                   alpha=0.1))
    p_pad = np.concatenate([p, np.full((25, 3), 0.99, np.float32)])
    y_pad = np.concatenate([y, np.zeros(25, np.int32)])
    w = np.concatenate([np.ones(100, np.float32), np.zeros(25, np.float32)])
    q1 = float(conformal_calibrate(jnp.asarray(p_pad), jnp.asarray(y_pad),
                                   alpha=0.1, weights=jnp.asarray(w)))
    assert abs(q0 - q1) < 1e-6

    sets = conformal_sets(jnp.asarray(p_pad), q1)
    cov0, size0 = coverage_and_size(
        conformal_sets(jnp.asarray(p), q1), jnp.asarray(y))
    cov1, size1 = coverage_and_size(sets, jnp.asarray(y_pad),
                                    weights=jnp.asarray(w))
    assert abs(float(cov0) - float(cov1)) < 1e-6
    assert abs(float(size0) - float(size1)) < 1e-6


def test_clinical_report_shapes_and_masking():
    """clinical_report over a synthetic CVResult-shaped object: per-fold
    arrays, mean±std summary, padded rows ignored, no-outputs error."""
    from types import SimpleNamespace

    from multimodal_eeg_fmri_tpu.report.clinical import clinical_report

    r = np.random.default_rng(6)
    F, n = 4, 60
    probs = r.dirichlet(np.ones(2), size=(F, n)).astype(np.float32)
    labels = (r.random((F, n)) < probs[..., 1]).astype(np.int64)
    weight = np.ones((F, n), np.float32)
    weight[:, -10:] = 0.0  # padded tail
    probs[:, -10:] = 0.99  # garbage in the padding — must not matter
    res = SimpleNamespace(test_probs=probs, test_labels=labels,
                          test_weight=weight)
    rep = clinical_report(res, alpha=0.2)
    for k in ("ece", "brier", "opt_threshold", "opt_f1",
              "conformal_coverage", "conformal_set_size"):
        assert rep["per_fold"][k].shape == (F,)
        assert k in rep["summary"]
    # honest probs → coverage near 1−α on average (LOFO calibration)
    assert rep["summary"]["conformal_coverage"][0] > 0.7

    # padding invariance: slicing the padding off changes nothing
    res2 = SimpleNamespace(test_probs=probs[:, :-10],
                           test_labels=labels[:, :-10],
                           test_weight=weight[:, :-10])
    rep2 = clinical_report(res2, alpha=0.2)
    for k, v in rep["per_fold"].items():
        np.testing.assert_allclose(v, rep2["per_fold"][k], atol=1e-6,
                                   err_msg=k)

    with pytest.raises(ValueError, match="no per-sample"):
        clinical_report(SimpleNamespace(test_probs=None, test_labels=None,
                                        test_weight=None))


def test_clinical_report_single_fold_falls_back_to_loo():
    """n_folds == 1 has no other fold to calibrate on; the report must
    fall back to leave-one-sample-out conformal instead of crashing
    (found in review: conformal_calibrate on zero rows raised IndexError
    after pipelines started calling clinical_report unconditionally)."""
    from types import SimpleNamespace

    from multimodal_eeg_fmri_tpu.report.clinical import clinical_report

    r = np.random.default_rng(8)
    probs, labels = _sample_task(r, 80, n_classes=2)
    res = SimpleNamespace(test_probs=probs[None], test_labels=labels[None],
                          test_weight=np.ones((1, 80), np.float32))
    rep = clinical_report(res, alpha=0.2)
    assert rep["per_fold"]["conformal_coverage"].shape == (1,)
    assert 0.6 <= rep["per_fold"]["conformal_coverage"][0] <= 1.0


def test_pooled_clinical_report_loo_coverage():
    """Pooled (LOOCV-style) report: LOO-conformal coverage near 1−α on
    honest probabilities, all fields present."""
    from multimodal_eeg_fmri_tpu.report.clinical import (
        pooled_clinical_report,
    )

    r = np.random.default_rng(7)
    covs = []
    for _ in range(15):
        p, y = _sample_task(r, 120, n_classes=2)
        rep = pooled_clinical_report(p, y, alpha=0.2)
        covs.append(rep["conformal_coverage"])
    assert np.mean(covs) >= 0.8 - 0.02
    assert np.mean(covs) <= 0.8 + 0.08
    for k in ("ece", "brier", "opt_threshold", "opt_f1",
              "conformal_set_size"):
        assert k in rep


def test_ensemble_uncertainty_decomposition():
    """Hand-NumPy oracle + the two defining limits: identical members have
    zero mutual information; confident-but-contradictory members put all
    uncertainty in the epistemic term."""
    from multimodal_eeg_fmri_tpu.report.uncertainty import (
        ensemble_uncertainty,
    )

    r = np.random.default_rng(5)
    probs = r.dirichlet(np.ones(3), size=(4, 50)).astype(np.float32)
    out = ensemble_uncertainty(jnp.asarray(probs))

    def ent(p):
        return -(p * np.log(np.clip(p, 1e-12, 1))).sum(-1)

    np.testing.assert_allclose(np.asarray(out["predictive_entropy"]),
                               ent(probs.mean(0)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["expected_entropy"]),
                               ent(probs).mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["mutual_information"]),
        np.maximum(ent(probs.mean(0)) - ent(probs).mean(0), 0), atol=1e-6)
    assert (np.asarray(out["mutual_information"]) >= 0).all()

    # identical members → zero epistemic uncertainty, zero disagreement
    same = np.broadcast_to(probs[0], probs.shape)
    out_same = ensemble_uncertainty(jnp.asarray(same))
    np.testing.assert_allclose(np.asarray(out_same["mutual_information"]),
                               0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_same["disagreement"]), 0.0)

    # two members certain of OPPOSITE classes → aleatoric ≈ 0, epistemic
    # ≈ H(uniform over the two picked classes) = log 2
    contra = np.zeros((2, 1, 3), np.float32)
    contra[0, 0, 0] = contra[1, 0, 1] = 1.0
    out_c = ensemble_uncertainty(jnp.asarray(contra))
    assert float(out_c["expected_entropy"][0]) < 1e-6
    np.testing.assert_allclose(float(out_c["mutual_information"][0]),
                               np.log(2), rtol=1e-4)
    assert float(out_c["disagreement"][0]) == 0.5


def test_aps_sets_never_empty_and_contain_argmax():
    r = np.random.default_rng(4)
    p, y = _sample_task(r, 150)
    q = conformal_calibrate(jnp.asarray(p), jnp.asarray(y), alpha=0.4,
                            method="aps")
    sets = np.asarray(conformal_sets(jnp.asarray(p), q, method="aps"))
    assert (sets.sum(-1) >= 1).all()
    assert sets[np.arange(len(p)), p.argmax(-1)].all()


def test_all_masked_calibration_is_conservative():
    """A vacuous calibration fold (every row masked) must yield q̂=+inf →
    FULL sets, never silently-empty ones (advisor finding, round 3)."""
    r = np.random.default_rng(5)
    probs, labels = _sample_task(r, 16)
    for method in ("lac", "aps"):
        qhat = conformal_calibrate(
            jnp.asarray(probs), jnp.asarray(labels), alpha=0.1,
            method=method, weights=jnp.zeros(16))
        assert np.isposinf(float(qhat)), (method, float(qhat))
        sets = conformal_sets(jnp.asarray(probs), qhat, method=method)
        assert bool(np.all(np.asarray(sets))), method
