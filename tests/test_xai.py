"""XAI tests: attribution correctness properties + SHAP oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.models import BridgeFusionNet, TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.xai.attribution import (
    ablation_importance,
    gradient_saliency,
    gradient_x_input,
    integrated_gradients,
    make_apply_fn,
)
from multimodal_eeg_fmri_tpu.xai.analysis import (
    channel_importance_from_attribution,
    classwise_weight_comparison,
    connectivity_pair_importance,
    extract_attention_and_fusion_weights,
)
from multimodal_eeg_fmri_tpu.xai.shap_kernel import kernel_shap, make_class_prob_fn


@pytest.fixture(scope="module")
def lite_model():
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    B, T = 4, 32
    key = jax.random.key(0)
    inputs = {
        "erp": jax.random.normal(key, (B, T, 18)),
        "pw": jax.random.normal(jax.random.fold_in(key, 1), (B, T, 75)),
        "conn": jax.random.normal(jax.random.fold_in(key, 2), (B, 459)),
    }
    variables = model.init({"params": key, "dropout": key}, **inputs,
                           train=False)
    return model, variables, inputs


def test_saliency_shapes_and_nonneg(lite_model):
    model, variables, inputs = lite_model
    apply_fn = make_apply_fn(model, variables["params"],
                             variables.get("batch_stats"))
    sal = gradient_saliency(apply_fn, inputs)
    for k, v in sal.items():
        assert v.shape == inputs[k].shape
        assert np.all(np.asarray(v) >= 0)
    gxi = gradient_x_input(apply_fn, inputs)
    assert set(gxi.keys()) == set(inputs.keys())


def test_integrated_gradients_completeness(lite_model):
    """IG's defining axiom: attributions sum to f(x) − f(baseline).
    With the left-Riemann linspace(0,1,n) rule, convergence is O(1/n); use
    many steps and signed attributions to check."""
    model, variables, inputs = lite_model
    apply_fn = make_apply_fn(model, variables["params"],
                             variables.get("batch_stats"))
    targets = jnp.zeros((4,), jnp.int32)

    # signed IG (no abs) for the completeness check
    baselines = jax.tree_util.tree_map(jnp.zeros_like, dict(inputs))
    diffs = dict(inputs)
    n_steps = 201

    def grad_at_alpha(alpha):
        interp = jax.tree_util.tree_map(lambda d: alpha * d, diffs)

        def scalar_fn(inp):
            lo = apply_fn(inp)
            return jnp.sum(jnp.take_along_axis(lo, targets[:, None], -1))

        return jax.grad(scalar_fn)(interp)

    # trapezoid for the test oracle
    alphas = jnp.linspace(0.0, 1.0, n_steps)
    grads = jax.vmap(grad_at_alpha)(alphas)
    w = jnp.ones(n_steps).at[0].set(0.5).at[-1].set(0.5) / (n_steps - 1)
    mean_g = jax.tree_util.tree_map(
        lambda g: jnp.tensordot(w, g, axes=1), grads)
    attr_sum = sum(
        float(jnp.sum(d * g)) for d, g in
        zip(jax.tree_util.tree_leaves(diffs),
            jax.tree_util.tree_leaves(mean_g))
    )
    f_x = float(jnp.sum(jnp.take_along_axis(
        apply_fn(inputs), targets[:, None], -1)))
    f_0 = float(jnp.sum(jnp.take_along_axis(
        apply_fn(baselines), targets[:, None], -1)))
    assert abs(attr_sum - (f_x - f_0)) < 0.05 * max(1.0, abs(f_x - f_0))

    # and the public API runs with the reference's 50-step rule
    ig = integrated_gradients(apply_fn, inputs, target_class=targets)
    assert ig["erp"].shape == inputs["erp"].shape


def test_ablation_importance(lite_model):
    model, variables, inputs = lite_model
    apply_fn = make_apply_fn(model, variables["params"],
                             variables.get("batch_stats"))
    imp = ablation_importance(apply_fn, inputs, key="erp", axis=-1)
    assert imp.shape == (4, 18)


def test_channel_and_pair_importance():
    r = np.random.default_rng(0)
    attr = r.random((4, 32, 18))
    ci = channel_importance_from_attribution(attr)
    assert len(ci.values) == 18
    assert abs(sum(ci.values.values()) - 1.0) < 1e-5
    assert set(ci.region_values) == {"Frontal", "Central", "Temporal",
                                     "Parietal", "Occipital"}
    top = ci.top_k(3)
    assert len(top) == 3 and top[0][1] >= top[1][1]

    pairs = connectivity_pair_importance(r.random((4, 459)))
    assert len(pairs) == 153  # C(18,2)


def test_kernel_shap_linear_model_oracle():
    """For a linear model f(x) = w·x + b, Shapley values are exactly
    w_i (x_i − bg_i)."""
    r = np.random.default_rng(1)
    M = 8
    w = r.standard_normal(M)
    bg = r.standard_normal(M)
    X = r.standard_normal((3, M))

    f = lambda x: x @ w + 1.7
    phi = kernel_shap(f, X, bg, n_samples=400,
                      rng=np.random.default_rng(2))
    expected = w[None, :] * (X - bg[None, :])
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)


def _nonlinear_f(A):
    """Nonlinear test model with feature interactions — a weighting bug in
    the WLS cannot hide here (unlike the linear oracle, whose residuals
    vanish for ANY weighting)."""
    A = np.asarray(A, np.float64)
    return (np.tanh(A[:, 0] * A[:, 1]) + 0.5 * np.sin(2.0 * A[:, 2])
            + 0.3 * A[:, 3] ** 2
            - 1.0 / (1.0 + np.exp(-(A[:, 4] - A[:, 5] * A[:, 6])))
            + 0.2 * A[:, 7] * A[:, 0])


def _brute_shapley(f, x, bg):
    """Exact Shapley by full 2^M enumeration of the value function."""
    from math import factorial

    M = x.size
    masks = np.array([[(s >> j) & 1 for j in range(M)]
                      for s in range(2 ** M)], np.float64)
    vals = f(x[None, :] * masks + bg[None, :] * (1 - masks))
    phi = np.zeros(M)
    for i in range(M):
        for s in range(2 ** M):
            if (s >> i) & 1:
                continue
            size = bin(s).count("1")
            w = factorial(size) * factorial(M - size - 1) / factorial(M)
            phi[i] += w * (vals[s | (1 << i)] - vals[s])
    return phi


def test_kernel_shap_exact_nonlinear_oracle():
    """``exact=True`` (full coalition enumeration + explicit kernel
    weights) must equal brute-force Shapley enumeration on a nonlinear
    interacting model — the Lundberg & Lee equivalence, verified to 1e-6.
    Any error in the kernel weights or the constrained-WLS reduction
    breaks this by orders of magnitude."""
    r = np.random.default_rng(0)
    M = 8
    X = r.standard_normal((3, M)).astype(np.float32)
    bg = np.zeros(M, np.float32)
    ref = np.stack([_brute_shapley(_nonlinear_f, x, bg) for x in X])
    phi = kernel_shap(_nonlinear_f, X, bg, exact=True)
    np.testing.assert_allclose(phi, ref, atol=1e-6)


def test_kernel_shap_sampled_nonlinear_oracle():
    """The SAMPLED estimator must converge to exact Shapley on the same
    nonlinear model. Tolerance 2e-3 is calibrated to catch the round-1
    kernel-squared weighting bug: with these seeds the correct estimator
    errs ~9e-4 while re-applying kernel weights in the WLS errs ~4e-3
    (measured; the linear oracle provably cannot distinguish them)."""
    r = np.random.default_rng(0)
    M = 8
    X = r.standard_normal((3, M)).astype(np.float32)
    bg = np.zeros(M, np.float32)
    ref = np.stack([_brute_shapley(_nonlinear_f, x, bg) for x in X])
    phi = kernel_shap(_nonlinear_f, X, bg, n_samples=2000,
                      rng=np.random.default_rng(1))
    np.testing.assert_allclose(phi, ref, atol=2e-3)


def test_shap_on_bridge_model():
    model = BridgeFusionNet(bridge_dim=16)
    key = jax.random.key(0)
    data = {"eeg": jax.random.normal(key, (3, 128)),
            "fmri": jax.random.normal(key, (3, 64))}
    variables = model.init({"params": key, "dropout": key}, **data,
                           train=False)
    template = {"eeg": (128,), "fmri": (64,)}
    f = make_class_prob_fn(model, variables["params"],
                           variables.get("batch_stats"), template)
    X = np.concatenate([np.asarray(data["eeg"]), np.asarray(data["fmri"])],
                       axis=1)
    phi = kernel_shap(f, X[:2], X.mean(0), n_samples=64,
                      rng=np.random.default_rng(3))
    assert phi.shape == (2, 192)
    # efficiency property: rows sum to f(x) - f(bg)
    fx = np.asarray(f(X[:2]))
    f0 = float(np.asarray(f(X.mean(0, keepdims=True)))[0])
    np.testing.assert_allclose(phi.sum(1), fx - f0, atol=1e-4)


def test_attention_fusion_extraction():
    model = BridgeFusionNet(bridge_dim=16)
    key = jax.random.key(1)
    n = 6
    data = {
        "eeg": np.asarray(jax.random.normal(key, (n, 128))),
        "fmri": np.asarray(jax.random.normal(key, (n, 64))),
        "label": np.asarray([0, 1, 0, 1, 0, 1]),
        "subject": np.arange(1, n + 1),
    }
    variables = model.init({"params": key, "dropout": key},
                           eeg=jnp.asarray(data["eeg"]),
                           fmri=jnp.asarray(data["fmri"]), train=False)
    recs = extract_attention_and_fusion_weights(
        model, variables["params"], variables.get("batch_stats"), data)
    assert len(recs) == n
    assert recs[0]["fusion_weights"].shape == (2,)
    cw = classwise_weight_comparison(recs)
    assert set(cw) == {"class_0", "class_1"}


def test_explainer_analyze_dataset(tmp_path, lite_model):
    from multimodal_eeg_fmri_tpu.xai.explainer import Explainer

    model, variables, inputs = lite_model
    ex = Explainer(model, variables["params"], variables.get("batch_stats"),
                   ig_steps=10)
    res = ex.analyze_dataset(inputs, tmp_path, metrics={"f1": 0.7})
    assert res.predictions.shape == (4,)
    assert res.probs.shape == (4, 2)
    assert "erp" in res.channel_importance
    assert res.pair_importance is not None and len(res.pair_importance) == 153
    assert (tmp_path / "xai_report.txt").exists()
    assert (tmp_path / "topomap.png").exists()
    assert (tmp_path / "xai_arrays.npz").exists()
    import numpy as _np
    arrs = _np.load(tmp_path / "xai_arrays.npz")
    assert "ig_erp" in arrs and "saliency_conn" in arrs
