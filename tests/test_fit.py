"""Integration tests for the compiled whole-run trainer (train/fit.py).

Mirrors the reference's synthetic smoke-test strategy
(``enhanced_models_v4.py:844-890``) but with real assertions: training on a
separable synthetic dataset must beat chance, loss must decrease, and the
best-state tracking must return the checkpointed (not final) params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import (
    balanced_class_weights,
    pad_rows,
    subset,
)
from multimodal_eeg_fmri_tpu.data.synthetic import (
    synthetic_bridge,
    synthetic_eeg_trimodal,
    synthetic_fmri,
)
from multimodal_eeg_fmri_tpu.models import (
    BridgeFusionNet,
    FMRIFusionNet,
    TriModalFusionNetV4Lite,
)
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


def _device_tree(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _split(data, n_train):
    n = len(data["label"])
    train = subset(data, np.arange(n_train))
    test = subset(data, np.arange(n_train, n))
    return train, test


def test_lite_trimodal_learns_separable_data():
    data = synthetic_eeg_trimodal(
        n_subjects=48, time_steps=64, separation=2.0, seed=1
    )
    data.pop("subject")
    train, test = _split(data, 32)
    train = pad_rows(train, 32)
    test = pad_rows(test, 16)
    cw = balanced_class_weights(train["label"], weights=train["weight"])

    cfg = TrainConfig(
        batch_size=8, num_epochs=12, learning_rate=3e-3, selection="val",
        schedule="constant", loss="weighted_ce", patience=100,
    )
    model = TriModalFusionNetV4Lite(hidden_dim=32)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val", "test")))
    res = fit(
        jax.random.key(0),
        _device_tree(train),
        {"val": _device_tree(test), "test": _device_tree(test)},
        jnp.asarray(cw),
    )
    hist = jax.tree_util.tree_map(np.asarray, res.history)
    # loss decreases
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    # beats chance on a separable task
    assert res.best_metric > 0.6, hist["val_f1"]
    # history has one entry per epoch
    assert hist["train_loss"].shape == (12,)
    # best params differ from final when best_epoch < last
    assert int(res.best_epoch) >= 0


def test_early_stopping_freezes_best():
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32, separation=0.0)
    data.pop("subject")
    train, test = _split(data, 24)
    train = pad_rows(train, 24)
    test = pad_rows(test, 8)
    cfg = TrainConfig(
        batch_size=8, num_epochs=10, learning_rate=1e-3,
        selection="val", schedule="constant", patience=2,
    )
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    res = fit(
        jax.random.key(0), _device_tree(train),
        {"val": _device_tree(test)}, None,
    )
    # with patience=2 on noise, best_epoch must be early
    assert int(res.best_epoch) < 10


def test_fmri_fusion_classification_and_regression():
    data = synthetic_fmri(n_subjects=32, separation=2.0, seed=3)
    data.pop("subject")
    reg = data.pop("reg_label")

    train, test = _split(data, 24)
    cfg = TrainConfig(batch_size=8, num_epochs=10, learning_rate=3e-3,
                      selection="val", schedule="constant", patience=100)
    model = FMRIFusionNet(hidden_dim=32)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    res = fit(jax.random.key(1), _device_tree(pad_rows(train, 24)),
              {"val": _device_tree(pad_rows(test, 8))}, None)
    assert res.best_metric > 0.6

    # regression task
    data_r = dict(data)
    data_r["label"] = reg
    train_r, test_r = _split(data_r, 24)
    model_r = FMRIFusionNet(hidden_dim=32, task="regression")
    fit_r = jax.jit(make_fit_fn(model_r, cfg, task="regression",
                                eval_names=("val",)))
    res_r = fit_r(jax.random.key(2), _device_tree(pad_rows(train_r, 24)),
                  {"val": _device_tree(pad_rows(test_r, 8))}, None)
    hist = jax.tree_util.tree_map(np.asarray, res_r.history)
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_bridge_net_loocv_style_batch1():
    """Bridge trains with batch=1 under LOOCV — LayerNorm path must work."""
    data = synthetic_bridge(n_subjects=8, separation=2.0)
    data.pop("subject")
    train, test = _split(data, 7)
    cfg = TrainConfig(batch_size=4, num_epochs=5, learning_rate=1e-3,
                      selection="train_loss", schedule="constant",
                      patience=100)
    model = BridgeFusionNet(bridge_dim=32)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("test",)))
    res = fit(jax.random.key(0), _device_tree(pad_rows(train, 8)),
              {"test": _device_tree(pad_rows(test, 1))}, None)
    assert np.isfinite(float(res.best_metric))


def test_preprocess_in_step_equals_pretransformed_data():
    """``make_fit_fn(preprocess=...)`` fused into the compiled step must
    produce bit-identical training to running the same transform on the
    data beforehand (the BASELINE "host NumPy/SciPy work disappears" hook)."""
    data = synthetic_eeg_trimodal(
        n_subjects=24, time_steps=32, separation=1.0, seed=5)
    data.pop("subject")
    train, test = _split(data, 16)
    train = pad_rows(train, 16)
    test = pad_rows(test, 8)

    def zscore_inputs(inputs):
        out = {}
        for k in ("erp", "pw"):
            x = inputs[k]
            mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
            sd = jnp.std(x, axis=(-2, -1), keepdims=True)
            out[k] = (x - mu) / (sd + 1e-6)
        return out

    cfg = TrainConfig(batch_size=8, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="val", patience=100)
    model = TriModalFusionNetV4Lite(hidden_dim=16)

    fit_fused = jax.jit(make_fit_fn(model, cfg, eval_names=("val",),
                                    preprocess=zscore_inputs))
    res_fused = fit_fused(jax.random.key(0), _device_tree(train),
                          {"val": _device_tree(test)}, None)

    def pre(d):
        d = dict(d)
        d.update({k: np.asarray(v)
                  for k, v in zscore_inputs(_device_tree(d)).items()})
        return d

    fit_plain = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    res_plain = fit_plain(jax.random.key(0), _device_tree(pre(train)),
                          {"val": _device_tree(pre(test))}, None)

    # Tight but not bitwise: in f32 the in-step z-score fuses into the
    # forward and XLA reassociates differently than the pre-transformed
    # path (~2e-6 round-off; was bitwise under bf16 only because both
    # paths quantized to the same grid). Histories must agree tightly;
    # raw params are NOT comparable — near-zero-gradient weights take
    # ±lr AdamW steps whose sign is the sign of that 2e-6 noise.
    for key in ("train_loss", "val_f1", "val_accuracy"):
        np.testing.assert_allclose(np.asarray(res_fused.history[key]),
                                   np.asarray(res_plain.history[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)


def test_single_class_training_fold_is_finite():
    """A fold whose TRAIN split contains only one class (possible under
    32-subject LOOCV) must train with finite losses and clamped balanced
    class weights, not NaN out."""
    from multimodal_eeg_fmri_tpu.data import (
        balanced_class_weights,
        pad_rows,
        subset,
    )
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge

    data = synthetic_bridge(n_subjects=12, seed=0)
    data.pop("subject")
    data["label"] = np.zeros(12, np.int64)
    train = pad_rows(subset(data, np.arange(8)), 8)
    val = pad_rows(subset(data, np.arange(8, 12)), 4)
    cfg = TrainConfig(batch_size=4, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="val", patience=100)
    cw = balanced_class_weights(train["label"], weights=train["weight"])
    assert np.isfinite(cw).all() and cw[1] > 0  # absent class clamped
    fit_fn = jax.jit(make_fit_fn(BridgeFusionNet(bridge_dim=16), cfg,
                                 eval_names=("val",)))
    res = fit_fn(jax.random.key(0), _device_tree(train),
                 {"val": _device_tree(val)}, jnp.asarray(cw))
    assert np.isfinite(np.asarray(res.history["train_loss"])).all()
    assert np.isfinite(np.asarray(res.history["val_f1"])).all()
