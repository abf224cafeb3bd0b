"""AOT compilation bundles (core/aot.py): a serialized fit program must
reload without model code/tracing and reproduce the live jit exactly,
including the full FitResult pytree (custom nodes: FitResult, carry,
optax states)."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.aot import export_jitted, load_bundle
from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.train.fit import FitResult, make_fit_fn


def test_fit_bundle_roundtrip(tmp_path):
    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32, seed=3)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    test = pad_rows(subset(data, np.arange(12, 16)), 4)
    cfg = TrainConfig(batch_size=4, num_epochs=3, schedule="constant",
                      selection="val", patience=100)
    fit = jax.jit(make_fit_fn(TriModalFusionNetV4Lite(hidden_dim=16), cfg,
                              eval_names=("val",)))
    dev = lambda t: {k: jnp.asarray(v) for k, v in t.items()}
    args = (jax.random.key(0), dev(train), {"val": dev(test)}, None)

    path = tmp_path / "fit.shlo"
    blob = export_jitted(fit, args, path)
    assert path.stat().st_size == len(blob) > 10_000

    fn = load_bundle(path)
    out = fn(*args)
    ref = fit(*args)
    assert isinstance(out, FitResult)
    np.testing.assert_allclose(np.asarray(out.history["train_loss"]),
                               np.asarray(ref.history["train_loss"]),
                               atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        out.params, ref.params)
    # the carry (resume state) survives too — bundles can feed resume_carry
    assert out.carry is not None
    np.testing.assert_allclose(np.asarray(out.carry.epoch),
                               np.asarray(ref.carry.epoch))


def test_bundle_or_jit_cache(tmp_path):
    """run_cv with aot_dir: first call exports a bundle, second call (same
    config+shapes) loads it and reproduces the fold metrics exactly."""
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.train.cv import eeg_kfold_splits, run_cv

    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=2.0, seed=2)
    cfg = TrainConfig(batch_size=4, num_epochs=3, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    splits = eeg_kfold_splits(data, cfg, n_splits=3)

    res1 = run_cv(model, cfg, data, splits,
                  normalize_keys=("erp", "pw", "conn"),
                  aot_dir=str(tmp_path))
    bundles = list(tmp_path.glob("*.shlo"))
    assert len(bundles) == 1  # miss -> exported

    res2 = run_cv(model, cfg, data, splits,
                  normalize_keys=("erp", "pw", "conn"),
                  aot_dir=str(tmp_path))
    assert list(tmp_path.glob("*.shlo")) == bundles  # hit -> no new export
    np.testing.assert_allclose(res2.fold_metrics["f1"],
                               res1.fold_metrics["f1"], atol=1e-6)
    np.testing.assert_allclose(res2.test_probs, res1.test_probs, atol=1e-6)
