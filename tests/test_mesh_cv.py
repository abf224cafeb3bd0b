"""Mesh-sharded CV: folds sharded over the ensemble axis of an 8-device
mesh, including the fold-axis padding path (5 folds → 8 shards)."""

import numpy as np
import pytest

import jax

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh
from multimodal_eeg_fmri_tpu.train.cv import eeg_kfold_splits, run_cv


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_run_cv_sharded_over_ensemble_axis():
    plan = build_mesh(jax.devices()[:8], ensemble=8, data=1)
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32,
                                  separation=2.0, seed=2)
    cfg = TrainConfig(batch_size=8, num_epochs=5, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100)
    splits = eeg_kfold_splits(data, cfg, n_splits=5)  # 5 folds → pad to 8
    res = run_cv(TriModalFusionNetV4Lite(hidden_dim=16), cfg, data, splits,
                 normalize_keys=("erp", "pw", "conn"), mesh_plan=plan)
    # only the real folds are reported; padded shards masked out
    assert res.n_folds == 5
    assert res.fold_metrics["accuracy"].shape == (5,)
    assert res.summary["accuracy"][0] > 0.55
    # results must MATCH the unsharded path (same splits, same rngs)
    res_ref = run_cv(TriModalFusionNetV4Lite(hidden_dim=16), cfg, data,
                     splits, normalize_keys=("erp", "pw", "conn"))
    np.testing.assert_allclose(res.fold_metrics["accuracy"],
                               res_ref.fold_metrics["accuracy"],
                               atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_2d_ensemble_data():
    plan = build_mesh(jax.devices()[:8], ensemble=4, data=2)
    assert plan.n_ensemble == 4 and plan.n_data == 2
    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=2.0, seed=3)
    cfg = TrainConfig(batch_size=4, num_epochs=3, learning_rate=3e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    splits = eeg_kfold_splits(data, cfg, n_splits=4)
    res = run_cv(TriModalFusionNetV4Lite(hidden_dim=16), cfg, data, splits,
                 normalize_keys=("erp", "pw", "conn"), mesh_plan=plan)
    assert res.n_folds == 4
    assert np.isfinite(res.fold_metrics["f1"]).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_seed_sweep_sharded_matches_unsharded():
    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
    from multimodal_eeg_fmri_tpu.train.cv import run_seed_sweep

    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=1.5, seed=2)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    val = pad_rows(subset(data, np.arange(12, 16)), 4)
    cfg = TrainConfig(batch_size=4, num_epochs=2, learning_rate=2e-3,
                      schedule="constant", selection="val", patience=100)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    plan = build_mesh(jax.devices()[:8], ensemble=4, data=2)
    sharded = run_seed_sweep(model, cfg, train, {"val": val}, n_seeds=4,
                             mesh_plan=plan)
    plain = run_seed_sweep(model, cfg, train, {"val": val}, n_seeds=4)
    for k in plain["history"]:
        np.testing.assert_allclose(
            sharded["history"][k], plain["history"][k],
            rtol=2e-4, atol=2e-5, err_msg=f"seed sweep history[{k!r}]")
