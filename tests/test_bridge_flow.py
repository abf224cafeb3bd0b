"""Two-stage bridge pipeline tests: train → freeze → extract → bridge LOOCV
(+ checkpoint round-trip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.checkpoint import (
    export_frozen_encoder,
    find_best_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import (
    synthetic_eeg_trimodal,
    synthetic_fmri,
)
from multimodal_eeg_fmri_tpu.models import (
    FMRIFusionNet,
    TriModalFusionNetV4Lite,
)
from multimodal_eeg_fmri_tpu.train.bridge_flow import (
    align_bridge_dataset,
    extract_fused_features,
    run_bridge_loocv,
)
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


def _train(model, data, epochs=5, lr=2e-3):
    cfg = TrainConfig(batch_size=8, num_epochs=epochs, learning_rate=lr,
                      schedule="constant", selection="train_loss",
                      patience=100)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    dev = jax.tree_util.tree_map(jnp.asarray, data)
    return fit(jax.random.key(0), dev, {}, None)


def test_full_two_stage_bridge_pipeline(tmp_path):
    n = 16
    eeg = synthetic_eeg_trimodal(n_subjects=n, time_steps=32,
                                 separation=2.0, seed=10)
    fmri = synthetic_fmri(n_subjects=n, separation=2.0, seed=10)
    fmri.pop("reg_label")
    labels = {int(s): int(l) for s, l in zip(eeg["subject"], eeg["label"])}

    # stage 1: train both encoders (on subject-aggregated data)
    eeg_model = TriModalFusionNetV4Lite(hidden_dim=32)
    eeg_train = pad_rows({k: v for k, v in eeg.items() if k != "subject"}, n)
    eeg_res = _train(eeg_model, eeg_train)

    fmri_model = FMRIFusionNet(hidden_dim=16)
    fmri_train = pad_rows({k: v for k, v in fmri.items() if k != "subject"}, n)
    fmri_res = _train(fmri_model, fmri_train)

    # checkpoint round-trip (the stage-1 → stage-2 hand-off artifact)
    ck = export_frozen_encoder(
        tmp_path / "best_trimodal_fold0", "trimodal_lite",
        eeg_res.params, eeg_res.batch_stats, metrics={"f1": 0.9},
    )
    export_frozen_encoder(
        tmp_path / "best_trimodal_fold1", "trimodal_lite",
        eeg_res.params, eeg_res.batch_stats, metrics={"f1": 0.7},
    )
    best = find_best_checkpoint(tmp_path, "best_trimodal_fold*")
    assert best is not None and best.name == "best_trimodal_fold0"
    restored = load_checkpoint(best)
    assert restored["metadata"]["model_name"] == "trimodal_lite"
    # restored params must reproduce identical outputs
    x = {k: jnp.asarray(v[:4]) for k, v in eeg.items()
         if k in ("erp", "pw", "conn")}
    out_a = eeg_model.apply(
        {"params": eeg_res.params, "batch_stats": eeg_res.batch_stats},
        **x, train=False)
    out_b = eeg_model.apply(
        {"params": restored["params"],
         "batch_stats": restored["batch_stats"]}, **x, train=False)
    np.testing.assert_allclose(np.asarray(out_a.logits),
                               np.asarray(out_b.logits), rtol=1e-6)

    # stage 2: frozen extraction (one batched forward + segment mean)
    eeg_subj, eeg_feats = extract_fused_features(
        eeg_model, restored["params"], restored["batch_stats"], eeg)
    fmri_subj, fmri_feats = extract_fused_features(
        fmri_model, fmri_res.params, fmri_res.batch_stats, fmri)
    assert eeg_feats.shape == (n, 32)   # lite hidden_dim
    assert fmri_feats.shape == (n, 16)

    bridge_data = align_bridge_dataset(eeg_subj, eeg_feats,
                                       fmri_subj, fmri_feats, labels)
    assert len(bridge_data["label"]) == n

    # stage 3: LOOCV bridge with per-fold XAI
    cfg = TrainConfig(batch_size=8, num_epochs=6, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    res = run_bridge_loocv(bridge_data, cfg, bridge_dim=32, ig_steps=10)
    assert res.cv.n_folds == n
    assert set(res.loocv_metrics) >= {"accuracy", "f1", "auc"}
    assert res.loocv_metrics["accuracy"] > 0.55
    assert len(res.per_subject) == n
    assert res.xai["saliency_eeg"].shape == (n, 32)
    assert res.xai["ig_fmri"].shape == (n, 16)
    rec = res.per_subject[0]
    assert rec["fusion_weights"].shape == (2,)


def test_extract_features_multisample_subjects():
    """Sample-level data: several samples per subject must mean-pool."""
    n_samples, n_subjects = 12, 4
    eeg = synthetic_eeg_trimodal(n_subjects=n_samples, time_steps=32, seed=3)
    eeg["subject"] = np.repeat(np.arange(1, n_subjects + 1), 3)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    res = _train(model, pad_rows(
        {k: v for k, v in eeg.items() if k != "subject"}, n_samples), epochs=2)
    subj, feats = extract_fused_features(model, res.params, res.batch_stats,
                                         eeg)
    assert list(subj) == [1, 2, 3, 4]
    assert feats.shape == (4, 16)


def test_align_raises_on_no_overlap():
    with pytest.raises(ValueError, match="no subjects aligned"):
        align_bridge_dataset(
            np.asarray([1, 2]), np.zeros((2, 8)),
            np.asarray([3, 4]), np.zeros((2, 8)),
            {5: 0},
        )
