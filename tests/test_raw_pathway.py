"""Raw-recording pathway + real-file pipeline glue tests."""

import numpy as np
import pytest


def test_raw_to_dataset_and_training():
    """Raw continuous EEG → on-device featurization → model trains."""
    import jax
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows
    from multimodal_eeg_fmri_tpu.data.raw import raw_recordings_to_dataset
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

    r = np.random.default_rng(0)
    N, T, C = 12, 1000, 18
    labels = np.asarray([0, 1] * 6, np.int32)
    # class-1 recordings carry a strong alpha (10 Hz) rhythm
    t = np.arange(T) / 250.0
    alpha_sig = np.sin(2 * np.pi * 10 * t)[None, :, None]
    raw = r.standard_normal((N, T, C)).astype(np.float32)
    raw += 2.0 * labels[:, None, None] * alpha_sig

    data = raw_recordings_to_dataset(raw, labels, epoch_len=250)
    assert data["erp"].shape == (N, 250, 18)
    assert data["conn"].shape == (N, 459)   # 3 × C(18,2)
    assert data["pw"].shape[0] == N
    assert data["pw"].shape[2] == 18 * 5    # C channels × 5 bands

    train = pad_rows({k: v for k, v in data.items() if k != "subject"}, N)
    cfg = TrainConfig(batch_size=4, num_epochs=6, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    fit = jax.jit(make_fit_fn(TriModalFusionNetV4Lite(hidden_dim=16), cfg,
                              eval_names=()))
    res = fit(jax.random.key(0),
              jax.tree_util.tree_map(jnp.asarray, train), {}, None)
    hist = np.asarray(res.history["train_loss"])
    assert hist[-1] < hist[0]


def test_pipeline_real_file_branch(tmp_path, monkeypatch):
    """load_or_synthesize_eeg must take the real-file branch when the data
    root exists, through the reference's file layout."""
    import h5py
    import pandas as pd
    from scipy.io import savemat

    import dataclasses

    from multimodal_eeg_fmri_tpu.core.config import EEGConfig, ExperimentConfig
    from multimodal_eeg_fmri_tpu.pipelines import load_or_synthesize_eeg

    r = np.random.default_rng(0)
    root = tmp_path
    for d in ("erp", "pw", "conn"):
        (root / d).mkdir()
    pd.DataFrame({
        "Subject": [f"sub{i:02d}" for i in range(1, 7)],
        "Postoperative evaluation": [1, 3, 2, 4, 1, 3],
    }).to_csv(root / "medical_score.csv", index=False)

    cfg = ExperimentConfig(
        eeg=EEGConfig(data_root=str(root), time_steps=64,
                      freq_bands={"alpha": (8.0, 13.0)}))
    bands = {"alpha": "Alpha"}
    freqs = ["8_13_Hz"]
    for subj in range(1, 7):
        s = f"{subj:02d}"
        with h5py.File(root / "erp" / f"ERP_sub{s}_alpha_8_13_Hz.mat",
                       "w") as hf:
            hf.create_group("erp_struct").create_dataset(
                "avg", data=r.standard_normal((18, 80)).astype(np.float32))
        savemat(root / "pw" / f"powspctrm_alpha_8_13_Hz_sub{s}.mat",
                {"powspctrm": r.standard_normal((75, 40)).astype(np.float32)})
        savemat(root / "conn" / f"conn_Alpha_open_sub{s}.mat",
                {"conn": r.standard_normal(459).astype(np.float32)})

    data = load_or_synthesize_eeg(cfg)
    assert data["erp"].shape == (6, 64, 18)
    assert data["pw"].shape == (6, 64, 75)
    assert data["conn"].shape == (6, 459)
    assert list(data["label"]) == [0, 1, 0, 1, 0, 1]
