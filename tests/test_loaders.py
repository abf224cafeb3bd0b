"""Loader tests against generated fixture files in the reference's on-disk
formats (.mat, MATLAB-v7.3 HDF5, per-subject CSVs, medical_score.csv)."""

import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.data.handler import (
    aggregate_by_subject,
    build_fmri_arrays,
    build_sample_level_arrays,
    build_trimodal_arrays,
    pad_or_truncate_time,
)
from multimodal_eeg_fmri_tpu.data.loaders import (
    load_eeg_conn_features,
    load_eeg_erp_features,
    load_eeg_labels,
    load_eeg_pw_features,
    load_fmri_activation_features,
    load_fmri_connectivity_features,
    load_fmri_labels,
)


@pytest.fixture
def eeg_fixture_dir(tmp_path):
    """Write .mat / HDF5 files exactly as the reference expects them."""
    from scipy.io import savemat
    import h5py
    import pandas as pd

    r = np.random.default_rng(0)
    # labels
    pd.DataFrame({
        "Subject": [f"sub{i:02d}" for i in range(1, 5)],
        "Postoperative evaluation": [1, 2, 3, 4],
    }).to_csv(tmp_path / "medical_score.csv", index=False)

    for subj in range(1, 4):
        s = f"{subj:02d}"
        # conn: classic .mat with NaNs to scrub
        conn = r.standard_normal(459).astype(np.float32)
        conn[0] = np.nan
        savemat(tmp_path / f"conn_Alpha_open_sub{s}.mat", {"conn": conn})
        # pw: classic .mat
        savemat(tmp_path / f"powspctrm_alpha_10_Hz_sub{s}.mat",
                {"powspctrm": r.standard_normal((75, 40)).astype(np.float32)})
        # erp: MATLAB v7.3 = HDF5, erp_struct/avg layout (C, T)
        with h5py.File(tmp_path / f"ERP_sub{s}_alpha_10_Hz_a.mat", "w") as hf:
            g = hf.create_group("erp_struct")
            g.create_dataset(
                "avg", data=r.standard_normal((18, 60)).astype(np.float32))
    return tmp_path


def test_eeg_labels(eeg_fixture_dir):
    labels = load_eeg_labels(eeg_fixture_dir)
    assert labels == {1: 0, 2: 0, 3: 1, 4: 1}


def test_eeg_feature_loaders(eeg_fixture_dir):
    conn = load_eeg_conn_features(eeg_fixture_dir, [1, 2, 3, 4],
                                  {"alpha": "Alpha"}, ["open"])
    assert len(conn) == 3  # subject 4 has no files
    v = conn[(1, "alpha", "open", 0)]
    assert v.shape == (459,) and not np.isnan(v).any()

    pw = load_eeg_pw_features(eeg_fixture_dir, [1, 2, 3], ["alpha"],
                              ["10_Hz"])
    assert len(pw) == 3
    assert pw[(1, "alpha", "10_Hz", 0)].shape == (75 * 40,)

    erp = load_eeg_erp_features(eeg_fixture_dir, [1, 2, 3], ["alpha"],
                                ["10_Hz"])
    assert len(erp) == 3
    assert erp[(1, "alpha", "10_Hz", 0)].shape == (18, 60)


def test_trimodal_build_from_loaded(eeg_fixture_dir):
    labels = load_eeg_labels(eeg_fixture_dir)
    conn = load_eeg_conn_features(eeg_fixture_dir, [1, 2, 3, 4],
                                  {"alpha": "Alpha"}, ["open"])
    pw = load_eeg_pw_features(eeg_fixture_dir, [1, 2, 3], ["alpha"],
                              ["10_Hz"])
    erp = load_eeg_erp_features(eeg_fixture_dir, [1, 2, 3], ["alpha"],
                                ["10_Hz"])
    data = build_trimodal_arrays(erp, pw, conn, labels, time_steps=64)
    assert data["erp"].shape == (3, 64, 18)
    assert data["pw"].shape == (3, 64, 75)
    assert data["conn"].shape == (3, 459)
    assert list(data["subject"]) == [1, 2, 3]

    sample = build_sample_level_arrays(erp, pw, conn, labels, time_steps=64)
    assert sample["erp"].shape[0] >= 3


@pytest.fixture
def fmri_fixture_dir(tmp_path):
    import pandas as pd

    r = np.random.default_rng(1)
    for subj in (1, 2, 3):
        d = tmp_path / f"sub-{subj}"
        d.mkdir()
        for act in ("sensory", "DMN"):
            pd.DataFrame(
                r.standard_normal((5, 9)).astype(np.float32)
            ).to_csv(d / f"subject_{subj}_activation_{act}.csv", index=False)
        pd.DataFrame(
            r.standard_normal((4, 4)).astype(np.float32)
        ).to_csv(d / f"subject_{subj}_fdr_PPI_Connectivity_DMN.csv",
                 index=False)
    (tmp_path / "labels_dir").mkdir()
    pd.DataFrame({"Subject": [1, 2, 3], "Label": [0, 1, 0],
                  "Score": [1.5, 3.0, 2.0]}).to_csv(
        tmp_path / "labels_dir" / "labels.csv", index=False)
    return tmp_path


def test_fmri_loaders_and_build(fmri_fixture_dir):
    act = load_fmri_activation_features(
        fmri_fixture_dir, [1, 2, 3], ["sensory", "DMN"], "both")
    assert act[1].shape == (2 * 2 * 9,)  # 2 types × (mean+std) × 9 ROIs
    conn = load_fmri_connectivity_features(fmri_fixture_dir, [1, 2, 3],
                                           ["DMN"])
    assert conn[1].shape == (16,)
    cls, reg = load_fmri_labels(fmri_fixture_dir / "labels_dir", [1, 2, 3])
    assert cls == {1: 0, 2: 1, 3: 0}
    assert reg[2] == 3.0
    data = build_fmri_arrays(act, conn, cls, reg)
    assert data["activation"].shape == (3, 36)
    assert data["reg_label"].shape == (3,)


def test_fmri_dummy_labels(tmp_path):
    cls, reg = load_fmri_labels(tmp_path / "nowhere", [1, 2], seed=0)
    assert set(cls) == {1, 2}
    assert set(reg) == {1, 2}


def test_aggregate_and_pad():
    feats = {(1, "a"): np.ones((4, 10)), (1, "b"): 3 * np.ones((4, 12)),
             (2, "a"): np.ones((4, 10))}
    agg = aggregate_by_subject(feats, "mean")
    assert agg[1].shape == (4, 10)  # trimmed to common min shape
    np.testing.assert_allclose(agg[1], 2.0)
    x = np.ones((4, 10))
    assert pad_or_truncate_time(x, 6).shape == (4, 6)
    assert pad_or_truncate_time(x, 15).shape == (4, 15)
    assert pad_or_truncate_time(x, 15)[:, 10:].sum() == 0
