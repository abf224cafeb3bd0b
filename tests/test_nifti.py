"""NIfTI I/O + fMRI volume→features pipeline tests."""

import gzip
import struct

import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.data.nifti import (
    load_subject_volume_features,
    read_nifti,
    volumes_to_roi_features,
    write_nifti,
)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    r = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = r.integers(0, 100, (6, 5, 4)).astype(dtype)
    else:
        data = r.standard_normal((6, 5, 4)).astype(dtype)
    p = write_nifti(tmp_path / f"x{suffix}", data)
    loaded, hdr = read_nifti(p)
    assert hdr["shape"] == (6, 5, 4)
    np.testing.assert_allclose(loaded, data.astype(np.float32), rtol=1e-6)


def test_nifti_4d_and_scaling(tmp_path):
    r = np.random.default_rng(1)
    data = r.standard_normal((4, 4, 3, 10)).astype(np.float32)
    p = write_nifti(tmp_path / "bold.nii.gz", data)
    loaded, _ = read_nifti(p)
    assert loaded.shape == (4, 4, 3, 10)
    np.testing.assert_allclose(loaded, data, rtol=1e-6)
    # scl_slope/inter applied
    raw = gzip.decompress((tmp_path / "bold.nii.gz").read_bytes())
    raw = bytearray(raw)
    struct.pack_into("<f", raw, 112, 2.0)   # slope
    struct.pack_into("<f", raw, 116, 1.0)   # inter
    (tmp_path / "scaled.nii.gz").write_bytes(gzip.compress(bytes(raw)))
    scaled, _ = read_nifti(tmp_path / "scaled.nii.gz")
    np.testing.assert_allclose(scaled, data * 2.0 + 1.0, rtol=1e-5)


def test_bad_nifti_raises(tmp_path):
    (tmp_path / "junk.nii").write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError, match="not a NIfTI-1 file"):
        read_nifti(tmp_path / "junk.nii")


def test_volume_pipeline_oracle(tmp_path):
    """ROI features from volumes must equal the hand-computed mean/std of
    the z-scored ROI voxel means."""
    r = np.random.default_rng(2)
    X, Y, Z, T, R = 6, 5, 4, 12, 3
    bold = r.standard_normal((X, Y, Z, T)).astype(np.float32)
    atlas = r.integers(0, R + 1, (X, Y, Z)).astype(np.int32)

    feats = volumes_to_roi_features(bold, atlas, agg_method="both")
    assert feats.shape == (2 * R,)

    # numpy oracle
    flat = np.moveaxis(bold, -1, 0).reshape(T, -1)
    z = (flat - flat.mean(1, keepdims=True)) / (flat.std(1, keepdims=True)
                                                + 1e-8)
    labels = atlas.reshape(-1)
    ts = np.stack([z[:, labels == roi].mean(1) for roi in range(1, R + 1)],
                  axis=1)
    expected = np.concatenate([ts.mean(0), ts.std(0)])
    np.testing.assert_allclose(feats, expected, rtol=1e-4, atol=1e-5)

    # end-to-end from files
    write_nifti(tmp_path / "bold.nii.gz", bold)
    write_nifti(tmp_path / "atlas.nii", atlas.astype(np.int16))
    feats2 = load_subject_volume_features(tmp_path / "bold.nii.gz",
                                          tmp_path / "atlas.nii")
    np.testing.assert_allclose(feats2, feats, rtol=1e-5)
