"""Native IO runtime tests: C++ parser vs pandas oracle + fallback path."""

import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.data import native_io


@pytest.fixture(scope="module")
def csv_files(tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("csv")
    r = np.random.default_rng(0)
    paths, oracles = [], []
    for i in range(6):
        arr = r.standard_normal((10 + i, 7)).astype(np.float32)
        df = pd.DataFrame(arr, columns=[f"c{j}" for j in range(7)])
        p = d / f"f{i}.csv"
        df.to_csv(p, index=False)
        paths.append(p)
        oracles.append(arr)
    # one with NaN + a non-numeric column
    arr = r.standard_normal((5, 3)).astype(np.float32)
    arr[0, 1] = np.nan
    df = pd.DataFrame(arr, columns=["a", "b", "c"])
    df["label"] = ["x", "y", "z", "w", "v"]
    p = d / "mixed.csv"
    df.to_csv(p, index=False)
    paths.append(p)
    expected = np.concatenate(
        [np.nan_to_num(arr, nan=0.0), np.zeros((5, 1), np.float32)], axis=1)
    oracles.append(expected)
    return paths, oracles


def test_native_build():
    assert native_io.native_available(), (
        "libfastio.so failed to build — check native/Makefile"
    )


def test_read_csv_matches_pandas(csv_files):
    paths, oracles = csv_files
    for p, expected in zip(paths, oracles):
        got = native_io.read_csv_f32(p)
        assert got is not None, p
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_read_csv_batch_parallel(csv_files):
    paths, oracles = csv_files
    results = native_io.read_csv_batch(paths, n_threads=4)
    assert len(results) == len(paths)
    for got, expected in zip(results, oracles):
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_read_csv_batch_missing_file(csv_files, tmp_path):
    paths, _ = csv_files
    mixed = [paths[0], tmp_path / "nope.csv", paths[1]]
    results = native_io.read_csv_batch(mixed)
    assert results[0] is not None
    assert results[1] is None
    assert results[2] is not None


def test_read_csv_page_multiple_no_trailing_newline(tmp_path):
    """A file whose size is an exact page multiple and that ends mid-numeric
    field (no trailing newline) must parse without reading past the mapping
    (the mmap NUL-guard path)."""
    import resource

    page = resource.getpagesize()
    # 8-byte rows + an 8-byte final line with NO newline, ending in digits:
    # total is exactly 2 pages, so the mapping has no kernel zero-fill tail
    n_rows = 2 * page // 8 - 1
    tail_digits = "999"
    content = "1.5,2.5\n" * n_rows + "3.25," + tail_digits
    assert len(content) == 2 * page
    p = tmp_path / "page_exact.csv"
    p.write_bytes(content.encode())
    assert p.stat().st_size % page == 0

    got = native_io.read_csv_f32(p, skip_header=False)
    assert got is not None
    assert got.shape[1] == 2
    np.testing.assert_allclose(got[0], [1.5, 2.5])
    np.testing.assert_allclose(got[-1], [3.25, float(tail_digits)])


def test_read_f32_binary(tmp_path):
    arr = np.arange(100, dtype=np.float32)
    p = tmp_path / "x.f32"
    arr.tofile(p)
    got = native_io.read_f32_binary(p)
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------------------
# MAT v5 parser (fio_read_mat) vs the scipy oracle
# ---------------------------------------------------------------------------

def _scipy_first(path):
    """The loaders' scipy contract (`loaders._first_mat_array`)."""
    from scipy.io import loadmat

    mat = loadmat(str(path))
    for k, v in mat.items():
        if not k.startswith("_"):
            return np.nan_to_num(np.asarray(v, np.float32), nan=0.0)
    return None


@pytest.fixture(scope="module")
def mat_files(tmp_path_factory):
    from scipy.io import savemat

    d = tmp_path_factory.mktemp("mat")
    r = np.random.default_rng(7)
    nan2d = r.standard_normal((6, 9))
    nan2d[r.random((6, 9)) < 0.25] = np.nan
    cases = {
        "conn_f64": r.standard_normal((18, 18)),          # conn matrix shape
        "pw_f64": r.standard_normal((75, 300)),           # powspctrm shape
        "vec": r.standard_normal(459),
        "f32": r.standard_normal((11, 5)).astype(np.float32),
        "i16": r.integers(-500, 500, (9, 4)).astype(np.int16),
        "u8_3d": r.integers(0, 255, (3, 5, 4)).astype(np.uint8),
        "nan": nan2d,
        "scalar": np.float64(3.5),
        "empty": np.zeros((0, 0)),
        # integer-valued doubles: scipy stores these with MATLAB "storage
        # compression" (mxDOUBLE class, miINT8 data stream)
        "storage_compressed": np.arange(24.0).reshape(4, 6),
    }
    paths, oracles = [], []
    for name, arr in cases.items():
        for comp in (False, True):
            p = d / f"{name}_{int(comp)}.mat"
            savemat(str(p), {"x": arr}, do_compression=comp)
            paths.append(p)
            oracles.append(_scipy_first(p))
    return paths, oracles


def test_read_mat_matches_scipy(mat_files):
    """Value + shape + order parity on every dtype/shape/compression combo
    (non-square 2D and 3D cases catch any column-major mix-up)."""
    paths, oracles = mat_files
    for p, expected in zip(paths, oracles):
        got = native_io.read_mat_f32(p)
        assert got is not None, p
        assert got.shape == expected.shape, p
        np.testing.assert_array_equal(got, expected, err_msg=str(p))


def test_read_mat_batch_parallel(mat_files, tmp_path):
    paths, oracles = mat_files
    mixed = list(paths) + [tmp_path / "missing.mat"]
    results = native_io.read_mat_batch(mixed, n_threads=4)
    assert results[-1] is None
    for p, got, expected in zip(paths, results, oracles):
        assert got is not None, p
        np.testing.assert_array_equal(got, expected, err_msg=str(p))


def test_read_mat_first_variable_wins(tmp_path):
    from scipy.io import savemat

    p = tmp_path / "multi.mat"
    savemat(str(p), {"a": np.full((2, 3), 5.0), "b": np.zeros((4, 4))})
    got = native_io.read_mat_f32(p)
    np.testing.assert_array_equal(got, np.full((2, 3), 5.0, np.float32))


def test_read_mat_declines_unsupported(tmp_path):
    """Struct-first and HDF5 (v7.3) files return None → scipy/h5py path."""
    import h5py
    from scipy.io import savemat

    ps = tmp_path / "struct.mat"
    savemat(str(ps), {"s": {"field": np.ones(3)}})
    assert native_io.read_mat_f32(ps) is None

    ph = tmp_path / "v73.mat"
    with h5py.File(ph, "w") as f:
        f["x"] = np.ones(4)
    assert native_io.read_mat_f32(ph) is None

    assert native_io.read_mat_f32(tmp_path / "nope.mat") is None


def test_read_mat_batch_empty_list():
    assert native_io.read_mat_batch([]) == []


def test_read_mat_batch_compressible_within_8x(tmp_path):
    """The batch arena sizes from file bytes × 8: a variable compressing
    up to ~8× must still take the batch fast path (beyond that it falls
    back per-file — found in review: the old 1× bound silently declined
    exactly the repetitive matrices that compress well)."""
    from scipy.io import savemat

    r = np.random.default_rng(9)
    # low-entropy but not degenerate: quantized values compress ~4-6x
    arr = np.round(r.standard_normal((200, 120)) * 2) / 2
    p = tmp_path / "lowent.mat"
    savemat(str(p), {"x": arr}, do_compression=True)
    assert arr.nbytes / p.stat().st_size > 2.0  # meaningfully compressed
    [got] = native_io.read_mat_batch([p])
    assert got is not None, "batch path declined a <=8x-compressible file"
    np.testing.assert_array_equal(got, _scipy_first(p))


def test_read_mat_inf_matches_scipy_fallback(tmp_path):
    """±Inf must clamp to ±FLT_MAX exactly like np.nan_to_num in the scipy
    fallback, so the SAME dataset yields the SAME values regardless of
    which parser handled each file (advisor finding, round 3)."""
    from scipy.io import savemat

    arr = np.array([[np.inf, -np.inf, np.nan, 1.5],
                    [1e300, -1e300, 0.0, -2.5]])
    for comp in (False, True):
        p = tmp_path / f"inf_{int(comp)}.mat"
        savemat(str(p), {"x": arr}, do_compression=comp)
        got = native_io.read_mat_f32(p)
        expected = _scipy_first(p)
        assert got is not None
        assert np.all(np.isfinite(got))
        np.testing.assert_array_equal(got, expected, err_msg=str(p))


def test_read_mat_batch_per_file_slices(tmp_path):
    """One big file among many small ones: each slice is sized from its
    own file (the arena must not scale as n_files × biggest file), and
    every array still round-trips exactly."""
    from scipy.io import savemat

    r = np.random.default_rng(13)
    paths, oracles = [], []
    for i in range(12):
        arr = r.standard_normal((3, 2 + i % 3))
        p = tmp_path / f"small{i}.mat"
        savemat(str(p), {"x": arr})
        paths.append(p)
        oracles.append(_scipy_first(p))
    big = r.standard_normal((300, 200))
    pb = tmp_path / "big.mat"
    savemat(str(pb), {"x": big})
    paths.insert(5, pb)
    oracles.insert(5, _scipy_first(pb))

    small_bytes = sum(p.stat().st_size for p in paths if p != pb)
    total_cap_elems = sum(
        min(1 << 20, max(1024, 8 * p.stat().st_size + 64)) for p in paths)
    # per-file sizing: total arena ≈ Σ 8·size_i, NOT n × 8·max_size
    assert total_cap_elems < 2 * (8 * pb.stat().st_size + 64) + \
        8 * small_bytes + 13 * 1100

    results = native_io.read_mat_batch(paths, n_threads=4)
    for p, got, expected in zip(paths, results, oracles):
        assert got is not None, p
        np.testing.assert_array_equal(got, expected, err_msg=str(p))


def test_read_mat_arena_overflow_declines(tmp_path):
    from scipy.io import savemat

    p = tmp_path / "big.mat"
    savemat(str(p), {"x": np.ones((64, 64))})
    assert native_io.read_mat_f32(p, max_elems=100) is None
    assert native_io.read_mat_f32(p, max_elems=64 * 64) is not None


def test_loader_first_mat_array_uses_native(tmp_path):
    """`loaders._first_mat_array` (the EEG ingest entry) must agree with the
    pure-scipy contract on both native-supported and fallback files."""
    from scipy.io import savemat

    from multimodal_eeg_fmri_tpu.data import loaders

    r = np.random.default_rng(3)
    pn = tmp_path / "native.mat"
    savemat(str(pn), {"x": r.standard_normal((18, 18))}, do_compression=True)
    np.testing.assert_array_equal(
        loaders._first_mat_array(str(pn)), _scipy_first(pn))

    # logical (mxUINT8 + logical flag) still parses as numeric on both paths
    pl = tmp_path / "logical.mat"
    savemat(str(pl), {"x": r.random((4, 4)) > 0.5})
    np.testing.assert_array_equal(
        loaders._first_mat_array(str(pl)), _scipy_first(pl))


def test_read_mat_fuzz_random_shapes(tmp_path):
    """Randomized shapes/dtypes/compression: native == scipy everywhere the
    native parser accepts (and it must accept all of these)."""
    from scipy.io import savemat

    r = np.random.default_rng(11)
    dtypes = [np.float64, np.float32, np.int32, np.int8, np.uint16]
    for i in range(20):
        ndim = int(r.integers(1, 4))
        shape = tuple(int(r.integers(1, 13)) for _ in range(ndim))
        dt = dtypes[i % len(dtypes)]
        arr = (r.standard_normal(shape) * 100).astype(dt)
        p = tmp_path / f"fz{i}.mat"
        savemat(str(p), {"x": arr}, do_compression=bool(i % 2))
        got = native_io.read_mat_f32(p)
        expected = _scipy_first(p)
        assert got is not None, (i, shape, dt)
        assert got.shape == expected.shape
        np.testing.assert_array_equal(got, expected)


def test_abi_mismatch_refuses_library(monkeypatch, caplog):
    """A stale .so whose fio_abi_version doesn't match the bindings must be
    refused (numpy fallback + warning), never called through the new
    argtypes — the round-4 stride→offsets ABI change would scribble at
    pointer-valued strides otherwise."""
    import logging

    monkeypatch.setattr(native_io, "_LIB", None)
    monkeypatch.setattr(native_io, "_TRIED", False)
    monkeypatch.setattr(native_io, "_ABI_VERSION", 999)
    monkeypatch.setattr(
        logging.getLogger("multimodal_eeg_fmri_tpu"), "propagate", True)
    with caplog.at_level(
            logging.WARNING,
            logger="multimodal_eeg_fmri_tpu.data.native_io"):
        assert native_io._load_library() is None
        assert not native_io.native_available()
    assert any("ABI" in r.message for r in caplog.records)
    # restored constants load fine again (monkeypatch undoes on exit; do a
    # manual probe here so a refusal wouldn't poison later tests)
    monkeypatch.setattr(native_io, "_ABI_VERSION", 2)
    monkeypatch.setattr(native_io, "_TRIED", False)
    assert native_io._load_library() is not None
