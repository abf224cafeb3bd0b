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
