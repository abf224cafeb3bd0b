"""Native (mmap + zlib + thread-pool) MAT v5 batch ingest vs scipy.

The EEG ingest is thousands of small per-subject `.mat` files
(`EEG_CODE/eeg_data_utils.py:46-119`: conn/powspctrm per subject × band ×
condition — 63 subjects × 5 bands × 2 conditions × 3 metrics ≈ 1.9k conn
files alone). scipy.io.loadmat pays Python object-construction overhead per
file; the native path parses straight from the mmap into one float32 arena.

Usage: python benchmarks/mat_ingest.py [n_files [rows [cols [compressed]]]]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_eeg_fmri_tpu.data import native_io  # noqa: E402


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    cols = int(sys.argv[3]) if len(sys.argv) > 3 else 18
    compressed = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    from scipy.io import loadmat, savemat

    r = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(n_files):
            p = Path(td) / f"conn_Alpha_rest_sub{i:03d}.mat"
            savemat(str(p), {"conn": r.standard_normal((rows, cols))},
                    do_compression=compressed)
            paths.append(str(p))

        out = {"native_available": native_io.native_available()}

        if out["native_available"]:
            native_io.read_mat_batch(paths[:2])  # warm the thread pool
            t0 = time.perf_counter()
            arrs = native_io.read_mat_batch(paths)
            out["native_s"] = round(time.perf_counter() - t0, 4)
            assert len(arrs) == n_files and arrs[0].shape == (rows, cols)

        t0 = time.perf_counter()
        mats = [np.asarray(loadmat(p)["conn"], np.float32) for p in paths]
        out["scipy_s"] = round(time.perf_counter() - t0, 4)
        assert mats[0].shape == (rows, cols)
        if out["native_available"]:
            np.testing.assert_array_equal(arrs[0], mats[0])

        if out.get("native_s") and out.get("scipy_s"):
            out["speedup"] = round(out["scipy_s"] / out["native_s"], 2)
        print(json.dumps({"metric": "mat_ingest", "files": n_files,
                          "shape": [rows, cols], "compressed": compressed,
                          **out}))


if __name__ == "__main__":
    main()
