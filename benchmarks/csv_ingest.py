"""Native (mmap + thread-pool) CSV batch ingest vs pandas.

Reproduces docs/DESIGN.md's "Native runtime" ~3× number on the reference's
file layout: many small per-subject CSVs (fMRI activation/connectivity,
`fMRI_CODE/run_fmri_v11.py:81-155`).

Usage: python benchmarks/csv_ingest.py [n_files [rows [cols]]]
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
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cols = int(sys.argv[3]) if len(sys.argv) > 3 else 90

    r = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        header = ",".join(f"roi_{j}" for j in range(cols))
        for i in range(n_files):
            p = Path(td) / f"sub{i:03d}.csv"
            np.savetxt(p, r.standard_normal((rows, cols)).astype(np.float32),
                       delimiter=",", fmt="%.6f", header=header, comments="")
            paths.append(str(p))

        out = {"native_available": native_io.native_available()}

        if out["native_available"]:
            native_io.read_csv_batch(paths[:2])  # warm the thread pool
            t0 = time.perf_counter()
            arrs = native_io.read_csv_batch(paths)
            out["native_s"] = round(time.perf_counter() - t0, 4)
            assert len(arrs) == n_files and arrs[0].shape == (rows, cols)

        try:
            import pandas as pd

            t0 = time.perf_counter()
            dfs = [pd.read_csv(p).to_numpy(np.float32) for p in paths]
            out["pandas_s"] = round(time.perf_counter() - t0, 4)
            assert dfs[0].shape == (rows, cols)
        except ImportError:
            out["pandas_s"] = None

        if out.get("native_s") and out.get("pandas_s"):
            out["speedup"] = round(out["pandas_s"] / out["native_s"], 2)
        print(json.dumps({"metric": "csv_ingest",
                          "files": n_files, "shape": [rows, cols], **out}))


if __name__ == "__main__":
    main()
