"""bench.py's one-line JSON contract: a CPU-fallback run must not be
misreadable as a TPU regression (VERDICT r3 weak #2)."""

import importlib.util
import json
import sys
from pathlib import Path


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cpu_fallback_nulls_vs_baseline():
    line = _bench().result_line(1092.16, {"k": 1.0}, "cpu")
    assert line["vs_baseline"] is None
    assert line["extra"]["platform"] == "cpu"
    assert json.loads(json.dumps(line))["vs_baseline"] is None


def test_tpu_run_reports_ratio():
    line = _bench().result_line(1.31, {}, "tpu")
    assert abs(line["vs_baseline"] - 10.0 / 1.31) < 1e-2
    assert line["extra"]["platform"] == "tpu"
