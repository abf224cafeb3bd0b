"""A REAL multi-process (process_count == 2) execution of the DCN path.

`parallel/distributed.py` + `parallel/input.py` were previously tested only
against simulated process device lists (tests/test_distributed.py); this
drives `jax.distributed.initialize` with an actual 2-process localhost
rendezvous (gloo CPU collectives), `build_hybrid_mesh`, per-process fold
loading, `make_array_from_process_local_data` assembly, and the manual-SPMD
fold axis — asserting the per-fold metric history equals the single-process
run. Implemented in examples/multihost_cpu.py; this test executes it.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "multihost_cpu.py")],
        capture_output=True, text=True, timeout=1500, cwd=str(REPO))
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
    assert r.returncode == 0, tail
    assert "multihost_cpu OK: 2 processes" in r.stdout, tail
    assert "cross-process DP (1x8) fold == single-process run" in r.stdout, (
        tail)
