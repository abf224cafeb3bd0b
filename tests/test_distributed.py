"""Multi-host mesh glue (parallel/distributed.py): single-process fallback,
DCN-spanning device arrangement (via simulated multi-process device lists),
and init idempotence. The reference has no distributed runtime at all
(SURVEY §2.3); this is the framework-owned equivalent."""

from dataclasses import dataclass

import pytest

import jax

from multimodal_eeg_fmri_tpu.parallel.distributed import (
    build_hybrid_mesh, initialize_distributed)
from multimodal_eeg_fmri_tpu.parallel.mesh import DATA_AXIS, ENSEMBLE_AXIS

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@dataclass(frozen=True, eq=True)
class FakeDev:
    """Enough device surface for mesh arrangement logic (never executed on)."""

    id: int
    process_index: int
    platform: str = "cpu"
    device_kind: str = "cpu"


def test_initialize_single_process_noop_and_idempotent():
    assert initialize_distributed() == 1
    assert initialize_distributed() == 1  # second call: no re-init attempt


def test_hybrid_mesh_single_process_falls_back():
    plan = build_hybrid_mesh(ensemble=4, data=2)
    assert plan.mesh.shape == {ENSEMBLE_AXIS: 4, DATA_AXIS: 2}
    assert plan.n_devices == 8


def test_hybrid_mesh_keeps_data_axis_intra_host():
    """With 2 simulated hosts × 4 devices, every data-axis row must sit
    inside one process (DP psum on ICI) and the ensemble axis must span
    both processes (only independent members cross DCN)."""
    devs = [FakeDev(i, i // 4) for i in range(8)]
    plan = build_hybrid_mesh(ensemble=4, data=2, devices=devs)
    arr = plan.mesh.devices
    assert arr.shape == (4, 2)
    for row in arr:  # one (ensemble-index) row = one DP group
        assert len({d.process_index for d in row}) == 1
    assert {d.process_index for d in arr[:, 0]} == {0, 1}


def test_hybrid_mesh_rejects_dp_across_dcn():
    devs = [FakeDev(i, i // 4) for i in range(8)]
    with pytest.raises(ValueError, match="ICI"):
        build_hybrid_mesh(ensemble=1, data=8, devices=devs)
    with pytest.raises(ValueError, match="granule count"):
        # ensemble=2 with data=4 puts one member per host — fine — but
        # ensemble not divisible by granules must fail loudly:
        build_hybrid_mesh(ensemble=8, data=1,
                          devices=[FakeDev(i, i // 3) for i in range(9)][:8]
                          + [])
    with pytest.raises(ValueError, match="!= 8 devices"):
        build_hybrid_mesh(ensemble=3, data=2, devices=devs)
