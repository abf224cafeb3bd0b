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


def test_process_fold_range_partitions_globally():
    """Simulated 4-process run: the per-process ranges tile [0, n) in
    contiguous, ordered, non-overlapping blocks (the hybrid mesh puts the
    process dimension outermost on the ensemble axis)."""
    from multimodal_eeg_fmri_tpu.parallel.input import process_fold_range

    n = 12
    covered = []
    for p in range(4):
        lo, hi = process_fold_range(n, process_index=p, num_processes=4)
        assert hi - lo == 3
        covered.extend(range(lo, hi))
    assert covered == list(range(n))

    with pytest.raises(ValueError, match="not divisible"):
        process_fold_range(10, process_index=0, num_processes=4)


def test_global_ensemble_tree_matches_device_put():
    """Single-process assembly: global arrays built from 'local' data must
    equal the device_put path (values AND sharding) and be consumable by
    the ensemble_vmap training path."""
    import numpy as np

    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.parallel.input import (
        global_ensemble_tree, process_fold_range)
    from multimodal_eeg_fmri_tpu.parallel.mesh import (
        build_mesh, ensemble_vmap, shard_ensemble_tree)

    plan = build_mesh(jax.devices()[:8], ensemble=4, data=2)
    r = np.random.default_rng(0)
    tree = {"x": r.standard_normal((4, 6, 5)).astype(np.float32),
            "y": r.standard_normal((4, 6)).astype(np.float32)}

    lo, hi = process_fold_range(4, plan=plan)
    assert (lo, hi) == (0, 4)  # single process owns every fold
    glob = global_ensemble_tree(plan, {k: v[lo:hi] for k, v in tree.items()})
    ref = shard_ensemble_tree(plan, jax.tree_util.tree_map(jnp.asarray, tree))

    for k in tree:
        np.testing.assert_array_equal(np.asarray(glob[k]), tree[k])
        assert glob[k].sharding == ref[k].sharding, k
        # per-device shards match the device_put layout exactly
        for sh_g, sh_r in zip(glob[k].addressable_shards,
                              ref[k].addressable_shards):
            assert sh_g.index == sh_r.index

    out = jax.jit(ensemble_vmap(
        lambda t: jnp.mean(t["x"], axis=(0, 1)) + jnp.mean(t["y"]), plan))(
        glob)
    expect = tree["x"].mean(axis=(1, 2)) + tree["y"].mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-6)


def test_global_batch_tree_shards_rows():
    import numpy as np

    from multimodal_eeg_fmri_tpu.parallel.input import global_batch_tree
    from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh

    plan = build_mesh(jax.devices()[:8], ensemble=1, data=8)
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    glob = global_batch_tree(plan, {"x": x})["x"]
    np.testing.assert_array_equal(np.asarray(glob), x)
    # rows split across the data axis: each device holds 2 rows
    assert {s.data.shape for s in glob.addressable_shards} == {(2, 2)}


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
