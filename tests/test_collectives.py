"""Collective wrappers under shard_map on the 8-device CPU mesh — the
communication-backend component (SURVEY §2.3/§5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_eeg_fmri_tpu.parallel.collectives import (
    all_gather,
    pmean_grads,
    ppermute_shift,
    psum,
)
from multimodal_eeg_fmri_tpu.parallel.mesh import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    build_mesh,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@pytest.fixture(scope="module")
def plan():
    return build_mesh(jax.devices()[:8], ensemble=4, data=2)


def _shard_map(plan, fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=plan.mesh, in_specs=in_specs,
                         out_specs=out_specs)


def test_psum_over_data_axis(plan):
    x = jnp.arange(8.0).reshape(2, 4)  # rows shard over data axis

    def body(xs):  # xs: (1, 4) per shard
        return psum(xs, DATA_AXIS)

    out = jax.jit(_shard_map(plan, body, P(DATA_AXIS, None),
                             P(DATA_AXIS, None)))(x)
    expected = np.tile(np.asarray(x).sum(0, keepdims=True), (2, 1))
    np.testing.assert_allclose(np.asarray(out), expected)


def test_pmean_grads_dp_semantics(plan):
    grads = {"w": jnp.asarray([[1.0, 3.0], [5.0, 7.0]])}

    def body(g):
        return pmean_grads(g, DATA_AXIS)

    out = jax.jit(_shard_map(plan, body, (P(DATA_AXIS, None),),
                             P(DATA_AXIS, None)))(grads["w"])
    np.testing.assert_allclose(np.asarray(out),
                               [[3.0, 5.0], [3.0, 5.0]])


def test_all_gather_over_ensemble(plan):
    x = jnp.arange(4.0).reshape(4, 1)

    def body(xs):
        return all_gather(xs, ENSEMBLE_AXIS, axis=0)

    out = jax.jit(_shard_map(plan, body, P(ENSEMBLE_AXIS, None),
                             P(ENSEMBLE_AXIS, None)))(x)
    # every ensemble shard now holds all 4 rows
    assert out.shape == (16, 1)
    np.testing.assert_allclose(np.asarray(out)[:4, 0], [0, 1, 2, 3])


def test_ppermute_ring_shift(plan):
    x = jnp.asarray([[10.0], [20.0], [30.0], [40.0]])

    def body(xs):
        return ppermute_shift(xs, ENSEMBLE_AXIS, shift=1)

    out = jax.jit(_shard_map(plan, body, P(ENSEMBLE_AXIS, None),
                             P(ENSEMBLE_AXIS, None)))(x)
    # ring: shard i's value moves to shard (i+1) % 4
    np.testing.assert_allclose(np.asarray(out)[:, 0],
                               [40.0, 10.0, 20.0, 30.0])