"""Regression guard for the Shardy conv-stack miscompilation.

jax 0.9.0's Shardy partitioner produces silently WRONG values for
``jit(vmap(conv → conv))`` with the vmapped batch inputs sharded over a
mesh axis (measured max|Δ| ≈ 6.4 vs the unsharded run; exact 0.0 under
GSPMD). The package pins GSPMD at import
(``multimodal_eeg_fmri_tpu._pin_gspmd_partitioner``); this test re-runs the
minimal repro under the ACTIVE partitioner so that (a) the pin works today
and (b) when jax is upgraded and the pin removed/bypassed, a still-broken
Shardy fails loudly here rather than corrupting sharded training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flax import linen as nn

import multimodal_eeg_fmri_tpu  # noqa: F401  (applies the partitioner pin)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


class TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(48, (7,), padding="SAME", name="c1")(x)
        return nn.Conv(16, (1,), padding="SAME", name="c2")(h)


def _fixture():
    F, B, T, C = 4, 8, 16, 12
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((F, B, T, C)), jnp.float32)
    mod = TwoConv()
    v = jax.jit(jax.vmap(lambda e: mod.init(jax.random.key(0), e)))(x)
    f = jax.jit(jax.vmap(mod.apply))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("ensemble", "data"))
    return mod, v, x, f, mesh


def test_vmapped_conv_stack_data_sharded_equals_unsharded():
    """x sharded (ensemble, data), params unsharded — the combination that
    Shardy miscompiled and GSPMD gets right. Exact equality required."""
    assert not jax.config.jax_use_shardy_partitioner, (
        "package import should have pinned the GSPMD partitioner")
    mod, v, x, f, mesh = _fixture()
    a = np.asarray(f(v, x))
    xs = jax.device_put(x, NamedSharding(mesh, P("ensemble", "data",
                                                 None, None)))
    b = np.asarray(f(v, xs))
    np.testing.assert_array_equal(a, b)


@pytest.mark.xfail(
    strict=False,
    reason="XLA SPMD (GSPMD and Shardy alike) miscompiles vmapped conv "
    "stacks whose PARAMS are sharded along the vmap axis — all folds "
    "collapse to one wrong output. Canary: when this starts passing, the "
    "underlying XLA bug is fixed and parallel/mesh.ensemble_vmap's "
    "shard_map detour can be reconsidered.")
def test_vmapped_conv_stack_param_sharded_canary():
    mod, v, x, f, mesh = _fixture()
    a = np.asarray(f(v, x))
    vs = jax.tree_util.tree_map(
        lambda t: jax.device_put(t, NamedSharding(
            mesh, P("ensemble", *([None] * (t.ndim - 1))))), v)
    b = np.asarray(f(vs, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_ensemble_vmap_shard_map_is_exact():
    """The framework's fold-parallel path (``parallel.mesh.ensemble_vmap``:
    vmap inside shard_map) must match the plain vmap on the SAME conv
    stack that breaks under auto-SPMD param sharding — to float tolerance
    (the local-chunk program tiles/fuses slightly differently than the
    full-batch vmap, ≤1 ulp; the auto-SPMD bug is O(1))."""
    from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh, ensemble_vmap

    mod, v, x, f, _ = _fixture()
    a = np.asarray(f(v, x))
    plan = build_mesh(jax.devices()[:8], ensemble=4, data=2)
    g = jax.jit(ensemble_vmap(mod.apply, plan))
    b = np.asarray(g(v, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
