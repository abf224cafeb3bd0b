"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
8-device CPU mesh must equal sequential stage application, forward and
backward, for any microbatch count."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_eeg_fmri_tpu.models.layers import gelu
from multimodal_eeg_fmri_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_stage_params,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _stages(n_stages=8, d=16, seed=0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.normal(size=(n_stages, d, d)) / np.sqrt(d),
                         jnp.float32),
        "b": jnp.asarray(r.normal(size=(n_stages, d)) * 0.1, jnp.float32),
    }


def _stage_fn(p, h):
    return gelu(h @ p["w"] + p["b"]) + h  # residual MLP stage


def _sequential(params, x):
    for i in range(params["w"].shape[0]):
        x = _stage_fn(jax.tree_util.tree_map(lambda p: p[i], params), x)
    return x


@needs8
@pytest.mark.parametrize("n_micro", [8, 16])
def test_pipeline_matches_sequential(n_micro):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("stage",))
    params = _stages()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 16)),
                    jnp.float32)
    want = _sequential(params, x)
    sp = shard_stage_params(params, mesh)
    got = jax.jit(lambda p, x: pipeline_apply(p, x, _stage_fn, mesh,
                                              n_micro=n_micro))(sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@needs8
def test_pipeline_backward_matches_sequential():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("stage",))
    params = _stages()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 16)),
                    jnp.float32)

    loss_seq = lambda p, x: jnp.sum(_sequential(p, x) ** 2)
    loss_pipe = lambda p, x: jnp.sum(
        pipeline_apply(p, x, _stage_fn, mesh, n_micro=8) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(params, x)
    g_pipe = jax.jit(jax.grad(loss_pipe))(shard_stage_params(params, mesh), x)
    for k in g_seq:
        np.testing.assert_allclose(np.asarray(g_pipe[k]),
                                   np.asarray(g_seq[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


@needs8
def test_pipeline_rejects_indivisible_batch():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("stage",))
    params = _stages()
    x = jnp.zeros((10, 16), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(params, x, _stage_fn, mesh, n_micro=8)
