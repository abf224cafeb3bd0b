"""Ring attention (ops/ring_attention.py): sequence parallelism on the
8-device CPU mesh. The T axis shards over the ring; K/V chunks rotate by
ppermute; the online-softmax merge must reproduce full attention exactly
(same math as the flash kernel's blockwise accumulation), forward AND
backward through the scan/ppermute transpose."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_eeg_fmri_tpu.ops.attention import reference_attention
from multimodal_eeg_fmri_tpu.ops.ring_attention import (
    ring_attention,
    shard_sequence,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh(n=8, axis="data"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _qkv(B=2, H=2, T=64, D=16, seed=0):
    r = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(r.normal(size=(B, H, T, D)), jnp.float32)
    return mk(0), mk(1), mk(2)


@needs8
def test_ring_forward_matches_reference():
    mesh = _mesh()
    q, k, v = _qkv()
    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@needs8
def test_ring_backward_matches_reference():
    mesh = _mesh()
    q, k, v = _qkv(T=32)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for gr, gg, name in zip(g_ref, g_ring, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   atol=5e-5, rtol=5e-5, err_msg=name)


@needs8
def test_ring_bf16_compute_forward_and_backward():
    """compute_dtype=bfloat16 (same contract as the flash kernel: bf16 MXU
    inputs, f32 accumulation + f32 online-softmax statistics) must track
    the f32 oracle within bf16 input-rounding error on unit-scale
    operands — forward and all three gradients."""
    mesh = _mesh()
    q, k, v = _qkv(T=64)
    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ring_attention(
        a, b, c, mesh, compute_dtype=jnp.bfloat16))(qs, ks, vs)
    assert got.dtype == jnp.float32  # I/O dtype unchanged
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(
            q, k, v, mesh, compute_dtype=jnp.bfloat16) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for gr, gg, name in zip(g_ref, g_ring, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   atol=8e-2, rtol=8e-2,
                                   err_msg=f"d{name} mismatch")


@needs8
def test_ring_flash_chunks_forward_and_backward():
    """impl='flash' routes each hop's chunk attention through the Pallas
    kernel (flash_attention_lse) and merges hops via logaddexp of the
    per-row lse — must equal full attention exactly, forward and backward
    (the lse gradient path through the merge is what this pins).
    T_local=32 < the 128 tile also exercises the kernel's internal
    padding inside the ring."""
    mesh = _mesh()
    q, k, v = _qkv(T=256, seed=5)
    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    run = jax.jit(lambda a, b, c: ring_attention(
        a, b, c, mesh, impl="flash", interpret=True))
    got = run(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(
            q, k, v, mesh, impl="flash", interpret=True) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for gr, gg, name in zip(g_ref, g_ring, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name} mismatch")


@needs8
def test_ring_flash_rejects_custom_scale():
    mesh = _mesh()
    q, k, v = _qkv(T=64)
    from multimodal_eeg_fmri_tpu.ops.ring_attention import (
        ring_attention_local)
    with pytest.raises(ValueError, match="fixed 1/sqrt"):
        ring_attention_local(q, k, v, axis_name="data", axis_size=8,
                             scale=0.5, impl="flash")


@needs8
def test_ring_rejects_indivisible_t():
    mesh = _mesh()
    q, k, v = _qkv(T=30)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh)


@needs8
def test_ring_numerics_extreme_logits():
    """Online merge must stay stable when one chunk dominates the softmax
    (large score spread across the ring)."""
    mesh = _mesh()
    q, k, v = _qkv(T=64, D=16, seed=3)
    q = q * 20.0  # sharp softmax — max logit lives in one chunk
    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(qs, ks, vs)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


@needs8
def test_ring_composes_with_head_sharding():
    """Sequence x tensor parallelism in one mesh: T over a ring of 4,
    heads over a model axis of 2 — still exact vs full attention."""
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("seq", "model"))
    q, k, v = _qkv(B=2, H=4, T=64, D=16, seed=9)
    ref = reference_attention(q, k, v)
    qs, ks, vs = (shard_sequence(x, mesh, axis="seq", head_axis="model")
                  for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ring_attention(
        a, b, c, mesh, axis="seq", head_axis="model"))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
