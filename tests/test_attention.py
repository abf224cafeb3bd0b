"""Flash-attention kernel parity vs the einsum oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.ops.attention import (
    attention,
    flash_attention,
    flash_attention_lse,
    reference_attention,
)


@pytest.mark.parametrize("tq,tk,d", [(128, 128, 64), (200, 333, 32),
                                     (64, 512, 128)])
def test_flash_matches_reference(tq, tk, d):
    key = jax.random.key(0)
    B, H = 2, 4
    q = jax.random.normal(key, (B, H, tq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, tk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, tk, d))
    ref = reference_attention(q, k, v)
    ours = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_small_uses_reference():
    key = jax.random.key(1)
    q = jax.random.normal(key, (1, 2, 8, 16))
    out = attention(q, q, q)
    ref = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_flash_gradients_flow():
    key = jax.random.key(2)
    q = jax.random.normal(key, (1, 1, 128, 32))

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, interpret=True) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    # parity with the reference gradient
    g_ref = jax.grad(lambda q: jnp.sum(reference_attention(q, q, q) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_lse_values_and_gradients():
    """flash_attention_lse must return the exact per-row logsumexp of the
    scaled scores AND be differentiable in BOTH outputs: a loss touching
    out and lse must match the einsum/logsumexp oracle's gradients (the
    lse cotangent folds into the backward's Δ term — this pins that
    algebra)."""
    key = jax.random.key(11)
    B, H, tq, tk, d = 2, 2, 200, 333, 32
    q = jax.random.normal(key, (B, H, tq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, tk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, tk, d))
    scale = 1.0 / np.sqrt(d)

    def oracle(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        lse = jax.scipy.special.logsumexp(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
        return out, lse

    out_f, lse_f = flash_attention_lse(q, k, v, interpret=True)
    out_o, lse_o = oracle(q, k, v)
    assert lse_f.shape == (B, H, tq) and lse_f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_o),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        def inner(q, k, v):
            out, lse = fn(q, k, v)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(lse))
        return inner

    g_f = jax.grad(loss(lambda q, k, v: flash_attention_lse(
        q, k, v, interpret=True)), argnums=(0, 1, 2))(q, k, v)
    g_o = jax.grad(loss(oracle), argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_f, g_o, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_flash_bf16_compute_forward_and_backward():
    """compute_dtype=bfloat16 feeds the MXU bf16 tiles but keeps f32
    accumulation + f32 softmax statistics: outputs and all three grads must
    track the f32 oracle within bf16 input-rounding error (~8e-3 relative
    on unit-scale operands), not bf16 OUTPUT error (~1e-1 if accumulation
    were bf16 too — that regression is exactly what the tolerance pins)."""
    key = jax.random.key(7)
    B, H, tq, tk, d = 2, 2, 200, 333, 64
    q = jax.random.normal(key, (B, H, tq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, tk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, tk, d))
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, H, tq, d))

    out_bf, vjp_bf = jax.vjp(
        lambda q, k, v: flash_attention(
            q, k, v, interpret=True, compute_dtype=jnp.bfloat16), q, k, v)
    out_ref, vjp_ref = jax.vjp(reference_attention, q, k, v)
    assert out_bf.dtype == jnp.float32  # I/O dtype is unchanged
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(out_ref),
                               rtol=2e-2, atol=2e-2)
    for got, want, name in zip(vjp_bf(g), vjp_ref(g), "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-2, atol=5e-2,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("tq,tk,d", [(200, 333, 32), (64, 300, 128)])
def test_flash_backward_kernel_parity(tq, tk, d):
    """The blockwise backward kernels (dq, dk, dv) must match the einsum
    VJP on ragged (padded) shapes, with distinct q/k/v tensors."""
    key = jax.random.key(3)
    B, H = 2, 2
    q = jax.random.normal(key, (B, H, tq, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, tk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, tk, d))
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, H, tq, d))

    _, vjp_flash = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, interpret=True), q, k, v)
    _, vjp_ref = jax.vjp(reference_attention, q, k, v)
    for got, want, name in zip(vjp_flash(g), vjp_ref(g), "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")
