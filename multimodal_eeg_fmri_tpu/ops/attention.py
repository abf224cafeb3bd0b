"""Fused blockwise (flash) attention — Pallas TPU kernel.

The reference's attention is torch ``nn.MultiheadAttention`` over ≤ a few
hundred post-conv timesteps (SURVEY §5 long-context: full quadratic, no
blockwise anything). At those lengths XLA's fused einsum path is already
fine — but the framework targets production headroom (longer recordings,
higher sampling rates), so the transformer blocks route through this kernel
when the sequence is long enough to pay off.

Design (standard online-softmax blockwise attention):
- grid = (batch·heads, Q blocks); the K/V sequence streams through VMEM in
  ``block_k`` chunks inside a ``fori_loop`` with running (max, sum, acc)
  carries — O(T) VMEM instead of O(T²).
- QKᵀ and PV hit the MXU per block (``preferred_element_type=f32``);
  rescaling is VPU work fused around them.
- Shapes are padded to the (8·k, 128) tile grid by the wrapper; padding keys
  are masked with -inf before the softmax.

``flash_attention`` is the public entry: jnp reference semantics (tested
against the einsum path to 1e-5), Pallas on TPU, interpreter mode in tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl



def reference_attention(q, k, v, scale: Optional[float] = None,
                        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain einsum attention (the oracle + small-sequence path).
    q: (B, H, Tq, D), k/v: (B, H, Tk, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int,
                  scale: float):
    """One (batch·head, q-block) program: stream K/V blocks with online
    softmax. Refs: q (block_q, D), k/v (Tk_pad, D), o (block_q, D)."""
    q = q_ref[...].astype(jnp.float32) * scale
    block_q, d = q.shape
    tk_pad = k_ref.shape[0]
    n_kv = tk_pad // block_k

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        # mask out padded keys past the true kv length
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blockwise fused attention. Non-causal, full bidirectional (the only
    masking the reference models use is none — queries attend everywhere).

    Differentiable via custom VJP: the forward streams blockwise through the
    Pallas kernel; the backward recomputes attention with the einsum
    formulation (correct, O(T²) memory in backward only — a flash backward
    kernel is the next optimization rung)."""
    return _flash_forward(q, k, v, block_q, block_k, interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def _flash_forward(q, k, v, block_q=128, block_k=128, interpret=False):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    d_pad = _round_up(D, 128)

    def pad(x, t_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]),
                           (0, d_pad - D)))

    qp = pad(q, tq_pad).reshape(B * H, tq_pad, d_pad)
    kp = pad(k, tk_pad).reshape(B * H, tk_pad, d_pad)
    vp = pad(v, tk_pad).reshape(B * H, tk_pad, d_pad)

    grid = (B * H, tq_pad // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=Tk,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, tk_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, tk_pad, d_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad),
                               lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, tq_pad, d_pad)[:, :, :Tq, :D]


def _flash_fwd_rule(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_bwd_rule(block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(reference_attention, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def attention(q, k, v, min_flash_len: int = 256,
              interpret: bool = False) -> jnp.ndarray:
    """Dispatch: einsum path for short sequences (the reference regime),
    flash kernel once the K/V length justifies blockwise streaming."""
    if q.shape[2] < min_flash_len and k.shape[2] < min_flash_len:
        return reference_attention(q, k, v)
    return flash_attention(q, k, v, interpret=interpret)
