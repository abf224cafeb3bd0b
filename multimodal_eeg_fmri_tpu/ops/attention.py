"""Fused blockwise (flash) attention — Pallas TPU kernels, fwd + bwd.

The reference's attention is torch ``nn.MultiheadAttention`` over ≤ a few
hundred post-conv timesteps (SURVEY §5 long-context: full quadratic, no
blockwise anything). At those lengths XLA's fused einsum path is already
fine — but the framework targets production headroom (longer recordings,
higher sampling rates), so the transformer blocks route through this kernel
when the sequence is long enough to pay off (``flash_min_len`` is set from
the measured einsum↔flash crossover on v5e — see docs/DESIGN.md).

Design (standard online-softmax blockwise attention):
- forward grid = (batch·heads, Q blocks, K blocks): K/V stream through the
  GRID (one ``block_k`` tile resident per program), with the running
  (max, sum, acc) carried in VMEM scratch across the innermost K dimension —
  O(block) VMEM, unbounded T. The kernel also emits the per-row logsumexp.
- backward = two blockwise kernels over the same tiling: one gridded over
  K blocks (accumulates dK/dV while Q/dO blocks stream through the grid) and
  one over Q blocks (accumulates dQ while K/V stream) — the Dao et al.
  recomputation form: nothing of size (Tq, Tk) is ever materialized.
- QKᵀ / PV / dS·K / dSᵀ·Q hit the MXU per tile
  (``preferred_element_type=f32``); softmax rescaling is VPU work fused
  around them. Shapes are padded to the (8·k, 128) tile grid by the wrapper;
  padded keys are masked to -inf, padded query rows get lse=+inf so the
  backward's p = exp(s − lse) vanishes for them.

``flash_attention`` is the public entry: jnp reference semantics (tested
against the einsum path + grads to 1e-5), Pallas on TPU, interpreter mode
in tests.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward kernel: grid (BH, n_q, n_k), K innermost; carries in VMEM scratch
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, block_k: int, kv_len: int, scale: float,
                compute_dtype=jnp.float32):
    kb = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if compute_dtype == jnp.float32:
        q = q_ref[0].astype(jnp.float32) * scale      # (block_q, D)
        s = jax.lax.dot_general(
            q, k_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (block_q, block_k)
    else:
        # MXU inputs in compute_dtype (bf16), f32 accumulation — the raw
        # tiles are cast (not the pre-scaled q) so the scale multiply
        # keeps the full f32 mantissa
        s = jax.lax.dot_general(
            q_ref[0].astype(compute_dtype), k_ref[0].astype(compute_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -jnp.inf)

    m_prev, l_prev = m_scr[...], l_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = alpha * acc_scr[...] + jax.lax.dot_general(
        p.astype(compute_dtype), v_ref[0].astype(compute_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == n_k - 1)
    def _finalize():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        # +inf for fully-masked (padded) query rows so the backward's
        # p = exp(s − lse) is exactly 0 for them
        lse = jnp.where(l > 0, m_scr[...] + jnp.log(jnp.maximum(l, 1e-30)),
                        jnp.inf)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, block_k: int, kv_len: int, scale: float,
                    compute_dtype=jnp.float32):
    """grid (BH, n_k, n_q): K/V tile resident; Q/dO blocks stream through
    the innermost grid dim; dK/dV accumulate in scratch."""
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    kb = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(compute_dtype)                # (block_q, D)
    k = k_ref[0].astype(compute_dtype)                # (block_k, D)
    v = v_ref[0].astype(compute_dtype)
    do = do_ref[0].astype(compute_dtype)              # (block_q, D)
    lse = lse_ref[0][:, :1].astype(jnp.float32)       # (block_q, 1)
    delta = delta_ref[0][:, :1].astype(jnp.float32)   # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                         # (block_q, block_k)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp(s - lse)                              # (block_q, block_k)

    # dV += Pᵀ · dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(compute_dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dS = P ⊙ (dO·Vᵀ − Δ);  dK += dSᵀ · Q · scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(compute_dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr,
                   *, block_k: int, kv_len: int, scale: float,
                   compute_dtype=jnp.float32):
    """grid (BH, n_q, n_k): Q tile resident; K/V stream; dQ accumulates."""
    kb = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(compute_dtype)
    k = k_ref[0].astype(compute_dtype)
    v = v_ref[0].astype(compute_dtype)
    do = do_ref[0].astype(compute_dtype)
    lse = lse_ref[0][:, :1].astype(jnp.float32)
    delta = delta_ref[0][:, :1].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(compute_dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(kb == n_k - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pad_bh(x, t_pad, d_pad):
    B, H, T, D = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - T), (0, d_pad - D))
                   ).reshape(B * H, t_pad, d_pad)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret", "compute_dtype"))
def _flash_forward(q, k, v, block_q=1024, block_k=1024, interpret=False,
                   compute_dtype=jnp.float32):
    """Returns (out (B,H,Tq,D), lse (B·H, Tq_pad, 128) row-broadcast)."""
    from jax.experimental.pallas import tpu as pltpu

    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    block_q = min(block_q, _round_up(Tq, 128))
    block_k = min(block_k, _round_up(Tk, 128))
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    d_pad = _round_up(D, 128)

    qp = _pad_bh(q, tq_pad, d_pad)
    kp = _pad_bh(k, tk_pad, d_pad)
    vp = _pad_bh(v, tk_pad, d_pad)

    grid = (B * H, tq_pad // block_q, tk_pad // block_k)
    kernel = functools.partial(_fwd_kernel, block_k=block_k, kv_len=Tk,
                               scale=scale, compute_dtype=compute_dtype)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, tq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((B * H, tq_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),      # running max
            pltpu.VMEM((block_q, 1), jnp.float32),      # running sum
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, tq_pad, d_pad)[:, :, :Tq, :D], lse


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret", "compute_dtype"))
def _flash_backward(q, k, v, o, lse, g, block_q=1024, block_k=1024,
                    interpret=False, compute_dtype=jnp.float32,
                    g_lse=None):
    """``g_lse`` (B, H, Tq), if given, is the cotangent of the per-row
    logsumexp (``flash_attention_lse``). ∂lse_r/∂s_rc = p_rc, so the lse
    contribution to dS is ``+ p ⊙ g_lse`` — algebraically identical to
    replacing Δ with Δ − g_lse in ``dS = P ⊙ (dP − Δ)``. Folding it here
    means the backward kernels need no changes at all."""
    from jax.experimental.pallas import tpu as pltpu

    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / math.sqrt(D)
    block_q = min(block_q, _round_up(Tq, 128))
    block_k = min(block_k, _round_up(Tk, 128))
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    d_pad = _round_up(D, 128)

    qp = _pad_bh(q, tq_pad, d_pad)
    kp = _pad_bh(k, tk_pad, d_pad)
    vp = _pad_bh(v, tk_pad, d_pad)
    gp = _pad_bh(g, tq_pad, d_pad)
    # Δ = rowsum(dO ⊙ O): tiny elementwise pass, fused by XLA
    delta = jnp.sum(gp.reshape(B, H, tq_pad, d_pad)[:, :, :, :D]
                    * jnp.pad(o, ((0, 0), (0, 0), (0, tq_pad - Tq),
                                  (0, 0))),
                    axis=-1).reshape(B * H, tq_pad)
    if g_lse is not None:
        delta = delta - jnp.pad(
            g_lse.astype(jnp.float32), ((0, 0), (0, 0), (0, tq_pad - Tq))
        ).reshape(B * H, tq_pad)
    delta = jnp.broadcast_to(delta[..., None], (B * H, tq_pad, 128))

    bh = B * H
    dkv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_k=block_k, kv_len=Tk,
                          scale=scale, compute_dtype=compute_dtype),
        grid=(bh, tk_pad // block_k, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, kv_len=Tk,
                          scale=scale, compute_dtype=compute_dtype),
        grid=(bh, tq_pad // block_q, tk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    def unpad(x, t, orig_dtype):
        return x.reshape(B, H, -1, d_pad)[:, :, :t, :D].astype(orig_dtype)

    return unpad(dq, Tq, q.dtype), unpad(dk, Tk, k.dtype), unpad(
        dv, Tk, v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Blockwise fused attention. Non-causal, full bidirectional (the only
    masking the reference models use is none — queries attend everywhere).

    Differentiable via custom VJP: both directions are blockwise Pallas
    kernels; nothing of size (Tq, Tk) is materialized in either pass.

    ``compute_dtype=jnp.bfloat16`` feeds the per-tile MXU matmuls bf16
    operands (f32 accumulation, f32 online softmax/rescaling throughout) —
    the v5e MXU runs bf16 at ~2× its f32 rate, so this trades ≲1e-2
    per-element error for throughput on long sequences. The softmax
    statistics (m, l, lse, Δ) and the dP/dS elementwise algebra stay f32
    in every path, so the precision loss is confined to the matmul inputs."""
    out, _ = _flash_forward(q, k, v, block_q, block_k, interpret,
                            compute_dtype)
    return out


def _flash_fwd_rule(q, k, v, block_q, block_k, interpret, compute_dtype):
    out, lse = _flash_forward(q, k, v, block_q, block_k, interpret,
                              compute_dtype)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(block_q, block_k, interpret, compute_dtype, residuals,
                    g):
    q, k, v, o, lse = residuals
    return _flash_backward(q, k, v, o, lse, g, block_q, block_k, interpret,
                           compute_dtype)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _unpad_lse(lse, B, H, Tq):
    """(B·H, tq_pad, 128) row-broadcast → (B, H, Tq)."""
    return lse.reshape(B, H, -1, 128)[:, :, :Tq, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_lse(
    q: jnp.ndarray,  # (B, H, Tq, D)
    k: jnp.ndarray,  # (B, H, Tk, D)
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """``flash_attention`` that also returns the per-row logsumexp
    (B, H, Tq) in f32 — DIFFERENTIABLE in both outputs, which is what a
    blockwise/distributed caller needs to merge partial attention results
    (two chunks combine exactly via ``logaddexp`` of their lse's and an
    exp-weighted sum of their outputs; see ring_attention's flash path).

    The lse cotangent costs nothing extra in the backward kernels:
    ∂lse_r/∂s_rc = p_rc, so it folds into the existing Δ term
    (``_flash_backward(g_lse=...)``)."""
    out, lse = _flash_forward(q, k, v, block_q, block_k, interpret,
                              compute_dtype)
    B, H, Tq, _ = q.shape
    return out, _unpad_lse(lse, B, H, Tq)


def _flash_lse_fwd_rule(q, k, v, block_q, block_k, interpret,
                        compute_dtype):
    out, lse = _flash_forward(q, k, v, block_q, block_k, interpret,
                              compute_dtype)
    B, H, Tq, _ = q.shape
    return (out, _unpad_lse(lse, B, H, Tq)), (q, k, v, out, lse)


def _flash_lse_bwd_rule(block_q, block_k, interpret, compute_dtype,
                        residuals, cotangents):
    q, k, v, o, lse = residuals
    g_out, g_lse = cotangents
    return _flash_backward(q, k, v, o, lse, g_out, block_q, block_k,
                           interpret, compute_dtype, g_lse=g_lse)


flash_attention_lse.defvjp(_flash_lse_fwd_rule, _flash_lse_bwd_rule)


def attention(q, k, v, min_flash_len: int = 256,
              interpret: bool = False,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Dispatch: einsum path for short sequences (the reference regime),
    flash kernel once the K/V length justifies blockwise streaming."""
    if q.shape[2] < min_flash_len and k.shape[2] < min_flash_len:
        return reference_attention(q, k, v)
    return flash_attention(q, k, v, interpret=interpret,
                           compute_dtype=compute_dtype)
