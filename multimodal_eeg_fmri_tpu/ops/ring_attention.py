"""Ring attention — sequence parallelism for the long-context path.

Completes the parallelism inventory (ensemble / data / model / sequence):
when a recording is long enough that even one sequence's activations strain
a chip (the regime the flash kernel's O(block) VMEM already targets,
docs/DESIGN.md "Flash attention"), the TIME axis itself shards over a mesh
axis. Each device holds its local Q/K/V chunk; K/V chunks rotate around the
ring via ``lax.ppermute`` (neighbor hops — rides ICI, never DCN) while every
device folds each incoming chunk into a running online-softmax state
(m, l, acc). After ``n`` hops each device holds the exact attention output
for its local queries — bitwise-equivalent math to the flash kernel's
blockwise accumulation, just distributed.

No reference analogue (the reference is single-GPU quadratic attention,
SURVEY §5); pattern follows the public ring-attention formulation
(Liu et al. 2023) as idiomatic JAX: ``shard_map`` + ``ppermute`` + scan,
fully differentiable (JAX transposes the ppermute/scan automatically).

Per-chunk attention has two implementations (``impl``): "einsum"
materializes (T_local, T_chunk) = (T/n)² scores per device — the O(T²)
logits memory shrinks n² per chip while compute stays MXU einsums — and
"flash" routes each hop through the Pallas flash kernel
(``flash_attention_lse``), merging hop results exactly via logaddexp of
the per-row lse — O(block) VMEM at BOTH levels, for when even T/n is
flash-scale.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "data"  # default: reuse the mesh's data axis for sp serving


def _chunk_scores(q, k, v, scale, compute_dtype=jnp.float32):
    """Unnormalized blockwise attention of local q vs one K/V chunk.
    Returns (o_unnorm (B,H,Tq,D), m (B,H,Tq), l (B,H,Tq)) in f32.

    ``compute_dtype`` sets the MXU input dtype of the two einsums (f32
    accumulation via ``preferred_element_type`` regardless); the online
    softmax statistics stay f32 — same contract as the flash kernel's
    ``compute_dtype`` (ops/attention.py)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(compute_dtype),
                   k.astype(compute_dtype),
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(compute_dtype),
                   v.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    return o, m, l


def ring_attention_local(q, k, v, axis_name: str, axis_size: int,
                         scale: Optional[float] = None,
                         compute_dtype=jnp.float32,
                         impl: str = "einsum",
                         block_q: int = 1024, block_k: int = 1024,
                         interpret: bool = False):
    """The per-device body (call inside ``shard_map``).

    q, k, v: (B, H, T_local, D) — this device's chunk of the T-sharded
    sequence. ``axis_size`` is the ring length (static, from the mesh).

    ``impl`` selects the per-chunk attention:
    - "einsum": materializes the (T_local, T_chunk) score tile per hop —
      fine while (T/n)² fits (the default regime).
    - "flash": routes each hop through the Pallas flash kernel
      (``flash_attention_lse``) — O(block) VMEM per device, so T_local
      itself can be flash-scale; hop results merge exactly via logaddexp
      of the per-row lse's. This is ring × flash: the O(T²) memory is
      gone at BOTH levels (across devices and within each device).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, H, Tq, D = q.shape
    qf = q

    from multimodal_eeg_fmri_tpu.parallel.collectives import ppermute_shift

    if impl == "flash":
        if abs(scale - 1.0 / math.sqrt(D)) > 1e-12:
            raise ValueError(
                "impl='flash' uses the kernel's fixed 1/sqrt(D) scale; "
                "a custom scale requires impl='einsum'")
        from multimodal_eeg_fmri_tpu.ops.attention import (
            flash_attention_lse)

        lse0 = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
        acc0 = jnp.zeros((B, H, Tq, D), jnp.float32)

        def body_flash(carry, _):
            k_c, v_c, acc, lse_run = carry
            o_c, lse_c = flash_attention_lse(
                qf, k_c, v_c, block_q, block_k, interpret, compute_dtype)
            # exact two-way online-softmax merge of normalized partials
            lse_new = jnp.logaddexp(lse_run, lse_c)
            acc = (acc * jnp.exp(lse_run - lse_new)[..., None]
                   + o_c.astype(jnp.float32)
                   * jnp.exp(lse_c - lse_new)[..., None])
            k_c, v_c = ppermute_shift((k_c, v_c), axis_name)
            return (k_c, v_c, acc, lse_new), None

        (_, _, acc, _), _ = jax.lax.scan(
            body_flash, (k, v, acc0, lse0), None, length=axis_size)
        return acc.astype(q.dtype)

    m0 = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Tq), jnp.float32)
    acc0 = jnp.zeros((B, H, Tq, D), jnp.float32)

    def body(carry, _):
        k_c, v_c, m, l, acc = carry
        o_c, m_c, l_c = _chunk_scores(qf, k_c, v_c, scale, compute_dtype)
        m_new = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_c - m_new)
        acc = acc * alpha[..., None] + o_c * beta[..., None]
        l = l * alpha + l_c * beta
        k_c, v_c = ppermute_shift((k_c, v_c), axis_name)
        return (k_c, v_c, m_new, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), None, length=axis_size)
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = SEQ_AXIS,
                   head_axis: Optional[str] = None,
                   compute_dtype=jnp.float32,
                   impl: str = "einsum",
                   block_q: int = 1024, block_k: int = 1024,
                   interpret: bool = False):
    """Sequence-parallel attention: (B, H, T, D) with T sharded over
    ``mesh`` axis ``axis``. Returns the same-sharded output. T must divide
    the axis size. Differentiable end-to-end.

    ``head_axis`` additionally shards the HEAD dim over a second mesh axis
    (sequence × tensor parallelism in one mesh): heads are independent, so
    the ring math is untouched — each device runs the ring over its head
    slice, no extra collective.
    """
    n = mesh.shape[axis]
    if q.shape[2] % n:
        raise ValueError(f"T={q.shape[2]} not divisible by ring size {n}")
    if head_axis is not None and q.shape[1] % mesh.shape[head_axis]:
        raise ValueError(
            f"H={q.shape[1]} not divisible by {head_axis}="
            f"{mesh.shape[head_axis]}")
    spec = P(None, head_axis, axis, None)
    fn = jax.shard_map(
        partial(ring_attention_local, axis_name=axis, axis_size=n,
                compute_dtype=compute_dtype, impl=impl,
                block_q=block_q, block_k=block_k, interpret=interpret),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def shard_sequence(x, mesh: Mesh, axis: str = SEQ_AXIS,
                   head_axis: Optional[str] = None):
    """Device-put (B, H, T, D) arrays with the T axis sharded for the ring
    (and optionally heads over ``head_axis``)."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, head_axis, axis, None)))
