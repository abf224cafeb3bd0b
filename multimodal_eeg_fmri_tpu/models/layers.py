"""Shared model building blocks (flax.linen).

Layout convention: all temporal tensors are **channels-last** ``(batch, time,
features)`` — the TPU-native layout (features on the 128-lane dim, convs and
matmuls tile straight onto the MXU). The reference uses torch's
channels-first ``(B, C, T)``; loaders transpose at ingest.

Blocks mirror the reference inventory (SURVEY §2.2):
- ``PositionalEncoding``  — sinusoidal PE (``crossmodal_v4_enhancements.py:29-50``)
- ``MultiHeadAttention``  — torch ``nn.MultiheadAttention``-equivalent that
  also returns head-averaged attention weights (needed by the XAI suite)
- ``TransformerBlock``    — pre-norm MHA + GELU FFN
  (``crossmodal_v4_enhancements.py:53-86``)
- ``DropPath``            — stochastic depth (``:639-658``)
- ``MLP`` / ``mlp_head``  — Linear+Norm+GELU+Dropout stacks used by every
  classifier head and conn encoder in the reference
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# exact (erf) GELU — torch's default and therefore the reference's
# semantics; flax's nn.gelu defaults to the tanh approximation, which
# diverges from torch by ~1e-3 (caught by tests/test_torch_parity.py).
gelu = partial(nn.gelu, approximate=False)


def sinusoidal_position_encoding(length: int, d_model: int,
                                 dtype=jnp.float32) -> jnp.ndarray:
    """(length, d_model) sinusoidal table; matches the reference formula."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    angles = position * div_term  # (length, ceil(d_model/2))
    pe = jnp.zeros((length, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles)[:, : (d_model + 1) // 2])
    pe = pe.at[:, 1::2].set(jnp.cos(angles)[:, : d_model // 2])
    return pe.astype(dtype)


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE along the time axis, then dropout.

    The table is a compile-time constant folded by XLA (not a param); the
    reference registers it as a buffer with max_len 5000.
    """

    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: (B, T, D)
        pe = sinusoidal_position_encoding(x.shape[1], self.d_model, x.dtype)
        x = x + pe[None, :, :]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class MultiHeadAttention(nn.Module):
    """Multi-head attention returning (output, attn_weights).

    Equivalent in parameterization to torch ``nn.MultiheadAttention``
    (separate q/k/v input projections + output projection, weights averaged
    over heads on return). Attention dropout applies to the probabilities.
    Sequences here are short (2-3 modality tokens, or ≲250 post-conv
    timesteps), so the einsum form compiles to MXU matmuls directly; long
    sequences route through ``ops.attention.flash_attention``.
    """

    num_heads: int
    dropout: float = 0.0
    # K/V length at which self-attention switches to the fused blockwise
    # Pallas kernel (attention probabilities are then not materialized, so
    # the returned weights are None — only the XAI paths read them, and
    # those run at the reference's short lengths).
    flash_min_len: int = 256
    # "auto" (length-based flash routing), "einsum", "flash", "ring", or
    # "ring_local". "ring" runs sequence-parallel attention
    # (ops/ring_attention.py): the TIME axis shards over ``mesh`` axis
    # ``seq_axis`` and K/V chunks rotate via ppermute — the config-reachable
    # long-context training path. "ring_local" is the same math for callers
    # ALREADY inside a shard_map (e.g. a pipelined stage): it calls the
    # per-device ring body directly on the local T-chunk (shard_map cannot
    # nest), with the ring length given statically via ``ring_size``.
    attn_impl: str = "auto"
    mesh: Optional[jax.sharding.Mesh] = None
    seq_axis: str = "seq"
    head_axis: Optional[str] = None
    ring_size: Optional[int] = None
    # MXU input dtype for the flash/ring kernels' per-tile matmuls (f32
    # accumulation + f32 softmax statistics regardless). bfloat16 runs the
    # v5e MXU at ~2× the f32 rate — the long-sequence throughput knob.
    flash_compute_dtype: jnp.dtype = jnp.float32
    # Per-hop chunk attention inside the ring paths: "einsum" (default,
    # (T/n)² score tiles) or "flash" (Pallas kernel per hop, O(block) VMEM
    # even when T/n is itself long — ring × flash).
    ring_chunk_impl: str = "einsum"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Tq, D)
        key: jnp.ndarray,    # (B, Tk, D)
        value: jnp.ndarray,  # (B, Tk, D)
        *,
        train: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        d_model = query.shape[-1]
        assert d_model % self.num_heads == 0, "d_model must divide num_heads"
        head_dim = d_model // self.num_heads

        def proj(name):
            return nn.DenseGeneral(
                features=(self.num_heads, head_dim), axis=-1, name=name
            )

        q = proj("q_proj")(query)  # (B, Tq, H, hd)
        k = proj("k_proj")(key)
        v = proj("v_proj")(value)

        impl = self.attn_impl
        if impl == "auto":
            impl = "flash" if (
                mask is None
                and key.shape[1] >= self.flash_min_len
                and (self.dropout == 0.0 or not train)
            ) else "einsum"
        elif impl in ("flash", "ring", "ring_local"):
            # the auto route silently guards these; an EXPLICIT impl must
            # fail loudly instead of silently computing over masked
            # positions or dropping attention-probability dropout
            # (found in review)
            if mask is not None:
                raise ValueError(
                    f"attn_impl={impl!r} does not support an attention "
                    "mask — use 'einsum' (or 'auto')")
            if self.dropout > 0.0 and train:
                raise ValueError(
                    f"attn_impl={impl!r} cannot apply attention-probability "
                    "dropout; set dropout=0.0 on the attention module (the "
                    "block's residual dropout is unaffected) or use "
                    "'einsum'/'auto'")
        if impl == "ring_local":
            if self.ring_size is None:
                raise ValueError("attn_impl='ring_local' requires ring_size")
            from multimodal_eeg_fmri_tpu.ops.ring_attention import (
                ring_attention_local,
            )

            out = ring_attention_local(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), axis_name=self.seq_axis,
                axis_size=self.ring_size,
                compute_dtype=self.flash_compute_dtype,
                impl=self.ring_chunk_impl,
            ).transpose(0, 2, 1, 3)
            mean_probs = None
        elif impl == "ring":
            if self.mesh is None:
                raise ValueError("attn_impl='ring' requires a mesh")
            from multimodal_eeg_fmri_tpu.ops.ring_attention import (
                ring_attention,
            )

            out = ring_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mesh=self.mesh, axis=self.seq_axis,
                head_axis=self.head_axis,
                compute_dtype=self.flash_compute_dtype,
                impl=self.ring_chunk_impl,
            ).transpose(0, 2, 1, 3)
            mean_probs = None
        elif impl == "flash":
            from multimodal_eeg_fmri_tpu.ops.attention import flash_attention

            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                compute_dtype=self.flash_compute_dtype,
            ).transpose(0, 2, 1, 3)
            mean_probs = None
        else:
            scale = 1.0 / math.sqrt(head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            if mask is not None:
                logits = jnp.where(mask, logits,
                                   jnp.finfo(logits.dtype).min)
            probs = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            # torch returns attention averaged over heads
            mean_probs = jnp.mean(probs, axis=1)
        out = nn.DenseGeneral(features=d_model, axis=(-2, -1),
                              name="out_proj")(out)
        return out, mean_probs


class TransformerBlock(nn.Module):
    """Pre-norm transformer block: LN → MHA → residual; LN → FFN → residual.

    Mirrors ``TemporalTransformerBlock`` (GELU FFN of width 4·d_model).
    """

    d_model: int
    num_heads: int = 4
    dim_feedforward: int = 0  # 0 → 4*d_model
    dropout: float = 0.1
    # long-context routing, forwarded to MultiHeadAttention: "ring" shards
    # the time axis over ``mesh``/``seq_axis`` (sequence parallelism)
    attn_impl: str = "auto"
    mesh: Optional[jax.sharding.Mesh] = None
    seq_axis: str = "seq"
    head_axis: Optional[str] = None
    ring_size: Optional[int] = None
    # Mixture-of-Experts FFN (ops/moe.py): >0 replaces the dense FFN with
    # ``num_experts`` experts, top-k routed with static capacity; with
    # ``expert_axis`` set the experts shard over that axis of ``mesh``
    # (expert parallelism). The Switch load-balance aux loss is sown into
    # the "losses" collection, collected by train.fit.make_fit_fn.
    num_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 2.0
    moe_aux_weight: float = 0.01
    expert_axis: Optional[str] = None
    flash_compute_dtype: jnp.dtype = jnp.float32
    ring_chunk_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # ``train`` is positional-or-keyword (not keyword-only) so the
        # block can sit under ``nn.remat(..., static_argnums=(2,))`` —
        # jax.checkpoint statics must be positional
        ff = self.dim_feedforward or 4 * self.d_model
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y, _ = MultiHeadAttention(
            self.num_heads, self.dropout, attn_impl=self.attn_impl,
            mesh=self.mesh, seq_axis=self.seq_axis, head_axis=self.head_axis,
            ring_size=self.ring_size,
            flash_compute_dtype=self.flash_compute_dtype,
            ring_chunk_impl=self.ring_chunk_impl,
            name="attn",
        )(y, y, y, train=train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        if self.num_experts > 0:
            from multimodal_eeg_fmri_tpu.ops.moe import MoEFFN

            y = MoEFFN(
                d_model=self.d_model, num_experts=self.num_experts,
                dim_feedforward=self.dim_feedforward, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                aux_weight=self.moe_aux_weight, mesh=self.mesh,
                expert_axis=self.expert_axis, name="moe",
            )(y, train=train)
        else:
            y = nn.Dense(ff, name="ffn1")(y)
            y = gelu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(self.d_model, name="ffn2")(y)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (reference ``DropPath``)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.drop_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class MLP(nn.Module):
    """Dense → norm → act → dropout stack.

    ``norm`` ∈ {"batch", "layer", "none"}; BatchNorm uses flax batch_stats
    (the reference's heads/encoders are BN-heavy — SURVEY §7 hard parts).
    """

    features: Sequence[int]
    dropout: float = 0.0
    norm: str = "batch"
    activation: Callable = gelu
    final_activation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        n = len(self.features)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, name=f"dense_{i}")(x)
            is_last = i == n - 1
            if not is_last or self.final_activation:
                if self.norm == "batch":
                    x = nn.BatchNorm(
                        use_running_average=not train, name=f"bn_{i}"
                    )(x)
                elif self.norm == "layer":
                    x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
                x = self.activation(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ClassifierHead(nn.Module):
    """The reference's classifier-head pattern: hidden layers with
    norm/GELU/dropout, final Linear to num_classes with no norm/act."""

    hidden: Sequence[int]
    num_classes: int
    dropout: float = 0.3
    norm: str = "batch"
    activation: Callable = gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = MLP(
            features=tuple(self.hidden),
            dropout=self.dropout,
            norm=self.norm,
            activation=self.activation,
            name="hidden",
        )(x, train=train)
        return nn.Dense(self.num_classes, name="out")(x)
