"""Modality encoders (flax.linen, channels-last ``(B, T, C)``).

Re-designs of the reference encoder inventory (SURVEY §2.2):

- ``ERPEncoder``       ← ``EnhancedERPEncoder`` (``crossmodal_v4_enhancements.py:93-143``):
  Conv(7)→Conv(5)+pool→Conv(3) w/ BN+GELU+dropout, sinusoidal PE, N transformer
  blocks, mean-pool + Linear projection.
- ``PowerEncoder``     ← ``EnhancedPowerEncoder`` (``:146-209``): three parallel
  convs (k=3/5/7) concat→1×1 fuse → transformers → pool. Here the three
  branches are fused into **one grouped conv** on a k=7 window with per-branch
  zero-masked taps — one MXU-shaped conv instead of three small ones.
- ``LiteERPEncoder`` / ``LitePowerEncoder`` ← lite variants (``:817-877``).
- ``ConnMLPEncoder``   ← the V4 conn MLP (``:304-313``).
- ``AttnConnEncoder``  ← ``EnhancedConnEncoder`` w/ tanh→sigmoid feature
  attention (``:684-739``).
- ``GraphConnEncoder`` ← ``GNNConnectivityEncoder`` (``enhanced_models_v4.py:292-413``):
  the reference loops GATv2 over batch items in Python; over an 18-node graph
  that is pure overhead, so this is rebuilt as **batched dense masked graph
  attention** (edge mask = thresholded connectivity), mathematically a GAT
  layer over the same graph but one fused einsum per batch.
- ``ERPEncoderV3`` / ``PowerEncoderV3`` ← V3 unimodal baselines
  (``CrossModal_EEG_scr.ipynb §8,12``): 3-layer conv stacks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.layers import (
    gelu,
    MLP,
    PositionalEncoding,
    TransformerBlock,
)


class ConvBNBlock(nn.Module):
    """Conv1d (channels-last) + BatchNorm + GELU [+ dropout]."""

    features: int
    kernel_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel_size,), padding="SAME",
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = gelu(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def max_pool_time(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Max-pool along time (dim 1) with stride == window."""
    return nn.max_pool(x, (window,), strides=(window,))


class ERPEncoder(nn.Module):
    """CNN + temporal-transformer ERP encoder (V4 'enhanced')."""

    hidden_dim: int = 128
    num_transformer_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.3
    # Mixture-of-Experts FFN inside each transformer block (>0 experts;
    # ops/moe.py) — optional expert parallelism via ``mesh``/``expert_axis``
    num_experts: int = 0
    moe_top_k: int = 1
    mesh: Optional[jax.sharding.Mesh] = None
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: (B, T, C_in)
        x = ConvBNBlock(64, 7, self.dropout, name="conv1")(x, train=train)
        x = ConvBNBlock(128, 5, name="conv2")(x, train=train)
        x = max_pool_time(x, 2)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = ConvBNBlock(self.hidden_dim, 3, self.dropout, name="conv3")(
            x, train=train
        )

        x = PositionalEncoding(self.hidden_dim, self.dropout, name="pos")(
            x, train=train
        )
        for i in range(self.num_transformer_layers):
            x = TransformerBlock(
                self.hidden_dim, self.num_heads, dropout=self.dropout,
                num_experts=self.num_experts, moe_top_k=self.moe_top_k,
                mesh=self.mesh, expert_axis=self.expert_axis,
                name=f"transformer_{i}",
            )(x, train=train)

        x = jnp.mean(x, axis=1)  # adaptive-avg-pool over time
        x = nn.Dense(self.hidden_dim, name="proj")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class MultiScaleConv(nn.Module):
    """Three parallel conv branches (k=3,5,7) computed as ONE conv.

    Each branch has 64 output channels. Rather than three separate small
    convs (three MXU launches, three HBM round-trips), we run a single
    Conv(k=7, features=192) whose weight taps outside each branch's receptive
    field are *structurally zeroed* — branch 0 only sees taps 2..4 (k=3),
    branch 1 taps 1..5 (k=5), branch 2 all 7. Identical math to the
    reference's three-branch concat, one fused kernel on TPU.
    """

    branch_features: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        c_in = x.shape[-1]
        f = self.branch_features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, c_in, 3 * f),
        )
        bias = self.param("bias", nn.initializers.zeros, (3 * f,))
        # tap mask: (7, 1, 3f): branch0 taps [2:5], branch1 [1:6], branch2 all
        taps = jnp.arange(7)[:, None, None]
        branch = jnp.repeat(jnp.arange(3), f)[None, None, :]
        lo = jnp.where(branch == 0, 2, jnp.where(branch == 1, 1, 0))
        hi = jnp.where(branch == 0, 4, jnp.where(branch == 1, 5, 6))
        mask = ((taps >= lo) & (taps <= hi)).astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel * mask,
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        return gelu(y)


class PowerEncoder(nn.Module):
    """Multi-scale CNN + transformer power-spectrum encoder (V4)."""

    hidden_dim: int = 128
    num_transformer_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.3
    num_experts: int = 0
    moe_top_k: int = 1
    mesh: Optional[jax.sharding.Mesh] = None
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = MultiScaleConv(64, name="multiscale")(x, train=train)
        x = ConvBNBlock(self.hidden_dim, 1, self.dropout, name="fuse")(
            x, train=train
        )
        x = PositionalEncoding(self.hidden_dim, self.dropout, name="pos")(
            x, train=train
        )
        for i in range(self.num_transformer_layers):
            x = TransformerBlock(
                self.hidden_dim, self.num_heads, dropout=self.dropout,
                num_experts=self.num_experts, moe_top_k=self.moe_top_k,
                mesh=self.mesh, expert_axis=self.expert_axis,
                name=f"transformer_{i}",
            )(x, train=train)
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.hidden_dim, name="proj")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class LiteERPEncoder(nn.Module):
    """Transformer-free small ERP encoder (V4-Lite)."""

    hidden_dim: int = 96
    dropout: float = 0.4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = ConvBNBlock(48, 7, self.dropout, name="conv1")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(self.hidden_dim, 5, self.dropout, name="conv2")(
            x, train=train
        )
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.hidden_dim, name="proj")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class LitePowerEncoder(nn.Module):
    """Single-scale small power encoder (V4-Lite)."""

    hidden_dim: int = 96
    dropout: float = 0.4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = ConvBNBlock(64, 5, self.dropout, name="conv1")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(self.hidden_dim, 3, self.dropout, name="conv2")(
            x, train=train
        )
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.hidden_dim, name="proj")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ConnMLPEncoder(nn.Module):
    """Flattened-connectivity MLP encoder (V4 trimodal conn branch)."""

    hidden_dim: int = 128
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        return MLP(
            features=(256, self.hidden_dim),
            dropout=self.dropout,
            norm="batch",
            name="mlp",
        )(x, train=train)


class AttnConnEncoder(nn.Module):
    """Connectivity encoder with feature attention (V4-Lite conn branch):
    256→128 projections, tanh→sigmoid per-feature gate, output projection."""

    hidden_dim: int = 96
    dropout: float = 0.4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        x = MLP((256,), self.dropout, norm="batch", name="proj1")(x, train=train)
        x = MLP((128,), self.dropout, norm="batch", name="proj2")(x, train=train)
        gate = nn.Dense(64, name="attn1")(x)
        gate = jnp.tanh(gate)
        gate = nn.Dense(128, name="attn2")(gate)
        gate = nn.sigmoid(gate)
        x = x * gate
        return MLP((self.hidden_dim,), self.dropout, norm="batch",
                   name="out")(x, train=train)


class GraphConnEncoder(nn.Module):
    """Batched dense graph-attention connectivity encoder.

    TPU-native rebuild of ``GNNConnectivityEncoder``
    (``enhanced_models_v4.py:292-413``): the reference builds a sparse
    edge_index from connectivity > 0.5 and runs GATv2 per-sample in a Python
    loop. Over an 18-node graph, dense masked attention over ALL pairs with
    the same threshold mask is the same computation, fully batched, and maps
    onto two einsums. Two attention layers + global mean pool + projection.

    Input: (B, N, N, M) stacked connectivity matrices (M metrics) or
    (B, N, N); node features are each node's connectivity profile.
    """

    hidden_dim: int = 128
    num_heads: int = 4
    threshold: float = 0.5
    dropout: float = 0.3

    @nn.compact
    def __call__(self, conn: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if conn.ndim == 3:
            conn = conn[..., None]
        B, N, _, M = conn.shape
        # adjacency mask: any metric above threshold (+ self loops)
        adj = jnp.any(conn > self.threshold, axis=-1)
        adj = adj | jnp.eye(N, dtype=bool)[None]
        # node features: concat of per-metric connectivity rows
        h = conn.transpose(0, 1, 3, 2).reshape(B, N, M * N)
        h = nn.Dense(self.hidden_dim, name="embed")(h)

        for layer in range(2):
            # GAT-style attention: score(i,j) = leaky_relu(a^T [Wh_i || Wh_j])
            W = nn.Dense(self.hidden_dim, use_bias=False, name=f"W_{layer}")
            hw = W(h)  # (B, N, D)
            a_src = nn.Dense(self.num_heads, use_bias=False,
                             name=f"a_src_{layer}")(hw)  # (B, N, H)
            a_dst = nn.Dense(self.num_heads, use_bias=False,
                             name=f"a_dst_{layer}")(hw)
            scores = nn.leaky_relu(
                a_src[:, :, None, :] + a_dst[:, None, :, :], 0.2
            )  # (B, N, N, H)
            scores = jnp.where(adj[..., None], scores,
                               jnp.finfo(scores.dtype).min)
            alpha = jax.nn.softmax(scores, axis=2)
            alpha = nn.Dropout(self.dropout, deterministic=not train)(alpha)
            hd = hw.reshape(B, N, self.num_heads, -1)  # (B, N, H, Dh)
            msg = jnp.einsum("bijh,bjhd->bihd", alpha, hd)
            h = nn.elu(msg.reshape(B, N, self.hidden_dim))

        g = jnp.mean(h, axis=1)  # global mean pool over nodes
        g = nn.Dense(self.hidden_dim, name="proj")(g)
        g = gelu(g)
        return nn.Dropout(self.dropout, deterministic=not train)(g)


class ERPEncoderV3(nn.Module):
    """V3 baseline ERP conv encoder (``CrossModal_EEG_scr.ipynb §12``):
    3 conv blocks (64→128→hidden) with pooling, mean-pool, linear."""

    hidden_dim: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = ConvBNBlock(64, 7, self.dropout, name="conv1")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(128, 5, self.dropout, name="conv2")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(self.hidden_dim, 3, self.dropout, name="conv3")(
            x, train=train
        )
        return jnp.mean(x, axis=1)


class PowerEncoderV3(nn.Module):
    """V3 baseline power conv encoder (``CrossModal_EEG_scr.ipynb §8``)."""

    hidden_dim: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = ConvBNBlock(64, 5, self.dropout, name="conv1")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(128, 3, self.dropout, name="conv2")(x, train=train)
        x = max_pool_time(x, 2)
        x = ConvBNBlock(self.hidden_dim, 3, self.dropout, name="conv3")(
            x, train=train
        )
        return jnp.mean(x, axis=1)
