"""EEG model family.

TPU-native re-designs of the reference EEG nets (SURVEY §2.2). Instead of
torch's flag-dependent tuple returns (``return_fusion_weights`` /
``return_fused_feats`` — ``crossmodal_v4_enhancements.py:340-394``), every
model returns a fixed ``ModelOutput`` pytree: under ``jit`` all outputs are
traced once and XLA dead-code-eliminates whatever the caller drops, so there
is zero cost and no retracing for "XAI mode" vs "train mode".

Models (argument convention is keyword-only ``(erp, pw, conn)`` everywhere —
the reference's positional-order inconsistency is documented in SURVEY §2.5):

- ``TriModalFusionNetV4``     ← ``EnhancedTriModalFusionNetV4`` (``:278-394``)
- ``SmartFusionNetV4``        ← ``EnhancedSmartFusionNetV4`` (``:476-570``)
- ``TriModalFusionNetV4Lite`` ← ``EnhancedTriModalFusionNetV4Lite`` (``:880-948``)
- ``TriModalFusionNetGNN``    ← ``EnhancedTriModalFusionNet`` w/ GNN conn
  encoder (``enhanced_models_v4.py:495-657``)
- ``ERPOnlyNet`` / ``PWOnlyNet`` ← V3 unimodal baselines
  (``CrossModal_EEG_scr.ipynb §9,13``)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.encoders import (
    AttnConnEncoder,
    ConnMLPEncoder,
    ERPEncoder,
    ERPEncoderV3,
    GraphConnEncoder,
    LiteERPEncoder,
    LitePowerEncoder,
    PowerEncoder,
    PowerEncoderV3,
)
from multimodal_eeg_fmri_tpu.models.fusion import (
    BiDirectionalCrossAttention,
    HybridFusion,
    LearnedFusion,
)
from multimodal_eeg_fmri_tpu.models.layers import (
    ClassifierHead,
    MultiHeadAttention,
)


class ModelOutput(NamedTuple):
    """Fixed output pytree for every model in the framework."""

    logits: jnp.ndarray                      # (B, num_classes)
    fused: Optional[jnp.ndarray] = None      # (B, hidden) pre-head features
    fusion_weights: Optional[jnp.ndarray] = None  # (B, M)
    attn_weights: Optional[jnp.ndarray] = None    # (B, Tq, Tk) head-averaged


class TriModalFusionNetV4(nn.Module):
    """ERP + PW + CONN tri-modal net with cross-modal attention and learned
    fusion — THE main EEG model (~1.26M params in the reference)."""

    hidden_dim: int = 128
    num_classes: int = 2
    dropout: float = 0.3
    num_transformer_layers: int = 2
    num_heads: int = 4
    # Mixture-of-Experts FFNs in the ERP/PW temporal transformers
    # (ops/moe.py; 0 = the reference's dense FFN). ``mesh``/``expert_axis``
    # shard the experts (expert parallelism); the Switch aux loss is sown
    # into the "losses" collection and collected by train.fit.make_fit_fn.
    num_experts: int = 0
    moe_top_k: int = 1
    mesh: Optional[jax.sharding.Mesh] = None
    expert_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,   # (B, T, C_erp)
        pw: jnp.ndarray,    # (B, T, C_pw)
        conn: jnp.ndarray,  # (B, conn_features)
        train: bool = False,
    ) -> ModelOutput:
        moe_kw = dict(num_experts=self.num_experts, moe_top_k=self.moe_top_k,
                      mesh=self.mesh, expert_axis=self.expert_axis)
        erp_feat = ERPEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="erp_encoder", **moe_kw,
        )(erp, train=train)
        pw_feat = PowerEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="pw_encoder", **moe_kw,
        )(pw, train=train)
        conn_feat = ConnMLPEncoder(
            self.hidden_dim, self.dropout, name="conn_encoder"
        )(conn, train=train)

        # ERP queries the [erp, pw, conn] stack
        stack = jnp.stack([erp_feat, pw_feat, conn_feat], axis=1)
        enhanced, attn_w = MultiHeadAttention(
            self.num_heads, self.dropout, name="cross_attn"
        )(erp_feat[:, None], stack, stack, train=train)
        enhanced_erp = enhanced[:, 0]

        fused, weights = LearnedFusion(
            3, self.hidden_dim, name="fusion"
        )([enhanced_erp, pw_feat, conn_feat], train=train)

        logits = ClassifierHead(
            (self.hidden_dim, self.hidden_dim // 2), self.num_classes,
            self.dropout, name="classifier",
        )(fused, train=train)
        return ModelOutput(logits, fused, weights, attn_w)


class SmartFusionNetV4(nn.Module):
    """Bi-modal (ERP + PW) net with optional bi-directional cross-attention."""

    hidden_dim: int = 128
    num_classes: int = 2
    dropout: float = 0.4
    num_transformer_layers: int = 2
    num_heads: int = 4
    use_cross_attention: bool = True

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,
        pw: jnp.ndarray,
        conn: Optional[jnp.ndarray] = None,  # accepted & ignored (uniform API)
        train: bool = False,
    ) -> ModelOutput:
        erp_feat = ERPEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="erp_encoder",
        )(erp, train=train)
        pw_feat = PowerEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="pw_encoder",
        )(pw, train=train)

        if self.use_cross_attention:
            erp_feat, pw_feat = BiDirectionalCrossAttention(
                self.hidden_dim, self.num_heads, self.dropout,
                name="cross_attention",
            )(erp_feat, pw_feat, train=train)

        fused, weights = LearnedFusion(2, self.hidden_dim, name="fusion")(
            [erp_feat, pw_feat], train=train
        )
        logits = ClassifierHead(
            (self.hidden_dim, self.hidden_dim // 2), self.num_classes,
            self.dropout, name="classifier",
        )(fused, train=train)
        return ModelOutput(logits, fused, weights, None)


class TriModalFusionNetV4Lite(nn.Module):
    """~400K-param lite tri-modal net for small datasets: conv-only encoders,
    hybrid fusion with connectivity boost, shallow head."""

    hidden_dim: int = 96
    num_classes: int = 2
    dropout: float = 0.4
    conn_boost: float = 1.3

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,
        pw: jnp.ndarray,
        conn: jnp.ndarray,
        train: bool = False,
    ) -> ModelOutput:
        erp_feat = LiteERPEncoder(self.hidden_dim, self.dropout,
                                  name="erp_encoder")(erp, train=train)
        pw_feat = LitePowerEncoder(self.hidden_dim, self.dropout,
                                   name="pw_encoder")(pw, train=train)
        conn_feat = AttnConnEncoder(self.hidden_dim, self.dropout,
                                    name="conn_encoder")(conn, train=train)

        fused, weights = HybridFusion(
            self.hidden_dim, self.dropout, self.conn_boost, name="fusion"
        )(erp_feat, pw_feat, conn_feat, train=train)

        logits = ClassifierHead(
            (self.hidden_dim // 2,), self.num_classes, self.dropout,
            name="classifier",
        )(fused, train=train)
        return ModelOutput(logits, fused, weights, None)


class TriModalFusionNetGNN(nn.Module):
    """Tri-modal net with the graph-attention connectivity encoder.

    Reference variant: ``enhanced_models_v4.py:495-657`` with
    ``use_gnn=True``; ``conn`` must be the (B, N, N, M) matrix form."""

    hidden_dim: int = 128
    num_classes: int = 2
    dropout: float = 0.3
    num_transformer_layers: int = 2
    num_heads: int = 4
    gnn_threshold: float = 0.5

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,
        pw: jnp.ndarray,
        conn: jnp.ndarray,  # (B, N, N, M) stacked connectivity matrices
        train: bool = False,
    ) -> ModelOutput:
        erp_feat = ERPEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="erp_encoder",
        )(erp, train=train)
        pw_feat = PowerEncoder(
            self.hidden_dim, self.num_transformer_layers, self.num_heads,
            self.dropout, name="pw_encoder",
        )(pw, train=train)
        conn_feat = GraphConnEncoder(
            self.hidden_dim, self.num_heads, self.gnn_threshold, self.dropout,
            name="conn_encoder",
        )(conn, train=train)

        stack = jnp.stack([erp_feat, pw_feat, conn_feat], axis=1)
        enhanced, attn_w = MultiHeadAttention(
            self.num_heads, self.dropout, name="cross_attn"
        )(erp_feat[:, None], stack, stack, train=train)

        fused, weights = LearnedFusion(3, self.hidden_dim, name="fusion")(
            [enhanced[:, 0], pw_feat, conn_feat], train=train
        )
        logits = ClassifierHead(
            (self.hidden_dim, self.hidden_dim // 2), self.num_classes,
            self.dropout, name="classifier",
        )(fused, train=train)
        return ModelOutput(logits, fused, weights, attn_w)


class ERPOnlyNet(nn.Module):
    """V3 unimodal ERP baseline: conv encoder + 2-layer head."""

    hidden_dim: int = 64
    num_classes: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,
        pw: Optional[jnp.ndarray] = None,
        conn: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> ModelOutput:
        feat = ERPEncoderV3(self.hidden_dim, self.dropout, name="encoder")(
            erp, train=train
        )
        logits = ClassifierHead(
            (self.hidden_dim // 2,), self.num_classes, self.dropout,
            name="classifier",
        )(feat, train=train)
        return ModelOutput(logits, feat, None, None)


class PWOnlyNet(nn.Module):
    """V3 unimodal power-spectrum baseline."""

    hidden_dim: int = 64
    num_classes: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        *,
        pw: jnp.ndarray,
        erp: Optional[jnp.ndarray] = None,
        conn: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> ModelOutput:
        feat = PowerEncoderV3(self.hidden_dim, self.dropout, name="encoder")(
            pw, train=train
        )
        logits = ClassifierHead(
            (self.hidden_dim // 2,), self.num_classes, self.dropout,
            name="classifier",
        )(feat, train=train)
        return ModelOutput(logits, feat, None, None)
