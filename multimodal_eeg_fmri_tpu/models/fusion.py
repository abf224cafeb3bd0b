"""Fusion modules.

- ``LearnedFusion``      ← ``LearnedFusionModule``
  (``crossmodal_v4_enhancements.py:216-271``): temperature-softmaxed learned
  static weights 50/50-mixed with an input-conditioned gate net.
- ``BiDirectionalCrossAttention`` ← (``:401-469``): mutual ERP↔PW attention
  with sigmoid gates and LayerNorm residuals.
- ``HybridFusion``       ← ``HybridFusionModule`` (``:746-810``): early gated
  ERP+PW fusion, late concat with connectivity boosted ×conn_boost, learned
  final gate.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.layers import gelu, MLP, MultiHeadAttention


class LearnedFusion(nn.Module):
    """Weighted sum of modality embeddings.

    weights = 0.5·softmax(static_logits/T) + 0.5·softmax(gate(x_concat)/T).
    Returns (fused, combined_weights) — weights are always computed (XLA
    dead-code-eliminates them when unused) so the output structure is static.
    """

    num_modalities: int
    hidden_dim: int
    use_temperature: bool = True
    init_temperature: float = 1.0

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert len(feats) == self.num_modalities
        stacked = jnp.stack(feats, axis=1)  # (B, M, D)

        logits = self.param(
            "fusion_logits", nn.initializers.ones, (self.num_modalities,)
        )
        if self.use_temperature:
            temp = self.param(
                "temperature",
                lambda _: jnp.asarray(self.init_temperature, jnp.float32),
            )
        else:
            temp = jnp.asarray(1.0, jnp.float32)

        static_w = nn.softmax(logits / temp)  # (M,)

        concat = jnp.concatenate(feats, axis=-1)
        gate = nn.Dense(self.hidden_dim, name="gate1")(concat)
        gate = gelu(gate)
        gate = nn.Dropout(0.2, deterministic=not train)(gate)
        gate = nn.Dense(self.num_modalities, name="gate2")(gate)
        dynamic_w = nn.softmax(gate / temp, axis=-1)  # (B, M)

        combined = 0.5 * static_w[None, :] + 0.5 * dynamic_w
        fused = jnp.sum(stacked * combined[..., None], axis=1)
        return fused, combined

    @staticmethod
    def static_weights(params) -> jnp.ndarray:
        """Extract softmaxed static fusion weights from a param subtree
        (reference ``get_fusion_weights_from_model``)."""
        return nn.softmax(params["fusion_logits"] / params["temperature"])


class BiDirectionalCrossAttention(nn.Module):
    """Mutual cross-modal attention between two embeddings.

    Each modality (as a 1-token query) attends over the 2-token [erp, pw]
    stack; a sigmoid gate on [x, attended] scales the attended residual,
    followed by LayerNorm.
    """

    hidden_dim: int
    num_heads: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self, erp: jnp.ndarray, pw: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        combined = jnp.stack([erp, pw], axis=1)  # (B, 2, D)

        erp_att, _ = MultiHeadAttention(self.num_heads, self.dropout,
                                        name="erp_to_pw")(
            erp[:, None], combined, combined, train=train
        )
        pw_att, _ = MultiHeadAttention(self.num_heads, self.dropout,
                                       name="pw_to_erp")(
            pw[:, None], combined, combined, train=train
        )
        erp_att = erp_att[:, 0]
        pw_att = pw_att[:, 0]

        drop = nn.Dropout(self.dropout, deterministic=not train)
        e_gate = nn.sigmoid(
            nn.Dense(self.hidden_dim, name="erp_gate")(
                jnp.concatenate([erp, erp_att], axis=-1)
            )
        )
        p_gate = nn.sigmoid(
            nn.Dense(self.hidden_dim, name="pw_gate")(
                jnp.concatenate([pw, pw_att], axis=-1)
            )
        )
        erp_out = nn.LayerNorm(epsilon=1e-5, name="norm_erp")(erp + drop(e_gate * erp_att))
        pw_out = nn.LayerNorm(epsilon=1e-5, name="norm_pw")(pw + drop(p_gate * pw_att))
        return erp_out, pw_out


class HybridFusion(nn.Module):
    """Early gated ERP+PW fusion, late concat with boosted connectivity.

    Returns (fused, weight_summary) where weight_summary is a (B, 3) array of
    [erp_w·final_0, pw_w·final_0, final_1·conn_boost] matching the scalar
    summary the reference reports.
    """

    hidden_dim: int
    dropout: float = 0.3
    conn_boost: float = 1.2

    @nn.compact
    def __call__(
        self,
        erp: jnp.ndarray,
        pw: jnp.ndarray,
        conn: jnp.ndarray,
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        gate_in = jnp.concatenate([erp, pw], axis=-1)
        g = nn.Dense(self.hidden_dim, name="gate1")(gate_in)
        g = gelu(g)
        g = nn.Dropout(self.dropout, deterministic=not train)(g)
        g = nn.Dense(2, name="gate2")(g)
        g = nn.softmax(g, axis=-1)  # (B, 2)

        early = g[:, 0:1] * erp + g[:, 1:2] * pw

        final_gate = self.param(
            "final_gate", lambda _: jnp.asarray([0.6, 0.4], jnp.float32)
        )
        final_w = nn.softmax(final_gate)

        conn_boosted = conn * self.conn_boost
        combined = jnp.concatenate([early, conn_boosted], axis=-1)
        fused = MLP((self.hidden_dim,), self.dropout, norm="batch",
                    name="late")(combined, train=train)

        weights = jnp.stack(
            [g[:, 0] * final_w[0], g[:, 1] * final_w[0],
             jnp.full(g.shape[:1], final_w[1] * self.conn_boost)],
            axis=-1,
        )
        return fused, weights
