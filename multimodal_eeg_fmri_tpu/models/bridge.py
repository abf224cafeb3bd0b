"""EEG↔fMRI bridge fusion model.

Re-design of ``EEGfMRIBridgeFusionNet`` (``bridge_utils.py:22-114``; LOOCV
LayerNorm variant ``_test_bridge.py:627-707``): project 128-d EEG and 64-d
fMRI fused embeddings into a shared bridge space (LayerNorm — the reference
deliberately avoids BatchNorm here because LOOCV trains with batch=1),
EEG-query cross-attention over the 2-token [eeg, fmri] sequence, learned
temperature fusion, LayerNorm classifier head.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.eeg import ModelOutput
from multimodal_eeg_fmri_tpu.models.fusion import LearnedFusion
from multimodal_eeg_fmri_tpu.models.layers import gelu, MultiHeadAttention


class _Proj(nn.Module):
    bridge_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.bridge_dim, name="dense")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = gelu(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class BridgeFusionNet(nn.Module):
    """Cross-modality bridge classifier over frozen-encoder embeddings."""

    eeg_dim: int = 128
    fmri_dim: int = 64
    bridge_dim: int = 128
    num_classes: int = 2
    num_heads: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        *,
        eeg: jnp.ndarray,   # (B, eeg_dim) frozen tri-modal fused embedding
        fmri: jnp.ndarray,  # (B, fmri_dim) frozen fMRI fused embedding
        train: bool = False,
    ) -> ModelOutput:
        eeg_p = _Proj(self.bridge_dim, self.dropout, name="eeg_proj")(
            eeg, train=train
        )
        fmri_p = _Proj(self.bridge_dim, self.dropout, name="fmri_proj")(
            fmri, train=train
        )

        seq = jnp.stack([eeg_p, fmri_p], axis=1)  # (B, 2, D)
        att, attn_w = MultiHeadAttention(
            self.num_heads, self.dropout, name="cross_attn"
        )(eeg_p[:, None], seq, seq, train=train)
        eeg_enh = att[:, 0]

        fused, fusion_w = LearnedFusion(2, self.bridge_dim, name="fusion")(
            [eeg_enh, fmri_p], train=train
        )

        x = nn.Dense(self.bridge_dim // 2, name="cls_dense")(fused)
        x = nn.LayerNorm(epsilon=1e-5, name="cls_ln")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="cls_out")(x)

        return ModelOutput(logits, fused, fusion_w, attn_w)
