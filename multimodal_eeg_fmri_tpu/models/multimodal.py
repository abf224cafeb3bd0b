"""End-to-end fused EEG+fMRI model.

The reference trains in two stages: EEG tri-modal and fMRI fusion nets are
trained separately, frozen, their fused embeddings extracted per subject,
and a bridge classifier trained on the embeddings (``_test_bridge.py``
call stack, SURVEY §3.3). That staging is an artifact of host-bound PyTorch
economics. This module additionally offers the TPU-native formulation from
the BASELINE north star: the full EEG(tri-modal) + fMRI(bi-modal) + bridge
stack as ONE differentiable flax module trained end-to-end under a single
``pjit`` — one fused forward/backward, no host hand-off.

``freeze_encoders=True`` reproduces the reference's two-stage semantics
inside the same graph (stop_gradient at the embedding boundary), so the
bridge can be trained on frozen encoders without a separate extraction pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.bridge import BridgeFusionNet
from multimodal_eeg_fmri_tpu.models.eeg import ModelOutput, TriModalFusionNetV4
from multimodal_eeg_fmri_tpu.models.fmri import FMRIFusionNet


class MultimodalEndToEnd(nn.Module):
    """EEG tri-modal encoder + fMRI fusion encoder + bridge head, end-to-end."""

    eeg_hidden_dim: int = 128
    fmri_hidden_dim: int = 64
    bridge_dim: int = 128
    num_classes: int = 2
    dropout: float = 0.3
    num_transformer_layers: int = 2
    num_heads: int = 4
    freeze_encoders: bool = False

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,
        pw: jnp.ndarray,
        conn: jnp.ndarray,
        activation: jnp.ndarray,
        connectivity: jnp.ndarray,
        train: bool = False,
    ) -> ModelOutput:
        eeg_out = TriModalFusionNetV4(
            hidden_dim=self.eeg_hidden_dim,
            num_classes=self.num_classes,
            dropout=self.dropout,
            num_transformer_layers=self.num_transformer_layers,
            num_heads=self.num_heads,
            name="eeg",
        )(erp=erp, pw=pw, conn=conn, train=train)
        fmri_out = FMRIFusionNet(
            hidden_dim=self.fmri_hidden_dim,
            num_classes=self.num_classes,
            dropout=self.dropout,
            name="fmri",
        )(activation=activation, connectivity=connectivity, train=train)

        eeg_emb, fmri_emb = eeg_out.fused, fmri_out.fused
        if self.freeze_encoders:
            eeg_emb = jax.lax.stop_gradient(eeg_emb)
            fmri_emb = jax.lax.stop_gradient(fmri_emb)

        return BridgeFusionNet(
            eeg_dim=self.eeg_hidden_dim,
            fmri_dim=self.fmri_hidden_dim,
            bridge_dim=self.bridge_dim,
            num_classes=self.num_classes,
            num_heads=self.num_heads,
            dropout=self.dropout,
            name="bridge",
        )(eeg=eeg_emb, fmri=fmri_emb, train=train)
