"""fMRI model family.

Re-designs of ``fMRI_CODE/run_fmri_v11.py:272-426`` (duplicated in
``fMRI_CODE/fmri_utils.py:23-108``): MLP encoders over ROI-activation and
PPI-connectivity feature vectors, two unimodal nets, and a fusion net with
two learned softmaxed scalar modality weights. Supports classification
(2-logit head) and regression (scalar head) like the reference's
``task`` switch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.eeg import ModelOutput
from multimodal_eeg_fmri_tpu.models.layers import MLP


class FMRIEncoder(nn.Module):
    """in → 2·hidden → hidden MLP with BN/ReLU/dropout (both the reference's
    ActivationEncoder and ConnectivityEncoder share this exact shape)."""

    hidden_dim: int = 64
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return MLP(
            features=(2 * self.hidden_dim, self.hidden_dim),
            dropout=self.dropout,
            norm="batch",
            activation=nn.relu,
            name="mlp",
        )(x, train=train)


class _Head(nn.Module):
    hidden_dim: int
    num_classes: int
    dropout: float
    task: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim // 2, name="dense")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out_dim = self.num_classes if self.task == "classification" else 1
        x = nn.Dense(out_dim, name="out")(x)
        if self.task == "regression":
            x = x[..., 0]
        return x


class FMRIActivationOnly(nn.Module):
    """Unimodal net over ROI-activation features."""

    hidden_dim: int = 64
    num_classes: int = 2
    dropout: float = 0.4
    task: str = "classification"

    @nn.compact
    def __call__(
        self,
        *,
        activation: jnp.ndarray,
        connectivity: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> ModelOutput:
        feat = FMRIEncoder(self.hidden_dim, self.dropout, name="encoder")(
            activation, train=train
        )
        out = _Head(self.hidden_dim, self.num_classes, self.dropout,
                    self.task, name="head")(feat, train=train)
        return ModelOutput(out, feat, None, None)


class FMRIConnectivityOnly(nn.Module):
    """Unimodal net over PPI-connectivity features."""

    hidden_dim: int = 64
    num_classes: int = 2
    dropout: float = 0.4
    task: str = "classification"

    @nn.compact
    def __call__(
        self,
        *,
        connectivity: jnp.ndarray,
        activation: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> ModelOutput:
        feat = FMRIEncoder(self.hidden_dim, self.dropout, name="encoder")(
            connectivity, train=train
        )
        out = _Head(self.hidden_dim, self.num_classes, self.dropout,
                    self.task, name="head")(feat, train=train)
        return ModelOutput(out, feat, None, None)


class FMRIFusionNet(nn.Module):
    """Bi-modal fMRI fusion: two encoders, softmaxed pair of learned scalar
    weights, concat → fuse MLP → head. ``fused`` in the output is the
    pre-head fusion embedding the bridge pipeline extracts (64-d)."""

    hidden_dim: int = 64
    num_classes: int = 2
    dropout: float = 0.4
    task: str = "classification"

    @nn.compact
    def __call__(
        self,
        *,
        activation: jnp.ndarray,
        connectivity: jnp.ndarray,
        train: bool = False,
    ) -> ModelOutput:
        act_feat = FMRIEncoder(self.hidden_dim, self.dropout,
                               name="activation_encoder")(activation, train=train)
        conn_feat = FMRIEncoder(self.hidden_dim, self.dropout,
                                name="connectivity_encoder")(connectivity, train=train)

        act_w = self.param("activation_weight",
                           lambda _: jnp.asarray([0.5], jnp.float32))
        conn_w = self.param("connectivity_weight",
                            lambda _: jnp.asarray([0.5], jnp.float32))
        w = nn.softmax(jnp.concatenate([act_w, conn_w]))  # (2,)

        combined = jnp.concatenate([act_feat * w[0], conn_feat * w[1]], axis=-1)
        fused = MLP((self.hidden_dim,), self.dropout, norm="batch",
                    activation=nn.relu, name="fusion")(combined, train=train)
        out = _Head(self.hidden_dim, self.num_classes, self.dropout,
                    self.task, name="head")(fused, train=train)
        weights = jnp.broadcast_to(w[None, :], (activation.shape[0], 2))
        return ModelOutput(out, fused, weights, None)

    @staticmethod
    def fusion_weights(params) -> jnp.ndarray:
        """Softmaxed (activation, connectivity) weights from params
        (reference ``get_fusion_weights``)."""
        return nn.softmax(
            jnp.concatenate([params["activation_weight"],
                             params["connectivity_weight"]])
        )
