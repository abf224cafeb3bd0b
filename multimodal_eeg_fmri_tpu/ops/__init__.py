"""Compute primitives: losses, schedules, attention, signal processing."""

from multimodal_eeg_fmri_tpu.ops.losses import (
    cross_entropy,
    focal_loss,
    label_smoothing_cross_entropy,
    weighted_cross_entropy,
    mse_loss,
)
from multimodal_eeg_fmri_tpu.ops.schedules import (
    EarlyStopping,
    ReduceLROnPlateau,
    warmup_cosine_schedule,
)
from multimodal_eeg_fmri_tpu.ops.augment import augment_temporal, make_eeg_augment
from multimodal_eeg_fmri_tpu.ops.ring_attention import (
    ring_attention,
    shard_sequence,
)
from multimodal_eeg_fmri_tpu.ops.moe import MoEFFN, top_k_routing

__all__ = [
    "ring_attention",
    "shard_sequence",
    "MoEFFN",
    "top_k_routing",
    "cross_entropy",
    "focal_loss",
    "label_smoothing_cross_entropy",
    "weighted_cross_entropy",
    "mse_loss",
    "warmup_cosine_schedule",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "augment_temporal",
    "make_eeg_augment",
]
