"""Core infrastructure: configs, PRNG, logging, checkpointing."""

from multimodal_eeg_fmri_tpu.core.config import (
    BridgeConfig,
    EEGConfig,
    ExperimentConfig,
    FMRIConfig,
    TrainConfig,
    load_config,
    save_config,
)
from multimodal_eeg_fmri_tpu.core.rng import RngStream, seed_everything
from multimodal_eeg_fmri_tpu.core.logging import get_logger, MetricsLogger

__all__ = [
    "BridgeConfig",
    "EEGConfig",
    "ExperimentConfig",
    "FMRIConfig",
    "TrainConfig",
    "load_config",
    "save_config",
    "RngStream",
    "seed_everything",
    "get_logger",
    "MetricsLogger",
]
