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
from multimodal_eeg_fmri_tpu.core.rng import RngStream, seed_everything, training_key
from multimodal_eeg_fmri_tpu.core.logging import get_logger, MetricsLogger
from multimodal_eeg_fmri_tpu.core.cache import enable_compilation_cache
from multimodal_eeg_fmri_tpu.core.checkpoint import (
    export_frozen_encoder,
    find_best_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from multimodal_eeg_fmri_tpu.core.determinism import run_twice_and_compare
from multimodal_eeg_fmri_tpu.core.aot import export_jitted, load_bundle
from multimodal_eeg_fmri_tpu.core.profiling import StepTimer, annotate, trace
from multimodal_eeg_fmri_tpu.core.quantize import load_quantized, save_quantized

__all__ = [
    "save_quantized",
    "load_quantized",
    "BridgeConfig",
    "EEGConfig",
    "ExperimentConfig",
    "FMRIConfig",
    "TrainConfig",
    "load_config",
    "save_config",
    "RngStream",
    "seed_everything",
    "training_key",
    "get_logger",
    "MetricsLogger",
    "enable_compilation_cache",
    "export_jitted",
    "load_bundle",
    "save_checkpoint",
    "load_checkpoint",
    "export_frozen_encoder",
    "find_best_checkpoint",
    "run_twice_and_compare",
    "StepTimer",
    "annotate",
    "trace",
]
