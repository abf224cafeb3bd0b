"""Batched on-device XAI: saliency, integrated gradients, ablation, SHAP,
attention/fusion-weight extraction, montage mapping."""

from multimodal_eeg_fmri_tpu.xai.attribution import (
    ablation_importance,
    gradient_saliency,
    gradient_x_input,
    integrated_gradients,
)
from multimodal_eeg_fmri_tpu.xai.shap_kernel import kernel_shap
from multimodal_eeg_fmri_tpu.xai.montage import (
    CHANNEL_NAMES_18,
    CHANNEL_POSITIONS,
    REGION_GROUPS,
    channel_region,
)
from multimodal_eeg_fmri_tpu.xai.explainer import Explainer, ExplanationResult
from multimodal_eeg_fmri_tpu.xai.analysis import (
    ChannelImportance,
    channel_importance_from_attribution,
    extract_attention_and_fusion_weights,
)

__all__ = [
    "gradient_saliency",
    "gradient_x_input",
    "integrated_gradients",
    "ablation_importance",
    "kernel_shap",
    "CHANNEL_NAMES_18",
    "CHANNEL_POSITIONS",
    "REGION_GROUPS",
    "channel_region",
    "Explainer",
    "ExplanationResult",
    "ChannelImportance",
    "channel_importance_from_attribution",
    "extract_attention_and_fusion_weights",
]
