"""Model zoo mirroring the reference inventory (SURVEY §2.2)."""

from multimodal_eeg_fmri_tpu.models.eeg import (
    ERPOnlyNet,
    ModelOutput,
    PWOnlyNet,
    SmartFusionNetV4,
    TriModalFusionNetGNN,
    TriModalFusionNetV4,
    TriModalFusionNetV4Lite,
)
from multimodal_eeg_fmri_tpu.models.fmri import (
    FMRIActivationOnly,
    FMRIConnectivityOnly,
    FMRIFusionNet,
)
from multimodal_eeg_fmri_tpu.models.bridge import BridgeFusionNet
from multimodal_eeg_fmri_tpu.models.long_context import (
    LongContextClassifier,
    PipelinedLongContextClassifier,
)
from multimodal_eeg_fmri_tpu.models.multimodal import MultimodalEndToEnd

MODEL_REGISTRY = {
    "trimodal": TriModalFusionNetV4,
    "trimodal_lite": TriModalFusionNetV4Lite,
    "trimodal_gnn": TriModalFusionNetGNN,
    "fusion": SmartFusionNetV4,           # bi-modal ERP+PW (reference name)
    "erponly": ERPOnlyNet,
    "pwonly": PWOnlyNet,
    "fmri_fusion": FMRIFusionNet,
    "fmri_activation_only": FMRIActivationOnly,
    "fmri_connectivity_only": FMRIConnectivityOnly,
    "bridge": BridgeFusionNet,
    "multimodal_e2e": MultimodalEndToEnd,
    "long_context": LongContextClassifier,
}

__all__ = [
    "ModelOutput",
    "TriModalFusionNetV4",
    "TriModalFusionNetV4Lite",
    "TriModalFusionNetGNN",
    "SmartFusionNetV4",
    "ERPOnlyNet",
    "PWOnlyNet",
    "FMRIFusionNet",
    "FMRIActivationOnly",
    "FMRIConnectivityOnly",
    "BridgeFusionNet",
    "MultimodalEndToEnd",
    "LongContextClassifier",
    "PipelinedLongContextClassifier",
    "MODEL_REGISTRY",
]
