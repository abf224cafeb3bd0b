"""Metrics, statistical tests, exports."""

from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
    regression_metrics,
    auc_roc,
)

__all__ = [
    "binary_classification_metrics",
    "regression_metrics",
    "auc_roc",
]
