"""Metrics, statistical tests, calibration, exports."""

from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
    regression_metrics,
    auc_roc,
)
from multimodal_eeg_fmri_tpu.report.conformal import (
    conformal_calibrate,
    conformal_sets,
    coverage_and_size,
)
from multimodal_eeg_fmri_tpu.report.uncertainty import ensemble_uncertainty
from multimodal_eeg_fmri_tpu.report.drift import (
    cusum_step,
    ewma_step,
    make_drift_monitor,
)
from multimodal_eeg_fmri_tpu.report.calibration import (
    brier_score,
    expected_calibration_error,
    fit_temperature,
    fit_temperature_ensemble,
    optimal_threshold,
    reliability_curve,
    threshold_sweep,
)

__all__ = [
    "binary_classification_metrics",
    "regression_metrics",
    "auc_roc",
    "brier_score",
    "expected_calibration_error",
    "fit_temperature",
    "fit_temperature_ensemble",
    "optimal_threshold",
    "reliability_curve",
    "threshold_sweep",
    "cusum_step",
    "ewma_step",
    "make_drift_monitor",
    "conformal_calibrate",
    "conformal_sets",
    "coverage_and_size",
    "ensemble_uncertainty",
]
