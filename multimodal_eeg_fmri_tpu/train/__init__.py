"""Training: jitted whole-run fit, CV drivers, fold-parallelism, HPO."""

from multimodal_eeg_fmri_tpu.train.fit import FitResult, fit, make_fit_fn
from multimodal_eeg_fmri_tpu.train.evaluate import evaluate_dataset

__all__ = ["FitResult", "fit", "make_fit_fn", "evaluate_dataset"]
