"""multimodal_eeg_fmri_tpu — TPU-native multimodal EEG+fMRI framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference clinical neuro-ML codebase (bacon205/Multimodal_eeg_fmri): tri-modal
EEG fusion (ERP time series + power spectra + functional connectivity),
bi-modal fMRI fusion (ROI activations + PPI connectivity), and a cross-modal
EEG↔fMRI "bridge" classifier — plus the evaluation harnesses (stratified
group k-fold, LOSO, LOOCV), XAI suite (saliency, integrated gradients, SHAP,
ablation, fusion-weight analysis), HPO, and reporting the reference ships.

Unlike the reference (single-device PyTorch, host-sequential loops), every
compute path here is designed TPU-first:

- models are pure-functional flax modules compiled once under ``jax.jit``;
- cross-validation folds, IG interpolation steps, HPO trials, and SHAP
  coalition evaluations are *batched device axes* (``vmap``) rather than
  Python loops;
- multi-chip scaling goes through one mesh module (``parallel/``) with
  data-parallel + fold/ensemble-parallel shardings over ICI;
- preprocessing (bandpass filtfilt, STFT spectrograms, PLV/COH/WPLI
  connectivity, z-scoring, ROI aggregation) runs on device (``ops/signal*``)
  so the MATLAB/FieldTrip + host-NumPy stages of the reference fuse into the
  training step.

Subpackages
-----------
core       typed configs, PRNG discipline, checkpointing, logging/metrics
parallel   device mesh, shardings, collective helpers (the "comm backend")
ops        compute primitives: attention (Pallas), conv stacks, losses,
           schedules, on-device signal processing
models     flax model zoo mirroring the reference model inventory
data       host-side readers, subject alignment, splits, synthetic fixtures
train      jitted train/eval steps, trainers, CV drivers, fold-vmap, HPO
xai        batched attribution (saliency/IG/ablation/SHAP), montage tables
report     metrics, statistical tests, exports
"""

__version__ = "0.1.0"
