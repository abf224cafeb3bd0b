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


def _pin_gspmd_partitioner() -> None:
    """Correctness pin: force the GSPMD partitioner over Shardy.

    jax 0.9.0's default Shardy partitioner MISCOMPILES
    ``jit(vmap(conv → conv))`` when the vmapped batch inputs are sharded
    over a mesh axis: results are silently wrong by O(1) — not noise
    (measured max|Δ| 6.36 on a two-conv stack vs 0.0 under GSPMD; CPU
    backend, 8 virtual devices; minimal repro in
    ``tests/test_partitioner_regression.py``). Every conv-encoder model in
    this framework hits that pattern on the fold-vmapped mesh path
    (``run_cv(mesh_plan=...)``), so the buggy default would corrupt sharded
    training silently. Found by ``__graft_entry__.dryrun_multichip``'s
    sharded==unsharded equality check.

    Set ``MMEF_KEEP_SHARDY=1`` to opt out (e.g. to re-test a fixed jax;
    the regression test re-runs the comparison either way).
    """
    import os

    if os.environ.get("MMEF_KEEP_SHARDY"):
        return
    try:
        import jax

        if jax.config.jax_use_shardy_partitioner:
            jax.config.update("jax_use_shardy_partitioner", False)
    except Exception:
        pass  # ancient/newer jax without the flag: nothing to pin


_pin_gspmd_partitioner()
