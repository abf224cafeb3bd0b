"""Quickstart: the full two-stage EEG↔fMRI bridge on synthetic data —
stage-1 training, frozen extraction, LOOCV bridge with per-subject XAI.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="./results_bridge_quickstart")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from multimodal_eeg_fmri_tpu.core.config import ExperimentConfig, TrainConfig
    from multimodal_eeg_fmri_tpu.pipelines import run_bridge_experiment
    from multimodal_eeg_fmri_tpu.report.export import (
        export_per_subject_records,
        export_xai_arrays,
    )
    from multimodal_eeg_fmri_tpu.xai.analysis import classwise_weight_comparison

    cfg = ExperimentConfig(
        train=TrainConfig(batch_size=8, num_epochs=15, learning_rate=1e-3,
                          schedule="constant", selection="train_loss",
                          patience=100),
        output_dir=args.out,
    )
    out = run_bridge_experiment(cfg)
    res = out["bridge"]
    print("LOOCV:", {k: f"{v:.3f}" for k, v in res.loocv_metrics.items()})
    print("class-wise fusion weights:",
          {k: v.round(3) for k, v in
           classwise_weight_comparison(res.per_subject).items()})
    print("XAI arrays:", {k: v.shape for k, v in res.xai.items()})


if __name__ == "__main__":
    main()
