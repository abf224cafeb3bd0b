"""Wall-clock of the COMPLETE reference EEG experiment at reference scale.

The reference's main entry (`EEG_CODE/CrossModal_EEG_scr.ipynb` §30-44)
trains 4 architectures × 5 SGKF folds (50 epochs, early stopping, plateau
LR, per-epoch eval) plus 66-fold LOSO subject voting, then stats + late
fusion — hours of sequential torch on a workstation. This measures the same
workload here (`pipelines.run_eeg_experiment` on synthetic data at the
reference's exact dims: 66 subjects, ERP (250,18), PW (250,75), CONN 459)
on the real chip, cold (compile-included) and warm (persistent cache)
— the end-to-end number the per-step benchmarks roll up into.

`python benchmarks/full_experiment_wall.py [--no-loso]`
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-loso", action="store_true",
                    help="skip the 66-fold LOSO stage")
    ap.add_argument("--aot", default=None, metavar="DIR",
                    help="AOT bundle cache dir (core/aot.py): first run "
                         "exports each fit program, later runs skip "
                         "re-tracing them")
    args = ap.parse_args()

    from multimodal_eeg_fmri_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_eeg_fmri_tpu.core.config import ExperimentConfig
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.pipelines import run_eeg_experiment

    cfg = ExperimentConfig()
    data = synthetic_eeg_trimodal(
        n_subjects=66, time_steps=250, separation=1.0, seed=0)

    t0 = time.perf_counter()
    results = run_eeg_experiment(cfg, data=data,
                                 with_loso=not args.no_loso, export=False,
                                 aot_dir=args.aot)
    wall = time.perf_counter() - t0

    rows = []
    for name, cv in results["kfold"].items():
        mean, std = cv.summary["f1"]
        rows.append(f"  {name:12s} F1 {mean:.4f} ± {std:.4f}")
    print("\n".join(rows))
    if results.get("loso"):
        print(f"  LOSO subject-vote accuracy: "
              f"{results['loso']['subject_accuracy']:.4f}")
    print(f"FULL EEG EXPERIMENT wall: {wall:.1f} s "
          f"(4 models x 5-fold SGKF, 50 epochs"
          f"{'' if args.no_loso else ' + 66-fold LOSO'}; "
          f"reference: hours on a workstation)")


if __name__ == "__main__":
    main()
