"""Quickstart: bi-modal fMRI comparison (classification + regression).

The fMRI protocol from the reference (`fMRI_CODE/run_fmri_v11.py` /
`CrossModal_fmri_scr.ipynb`): three models (fusion / activation-only /
connectivity-only) × k-fold, classification AND regression targets, plus
the learned modality fusion weights. Runs in ~2-4 min on CPU
(`python examples/quickstart_fmri.py --cpu`) or on a TPU chip as-is.
Swap `synthetic_fmri` for `data.loaders.load_fmri_features` when a real
data root is available.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--loso", action="store_true",
                    help="add the leave-one-subject-out evaluation")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_fmri
    from multimodal_eeg_fmri_tpu.models.fmri import FMRIFusionNet
    from multimodal_eeg_fmri_tpu.pipelines import run_fmri_experiment

    data = synthetic_fmri(n_subjects=32, separation=1.2, seed=0)
    out = run_fmri_experiment(data=data, export=False, with_loso=args.loso)

    for task in ("classification", "regression"):
        if task not in out:
            continue
        print(f"\n{task}:")
        for name, r in out[task].items():
            print(f"  {name:18s}",
                  {k: f"{m:.3f}±{s:.3f}" for k, (m, s) in r.summary.items()})

    # learned modality fusion weights (reference `get_fusion_weights`):
    # per-fold softmax weights of the fusion model
    fusion = out["classification"]["fusion"]
    w = np.asarray(jax.vmap(FMRIFusionNet.fusion_weights)(fusion.params))
    print("\nfusion weights per fold (activation, connectivity):")
    for i, wi in enumerate(w):
        print(f"  fold {i}: {wi[0]:.4f} / {wi[1]:.4f}")
    print(f"  mean: {w.mean(0)[0]:.4f} / {w.mean(0)[1]:.4f}"
          "  (reference §18: 0.4999 / 0.5001)")

    if args.loso:
        print("\nLOSO subject-level accuracy:",
              f"{out['loso']['subject_accuracy']:.3f}")


if __name__ == "__main__":
    main()
