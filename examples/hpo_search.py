"""Quickstart: hyperparameter search with vmapped trials.

The reference's `OptunaHPOTrainer` (`EEG_CODE/optuna_hpo_trainer.py`) runs
trials sequentially on one device. Here, trials sharing an architecture are
*stacked on a device axis* (vmap) so one compiled program trains many
trials at once; successive halving reruns the top fraction at full length.
With a mesh (`mesh_plan=`) the trial axis shards over chips — 8 trials at
one trial's wall-clock. An Optuna TPE backend (`run_hpo_optuna`) is also
available when sequential adaptivity matters more than throughput.

Runs in ~20 min on a throttled 1-CPU host at --trials 8 (XLA compiles of
the two architecture groups dominate; a real host is minutes, and on TPU
the trial rungs themselves are seconds). `--trials 4` for a quick demo.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trials", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.arrays import subset
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.train.hpo import build_trimodal, run_hpo

    # matrix-form conn serves BOTH model families in one study: the GNN
    # family consumes (B, N, N, M) directly, the MLP family flattens it
    data = synthetic_eeg_trimodal(n_subjects=48, separation=1.0, seed=0,
                                  conn_as_matrix=True, n_nodes=18,
                                  n_metrics=3)
    data.pop("subject")
    train = subset(data, np.arange(36))
    val = subset(data, np.arange(36, 48))

    cfg = TrainConfig(batch_size=8, num_epochs=30, selection="val",
                      patience=100)
    result = run_hpo(
        build_trimodal, cfg, train, val,
        n_trials=args.trials, proxy_epochs=8, full_epochs=30, seed=0)

    print("\ntop trials (rung 2, full epochs):")
    for t in sorted(result.trials, key=lambda t: -t.get("score", -1))[:3]:
        shown = {k: (round(v, 5) if isinstance(v, float) else v)
                 for k, v in t.items() if k != "score"}
        print(f"  f1={t['score']:.3f}  {shown}")
    print("\nbest config:", {k: (round(v, 5) if isinstance(v, float) else v)
                             for k, v in result.best_params.items()
                             if k != "score"})
    print("best val f1:", f"{result.best_score:.3f}")


if __name__ == "__main__":
    main()
