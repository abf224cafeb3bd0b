"""Seed-robustness sweep at meaningful scale: S=16 seeds, one program.

The reference reports fold-to-fold spread only (F1 0.5953 ± 0.0444,
`CrossModal_EEG_scr.ipynb §44`); run-to-run training variance (init +
shuffle + dropout masks) goes unreported. `train/cv.run_seed_sweep` makes
the seed axis a device axis: here S=16 independent V4-Lite trainings of
one realistic fold (48 subjects, T=64, weakly separable) run as ONE
vmapped program on the chip, and the published numbers are the per-seed
F1 spread + the t-CI + the wall clock of the whole 16-run sweep.

Timing protocol: the sweep is a single jitted call; wall time is measured
around the call with a host fetch of every per-seed metric as the sync
(tunnel-safe — one dispatch, and the second run is reseeded so the tunnel
cannot memoize it). Both cold (compile+run) and warm (reseeded re-run)
wall clocks are reported.

Run: ``python benchmarks/seed_sweep_scale.py`` (v5e; CPU works for smoke).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.arrays import (
        balanced_class_weights,
        pad_rows,
        subset,
    )
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.train.cv import run_seed_sweep

    S = 16
    # separation 0.05: CALIBRATED weakly-separable regime (CPU sweep of
    # {0.02, 0.05, 0.1}: mean F1 0.55 / 0.65 / 0.92; 0.3 and 0.6 saturate
    # every seed at 1.0 on chip and the spread is invisible). 0.05 puts
    # the task at the reference's own operating point (§44 F1 ≈ 0.60),
    # where training actually lands in different basins per seed — the
    # thing this sweep exists to expose.
    data = synthetic_eeg_trimodal(n_subjects=60, time_steps=64,
                                  separation=0.05, seed=13)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(48)), 48)
    ev = pad_rows(subset(data, np.arange(48, 60)), 12)
    cw = balanced_class_weights(train["label"], weights=train["weight"])

    cfg = TrainConfig(batch_size=8, num_epochs=25, learning_rate=2e-3,
                      schedule="warmup_cosine", loss="weighted_ce",
                      selection="val", patience=100)
    model = TriModalFusionNetV4Lite()

    def sweep(base_seed):
        t0 = time.perf_counter()
        r = run_seed_sweep(model, cfg, train, {"val": ev}, S,
                           class_weights=cw, base_seed=base_seed)
        # host fetch of every per-seed metric = the sync point
        best = np.asarray(r["best_metric"])
        return r, best, time.perf_counter() - t0

    r, best, cold_s = sweep(0)
    _, best2, warm_s = sweep(1)  # same shapes → compile cache hit

    out = {
        "metric": "seed_sweep_scale",
        "backend": jax.default_backend(),
        "n_seeds": S,
        "f1_per_seed": [round(float(x), 4) for x in best],
        "f1_mean": round(float(r["mean"]), 4),
        "f1_std": round(float(r["std"]), 4),
        "f1_min": round(float(best.min()), 4),
        "f1_max": round(float(best.max()), 4),
        "ci95": [round(float(x), 4) for x in r["ci95"]],
        "cold_wall_s": round(cold_s, 1),
        "warm_wall_s": round(warm_s, 1),
        "warm_s_per_seed": round(warm_s / S, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
