"""Quantify what test-set model selection is worth — leaky vs clean.

The reference's LOSO and k-fold drivers select the best epoch on the SAME
samples they report as the test score (SURVEY §2.5: `val_loader` aliases
the held-out subject, `CrossModal_EEG_scr.ipynb §30-31`). This framework
fixed that — `data/splits.py` defaults to a leakage-free inner subject
split and makes the reference-faithful mode opt-in (`val_ratio=0`, warns).

This script turns that defect fix into a MEASUREMENT: the same frozen
dataset, the same model, the same fold protocol, run under both selection
modes; the reported delta is how much of a reference-style score is
attributable to test-set selection rather than the model. Deltas are
averaged over several training seeds (selection inflation is a max-over-
epochs statistic of eval noise — one seed is an anecdote).

The task is deliberately WEAK (`separation=0.5`, near the reference's real
operating point of F1 ≈ 0.60): on a cleanly-separable task both modes
saturate and the leak is invisible; near chance, picking the epoch that
maximizes the test subject's own F1 rides eval noise upward.

This is a statistical measurement, not a kernel benchmark — the numbers
are backend-independent (identical math on CPU and TPU); CPU runs are
fully valid. Output: one JSON line for docs/DESIGN.md "Selection leakage".

Run: ``python benchmarks/selection_leakage.py`` (~10 min CPU).
"""

from __future__ import annotations

import json
import sys
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.train.cv import (
        eeg_kfold_splits,
        loso_splits,
        run_cv,
        subject_level_votes,
    )

    # ONE frozen dataset for every condition (the comparison is selection
    # mode, nothing else); weakly separable ≈ the reference's regime
    data = synthetic_eeg_trimodal(n_subjects=24, time_steps=32,
                                  erp_channels=6, pw_channels=8,
                                  conn_features=24, separation=0.5, seed=11)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    seeds = (0, 1, 2)

    def cv_f1(splits, seed):
        cfg = TrainConfig(batch_size=8, num_epochs=30, learning_rate=2e-3,
                          schedule="constant", loss="weighted_ce",
                          selection="val", patience=100, seed=7)
        with warnings.catch_warnings():
            # the leaky mode warns by design; don't spam the sweep
            warnings.simplefilter("ignore")
            res = run_cv(model, cfg, data, splits,
                         normalize_keys=("erp", "pw", "conn"),
                         rng=jax.random.key(seed))
        out = {"f1": float(res.summary["f1"][0])}
        # subject votes only mean something when each test fold IS one
        # subject (LOSO); on k-fold the vote would pool one fold's many
        # subjects under the first subject's id
        single_subject_folds = all(
            len(np.unique(np.asarray(data["subject"])[sp.test])) == 1
            for sp in splits)
        votes = subject_level_votes(res) if single_subject_folds else {}
        if votes:  # LOSO: the reference's §31 headline is subject accuracy
            subj = np.asarray(data["subject"])
            lbl = {int(s): int(l) for s, l in zip(subj, data["label"])}
            out["subject_acc"] = float(np.mean(
                [votes[s] == lbl[s] for s in votes]))
        return out

    cfg0 = TrainConfig(seed=7)
    protocols = {
        # reference-faithful leaky mode vs leakage-free default — identical
        # test folds in each pair (only the val/selection indices differ)
        "loso": (loso_splits(data, cfg0, val_ratio=0),
                 loso_splits(data, cfg0)),
        "sgkf5": (eeg_kfold_splits(data, cfg0, n_splits=5, val_ratio=0),
                  eeg_kfold_splits(data, cfg0, n_splits=5)),
    }

    out = {"metric": "selection_leakage", "separation": 0.5,
           "n_subjects": 24, "seeds": len(seeds)}
    import jax as _jax
    out["backend"] = _jax.default_backend()
    for name, (leaky, clean) in protocols.items():
        for i, (la, cl) in enumerate(zip(leaky, clean)):
            assert np.array_equal(la.test, cl.test), (name, i)
        rows = {"leaky": [], "clean": []}
        for seed in seeds:
            rows["leaky"].append(cv_f1(leaky, seed))
            rows["clean"].append(cv_f1(clean, seed))
        for mode, rs in rows.items():
            out[f"{name}_{mode}_f1"] = round(
                float(np.mean([r["f1"] for r in rs])), 4)
            out[f"{name}_{mode}_f1_std"] = round(
                float(np.std([r["f1"] for r in rs])), 4)
            if "subject_acc" in rs[0]:
                out[f"{name}_{mode}_subject_acc"] = round(
                    float(np.mean([r["subject_acc"] for r in rs])), 4)
        out[f"{name}_f1_inflation"] = round(
            out[f"{name}_leaky_f1"] - out[f"{name}_clean_f1"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
