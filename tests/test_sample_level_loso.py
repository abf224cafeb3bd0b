"""Sample-level LOSO with per-subject majority voting — the reference's
``run_loso_subject_evaluation`` granularity (multiple EEG samples per
subject, vote = mean class-1 probability over the held-out subject's
samples)."""

import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.train.cv import (
    loso_splits,
    run_cv,
    subject_level_votes,
)


def test_multisample_loso_votes():
    # 8 subjects × 3 samples each, separable
    n_subjects, per = 8, 3
    data = synthetic_eeg_trimodal(n_subjects=n_subjects * per, time_steps=32,
                                  separation=2.5, seed=6)
    subj = np.repeat(np.arange(1, n_subjects + 1), per)
    data["subject"] = subj
    # subject-consistent labels
    subj_label = {s: int(data["label"][subj == s][0])
                  for s in range(1, n_subjects + 1)}
    data["label"] = np.asarray([subj_label[s] for s in subj], np.int32)
    # re-inject the class signal consistently with the relabeled subjects
    shift = (data["label"] * 2 - 1).astype(np.float32)[:, None, None]
    data["erp"] = data["erp"] + 0.6 * shift
    data["pw"] = data["pw"] + 0.6 * shift
    data["conn"] = data["conn"] + 0.6 * shift[:, :, 0]

    cfg = TrainConfig(batch_size=8, num_epochs=6, learning_rate=3e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    splits = loso_splits(data, cfg)
    assert len(splits) == n_subjects
    # every fold's test set = exactly that subject's 3 samples
    for sp in splits:
        assert len(sp.test) == per
        assert len(set(subj[sp.test])) == 1

    res = run_cv(TriModalFusionNetV4Lite(hidden_dim=16), cfg, data, splits,
                 normalize_keys=("erp", "pw", "conn"))
    votes = subject_level_votes(res)
    assert len(votes) == n_subjects
    acc = np.mean([votes[s] == subj_label[s] for s in votes])
    assert acc > 0.6, (votes, subj_label)
