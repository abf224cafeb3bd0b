"""Trainer-class (FlexibleTrainer API) tests."""

import numpy as np
import pytest

import jax

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
from multimodal_eeg_fmri_tpu.train.trainer import Trainer


def test_trainer_epoch_loop_and_checkpoint(tmp_path):
    data = synthetic_bridge(n_subjects=16, separation=2.0, seed=1)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    val = pad_rows(subset(data, np.arange(12, 16)), 4)

    cfg = TrainConfig(batch_size=4, num_epochs=10, learning_rate=2e-3,
                      schedule="plateau", patience=4)
    tr = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    hist = tr.fit(train, val)
    assert len(hist["train_loss"]) >= 2
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert tr.best_metric > 0.0

    m = tr.evaluate(val)
    assert set(m) >= {"accuracy", "f1", "auc"}

    ck = tr.save_checkpoint(tmp_path / "trainer_ck")
    assert ck.exists()

    # fresh trainer restores the checkpointed params
    tr2 = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    tr2.train_one_epoch(train)
    tr2.load_checkpoint(tmp_path / "trainer_ck")
    m2 = tr2.evaluate(val)
    assert m2["accuracy"] == pytest.approx(
        max(hist["accuracy"]), abs=0.3)  # loose: restored best-state params
