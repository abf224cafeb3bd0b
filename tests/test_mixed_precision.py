"""bf16 mixed-precision training path: trains, learns, keeps f32 master
params and f32 running stats."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


def test_bf16_training_learns():
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32,
                                  separation=2.5, seed=9)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(24)), 24)
    val = pad_rows(subset(data, np.arange(24, 32)), 8)
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)

    cfg = TrainConfig(batch_size=8, num_epochs=8, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100,
                      compute_dtype="bfloat16")
    fit = jax.jit(make_fit_fn(TriModalFusionNetV4Lite(hidden_dim=16), cfg,
                              eval_names=("val",)))
    res = fit(jax.random.key(0), dev(train), {"val": dev(val)}, None)

    hist = jax.tree_util.tree_map(np.asarray, res.history)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert float(res.best_metric) > 0.6
    # master params & running stats stayed f32
    for leaf in jax.tree_util.tree_leaves(res.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(res.batch_stats):
        assert leaf.dtype == jnp.float32
