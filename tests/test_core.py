"""Core subsystem tests: config round-trip, RNG streams, determinism
harness, compilation cache, profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import (
    EEGConfig,
    ExperimentConfig,
    TrainConfig,
    load_config,
    save_config,
)
from multimodal_eeg_fmri_tpu.core.determinism import run_twice_and_compare
from multimodal_eeg_fmri_tpu.core.rng import RngStream, seed_everything


def test_config_yaml_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        train=TrainConfig(batch_size=16, learning_rate=1e-3, loss="focal"),
        eeg=EEGConfig(time_steps=128, hidden_dim=64),
        experiment_name="roundtrip",
    )
    p = tmp_path / "cfg.yaml"
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded.train.batch_size == 16
    assert loaded.train.loss == "focal"
    assert loaded.eeg.time_steps == 128
    assert loaded.experiment_name == "roundtrip"
    # unknown keys ignored, defaults preserved
    assert loaded.fmri.hidden_dim == cfg.fmri.hidden_dim


def test_rng_streams_stable_and_independent():
    root = seed_everything(7)
    s1 = RngStream(root)
    s2 = RngStream(seed_everything(7))
    # replay-stable regardless of interleaving
    a1 = s1.next("dropout")
    _ = s1.next("augment")
    a2 = s1.next("dropout")
    b1 = s2.next("dropout")
    b2 = s2.next("dropout")
    assert jnp.array_equal(jax.random.key_data(a1), jax.random.key_data(b1))
    assert jnp.array_equal(jax.random.key_data(a2), jax.random.key_data(b2))
    assert not jnp.array_equal(jax.random.key_data(a1),
                               jax.random.key_data(a2))


def test_determinism_harness_on_train_step():
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
    from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
    from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

    data = synthetic_bridge(n_subjects=8, seed=0)
    data.pop("subject")
    train = jax.tree_util.tree_map(jnp.asarray, pad_rows(data, 8))
    cfg = TrainConfig(batch_size=4, num_epochs=2, schedule="constant",
                      selection="train_loss", patience=100)
    fit = jax.jit(make_fit_fn(BridgeFusionNet(bridge_dim=16), cfg,
                              eval_names=()))
    run_twice_and_compare(
        lambda: fit(jax.random.key(0), train, {}, None).history["train_loss"]
    )


def test_determinism_harness_catches_mismatch():
    state = {"n": 0}

    def impure():
        state["n"] += 1
        return jnp.asarray(float(state["n"]))

    with pytest.raises(AssertionError):
        run_twice_and_compare(impure)


def test_step_timer():
    from multimodal_eeg_fmri_tpu.core.profiling import StepTimer

    t = StepTimer(warmup=1)
    f = jax.jit(lambda x: x * 2)
    for _ in range(4):
        t.time_call(f, jnp.ones(8))
    s = t.stats()
    assert s["n"] == 3
    assert s["mean_ms"] > 0
