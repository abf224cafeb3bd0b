"""Fault-tolerance tests: chunked training resumes bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn
from multimodal_eeg_fmri_tpu.train.resilient import fit_resumable, latest_chunk


@pytest.fixture
def setup():
    data = synthetic_bridge(n_subjects=16, separation=1.5, seed=0)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    val = pad_rows(subset(data, np.arange(12, 16)), 4)
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    cfg = TrainConfig(batch_size=4, num_epochs=8, learning_rate=2e-3,
                      schedule="constant", selection="val", patience=100)
    model = BridgeFusionNet(bridge_dim=16)
    return model, cfg, dev(train), {"val": dev(val)}


def test_chunked_matches_monolithic(setup, tmp_path):
    """4 chunks of 2 epochs == one run of 8 epochs (same RNG, same carry)."""
    model, cfg, train, evals = setup
    rng = jax.random.key(0)

    mono = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))(
        rng, train, evals, None)

    res = fit_resumable(model, cfg, rng, train, evals,
                        tmp_path / "ck", chunk_epochs=2)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(res.history["train_loss"])]),
        np.asarray(mono.history["train_loss"]), rtol=1e-5, atol=1e-6)
    assert float(res.best_metric) == pytest.approx(float(mono.best_metric),
                                                   abs=1e-6)


def test_resume_after_crash(setup, tmp_path):
    """Killing after chunk 1 and re-invoking continues, not restarts."""
    model, cfg, train, evals = setup
    rng = jax.random.key(0)
    ck = tmp_path / "ck"

    # simulate a crash: run only the first 2 chunks by lying about epochs
    import dataclasses

    partial_cfg = dataclasses.replace(cfg, num_epochs=4)
    fit_resumable(model, partial_cfg, rng, train, evals, ck, chunk_epochs=2)
    assert latest_chunk(ck) == 1

    # "restart": full epoch budget; should resume from chunk 2
    res = fit_resumable(model, cfg, rng, train, evals, ck, chunk_epochs=2)
    assert np.asarray(res.history["train_loss"]).shape == (8,)

    mono = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))(
        rng, train, evals, None)
    np.testing.assert_allclose(
        np.asarray(res.history["train_loss"]),
        np.asarray(mono.history["train_loss"]), rtol=1e-5, atol=1e-6)


def test_async_save_matches_sync_and_resumes(setup, tmp_path):
    """async_save overlaps the disk write with the next chunk; the
    histories, markers, and crash-resume behavior must be identical to
    the synchronous path."""
    model, cfg, train, evals = setup
    rng = jax.random.key(0)

    res_sync = fit_resumable(model, cfg, rng, train, evals,
                             tmp_path / "sync", chunk_epochs=2)
    res_async = fit_resumable(model, cfg, rng, train, evals,
                              tmp_path / "async", chunk_epochs=2,
                              async_save=True)
    np.testing.assert_array_equal(
        np.asarray(res_async.history["train_loss"]),
        np.asarray(res_sync.history["train_loss"]))
    # every chunk was finalized (markers written after wait_until_finished)
    assert latest_chunk(tmp_path / "async") == latest_chunk(tmp_path / "sync")

    # crash mid-run, then resume THROUGH the async path
    import dataclasses

    ck = tmp_path / "async_crash"
    partial_cfg = dataclasses.replace(cfg, num_epochs=4)
    fit_resumable(model, partial_cfg, rng, train, evals, ck,
                  chunk_epochs=2, async_save=True)
    assert latest_chunk(ck) == 1
    res = fit_resumable(model, cfg, rng, train, evals, ck,
                        chunk_epochs=2, async_save=True)
    np.testing.assert_allclose(
        np.asarray(res.history["train_loss"]),
        np.asarray(res_sync.history["train_loss"]), rtol=1e-5, atol=1e-6)
