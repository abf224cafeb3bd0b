"""Serving predictor tests: arbitrary request sizes against one compiled
executable, checkpoint loading, fused preprocessing, latency stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.checkpoint import save_checkpoint
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
from multimodal_eeg_fmri_tpu.serving import Predictor


@pytest.fixture(scope="module")
def trained():
    model = BridgeFusionNet(bridge_dim=16)
    key = jax.random.key(0)
    data = synthetic_bridge(n_subjects=20, seed=0)
    variables = model.init({"params": key, "dropout": key},
                           eeg=jnp.asarray(data["eeg"][:4]),
                           fmri=jnp.asarray(data["fmri"][:4]), train=False)
    return model, variables, data


@pytest.mark.parametrize("n", [1, 8, 11, 20])
def test_predict_any_size(trained, n):
    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    probs = p(eeg=data["eeg"][:n], fmri=data["fmri"][:n])
    assert probs.shape == (n, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # chunked result equals single-shot forward
    direct = np.asarray(jax.nn.softmax(model.apply(
        variables, eeg=jnp.asarray(data["eeg"][:n]),
        fmri=jnp.asarray(data["fmri"][:n]), train=False,
    ).logits.astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(probs, direct, rtol=2e-4, atol=2e-5)


def test_predictor_from_checkpoint(trained, tmp_path):
    model, variables, data = trained
    save_checkpoint(tmp_path / "m", variables["params"],
                    variables.get("batch_stats"))
    p = Predictor.from_checkpoint(model, tmp_path / "m", batch_size=4)
    probs = p(eeg=data["eeg"][:3], fmri=data["fmri"][:3])
    assert probs.shape == (3, 2)


def test_predictor_with_preprocess(trained):
    model, variables, data = trained

    def preprocess(inputs):
        return {"eeg": (inputs["eeg"] - inputs["eeg"].mean())
                / (inputs["eeg"].std() + 1e-8)}

    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8, preprocess=preprocess)
    probs = p(eeg=data["eeg"], fmri=data["fmri"])
    assert probs.shape == (20, 2)
    stats = p.benchmark(data, iters=5)
    assert stats["p50_ms"] > 0
