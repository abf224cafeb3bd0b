"""HPO study + stats/exports tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import pad_rows, subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.train.hpo import (
    Choice,
    LogUniform,
    HPOResult,
    run_hpo,
    sample_trials,
)
from multimodal_eeg_fmri_tpu.report.stats import (
    confidence_interval,
    evaluate_late_fusion,
    late_fusion_probs,
    paired_tests,
)


def test_sample_trials_coverage():
    space = {"lr": LogUniform(1e-5, 1e-2), "hidden": Choice((8, 16))}
    trials = sample_trials(space, 16, seed=0)
    assert len(trials) == 16
    lrs = np.asarray([t["lr"] for t in trials])
    assert lrs.min() >= 1e-5 and lrs.max() <= 1e-2
    assert np.ptp(np.log(lrs)) > 2.0  # actually spreads over the range
    assert {t["hidden"] for t in trials} == {8, 16}


def test_run_hpo_finds_config():
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32,
                                  separation=2.0, seed=8)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(24)), 24)
    val = pad_rows(subset(data, np.arange(24, 32)), 8)

    space = {
        "lr": LogUniform(1e-4, 1e-2),
        "wd": LogUniform(1e-6, 1e-3),
        "hidden_dim": Choice((16, 32)),
    }
    base = TrainConfig(batch_size=8, num_epochs=6, schedule="constant",
                       patience=100)
    res = run_hpo(
        lambda **kw: TriModalFusionNetV4Lite(**kw),
        base, train, val, space=space, n_trials=6,
        proxy_epochs=3, full_epochs=6, seed=0,
    )
    assert isinstance(res, HPOResult)
    assert res.best_score > 0.5
    assert set(res.best_params) == {"lr", "wd", "hidden_dim"}
    assert len(res.trials) == 6
    assert all("score" in t for t in res.trials)


def test_paired_tests_and_ci():
    a = [0.6, 0.65, 0.7, 0.62, 0.68]
    b = [0.5, 0.55, 0.52, 0.51, 0.53]
    r = paired_tests(a, b)
    assert r["t_p"] < 0.05
    assert r["mean_diff"] > 0
    mean, lo, hi = confidence_interval(a)
    assert lo < mean < hi


def test_late_fusion():
    p1 = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    p2 = np.asarray([[0.7, 0.3], [0.4, 0.6]])
    fused = late_fusion_probs([p1, p2])
    np.testing.assert_allclose(fused, [[0.8, 0.2], [0.3, 0.7]])
    weighted = late_fusion_probs([p1, p2], weights=[3, 1])
    np.testing.assert_allclose(weighted[0], [0.85, 0.15])


def test_export_csvs(tmp_path):
    from multimodal_eeg_fmri_tpu.report.export import (
        export_cv_results,
        export_xai_arrays,
        results_dataframe,
        summary_dataframe,
    )

    class FakeCV:
        fold_metrics = {"f1": np.asarray([0.6, 0.7])}
        summary = {"f1": (0.65, 0.05)}

    results = {"m1": FakeCV(), "m2": FakeCV()}
    df = results_dataframe(results)
    assert len(df) == 4
    sdf = summary_dataframe(results)
    assert "f1_mean" in sdf.columns
    paths = export_cv_results(results, tmp_path, timestamp=False)
    assert paths["detailed"].exists() and paths["summary"].exists()
    p = export_xai_arrays({"sal": np.ones((2, 3))}, tmp_path,
                          timestamp=False)
    assert p.exists()
    loaded = np.load(p)
    assert loaded["sal"].shape == (2, 3)


def test_run_hpo_mesh_sharded():
    """HPO trials shard over the mesh's ensemble axis (with padding)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 devices")
    from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh

    plan = build_mesh(jax.devices()[:8], ensemble=8, data=1)
    data = synthetic_eeg_trimodal(n_subjects=24, time_steps=32,
                                  separation=2.0, seed=9)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(16)), 16)
    val = pad_rows(subset(data, np.arange(16, 24)), 8)
    space = {"lr": LogUniform(1e-4, 1e-2), "wd": LogUniform(1e-6, 1e-3)}
    base = TrainConfig(batch_size=8, num_epochs=4, schedule="constant",
                       patience=100)
    res = run_hpo(lambda **kw: TriModalFusionNetV4Lite(hidden_dim=16, **kw),
                  base, train, val, space=space, n_trials=5,  # pads 5 → 8
                  proxy_epochs=2, full_epochs=4, seed=0, mesh_plan=plan)
    assert res.best_score > 0.4
    assert len(res.trials) == 5


def test_run_hpo_model_family_axis():
    """The reference study searches use_gnn among its hyperparameters
    (enhanced_models_v4.py:700-720); the DEFAULT_SPACE carries the same
    model-family axis via the build_trimodal dispatcher, with matrix-form
    conn serving both families."""
    from multimodal_eeg_fmri_tpu.train.hpo import DEFAULT_SPACE, build_trimodal

    assert "use_gnn" in DEFAULT_SPACE

    data = synthetic_eeg_trimodal(n_subjects=24, time_steps=16,
                                  separation=2.0, seed=9,
                                  conn_as_matrix=True, n_nodes=6, n_metrics=2)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(16)), 16)
    val = pad_rows(subset(data, np.arange(16, 24)), 8)

    space = {
        "lr": LogUniform(1e-4, 1e-2),
        "use_gnn": Choice((False, True)),
        "hidden_dim": Choice((16,)),
        "num_heads": Choice((2,)),
        "num_transformer_layers": Choice((1,)),
    }
    base = TrainConfig(batch_size=8, num_epochs=4, schedule="constant",
                       patience=100)
    res = run_hpo(build_trimodal, base, train, val, space=space,
                  n_trials=4, proxy_epochs=2, full_epochs=3, seed=0)
    assert "use_gnn" in res.best_params
    families = {t["use_gnn"] for t in res.trials}
    assert families == {False, True}  # both families actually trained
    assert np.isfinite(res.best_score)
