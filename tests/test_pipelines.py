"""Smoke tests for the four pipeline entry points + the CLI.

The reference's entry points run top-to-bottom with no hand-tuned config
(``_test_bridge.py:826-989``, ``run_fmri_v11.py:935-1026``); these tests
assert the same for our ``pipelines.run_*`` functions and
``python -m multimodal_eeg_fmri_tpu``. Tiny shapes/epochs keep compile+run
under a minute each on CPU.
"""

import dataclasses

import numpy as np
import pytest

from multimodal_eeg_fmri_tpu import pipelines
from multimodal_eeg_fmri_tpu.core.config import (
    ExperimentConfig,
    save_config,
)
from multimodal_eeg_fmri_tpu.data.synthetic import (
    synthetic_eeg_trimodal,
    synthetic_fmri,
)


def tiny_cfg(tmp_path, **train_overrides) -> ExperimentConfig:
    cfg = ExperimentConfig()
    train = dataclasses.replace(
        cfg.train, num_epochs=2, batch_size=4, patience=100,
        **train_overrides)
    eeg = dataclasses.replace(
        cfg.eeg, hidden_dim=16, lite_hidden_dim=16, num_heads=2,
        num_transformer_layers=1, time_steps=16, n_splits=2)
    fmri = dataclasses.replace(
        cfg.fmri, hidden_dim=16, fusion_dim=16, n_splits=2)
    bridge = dataclasses.replace(cfg.bridge, bridge_dim=16, num_heads=2)
    return dataclasses.replace(
        cfg, train=train, eeg=eeg, fmri=fmri, bridge=bridge,
        output_dir=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"))


def tiny_eeg(n=16, t=16):
    return synthetic_eeg_trimodal(n_subjects=n, time_steps=t,
                                  separation=1.0, seed=0)


def tiny_fmri(n=16):
    return synthetic_fmri(n_subjects=n, seed=0)


def test_run_eeg_experiment_default_cfg(tmp_path):
    cfg = tiny_cfg(tmp_path)
    out = pipelines.run_eeg_experiment(
        cfg, data=tiny_eeg(), with_loso=False, export=True)
    assert set(out["kfold"]) == {"trimodal", "fusion", "pwonly", "erponly"}
    for r in out["kfold"].values():
        assert np.isfinite(r.summary["f1"][0])
    assert "stats" in out and "late_fusion" in out
    assert out["export_paths"]  # exports actually written


def test_run_fmri_experiment_default_cfg(tmp_path):
    cfg = tiny_cfg(tmp_path)
    out = pipelines.run_fmri_experiment(cfg, data=tiny_fmri(), export=False)
    assert set(out["classification"]) == {
        "fusion", "activation_only", "connectivity_only"}
    assert "regression" in out  # synthetic data carries reg_label
    for r in out["classification"].values():
        assert np.isfinite(r.summary["accuracy"][0])


def test_run_bridge_experiment_default_cfg(tmp_path):
    """Regression test for the round-1 crash: the default config
    (selection='val') must work through the stage-1 eval-less fit."""
    cfg = tiny_cfg(tmp_path)
    assert cfg.train.selection == "val"  # the config that used to crash
    out = pipelines.run_bridge_experiment(
        cfg, eeg_data=tiny_eeg(), fmri_data=tiny_fmri(), export=True)
    res = out["bridge"]
    assert np.isfinite(res.loocv_metrics["accuracy"])
    assert len(res.per_subject) == len(out["bridge_data"]["label"])
    assert "saliency_eeg" in res.xai


def test_run_lite_training_default_cfg(tmp_path):
    cfg = tiny_cfg(tmp_path)
    out = pipelines.run_lite_training(cfg, data=tiny_eeg(), export=False)
    assert np.isfinite(out["lite"].summary["f1"][0])


def test_cli_main_lite(tmp_path, capsys):
    """``python -m multimodal_eeg_fmri_tpu --pipeline lite`` end-to-end with
    a YAML config overlay (synthetic data path: data roots don't exist)."""
    from multimodal_eeg_fmri_tpu.__main__ import main

    cfg = tiny_cfg(tmp_path)
    # shrink the synthetic fallback: loaders synthesize 66 subjects at
    # cfg.eeg.time_steps, so keep time_steps tiny via the overlay
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, cfg_path)
    rc = main(["--pipeline", "lite", "--config", str(cfg_path),
               "--epochs", "2", "--no-export",
               "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"pipeline": "lite"' in out


def test_cli_requires_pipeline():
    from multimodal_eeg_fmri_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main([])


def test_cli_all_pipelines(tmp_path, monkeypatch):
    """`--pipeline all` chains eeg -> fmri -> bridge -> lite and merges the
    summaries (stage logic is covered by the per-pipeline tests; this
    verifies the CLI wiring with stubs)."""
    import io
    import contextlib
    import json
    import types

    from multimodal_eeg_fmri_tpu import __main__ as cli
    from multimodal_eeg_fmri_tpu import pipelines as pl

    calls = []

    class _R:
        summary = {"f1": (1.0, 0.0)}
        loocv_metrics = {"f1": 1.0}

    monkeypatch.setattr(pl, "run_eeg_experiment",
                        lambda cfg, export, aot_dir=None:
                        calls.append("eeg") or {"kfold": {"trimodal": _R()}})
    monkeypatch.setattr(pl, "run_fmri_experiment",
                        lambda cfg, export, aot_dir=None:
                        calls.append("fmri") or
                        {"classification": {"fusion": _R()}})
    monkeypatch.setattr(pl, "run_bridge_experiment",
                        lambda cfg, export:
                        calls.append("bridge") or
                        {"bridge": _R()})
    monkeypatch.setattr(pl, "run_lite_training",
                        lambda cfg, export:
                        calls.append("lite") or {"lite": _R()})

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["--pipeline", "all", "--no-export", "--cpu"])
    assert rc == 0
    assert calls == ["eeg", "fmri", "bridge", "lite"]
    out = json.loads(buf.getvalue())
    assert set(out["summary"]) == {"eeg", "fmri", "bridge", "lite"}
