"""Host-side utility modules: LR schedules (vs torch oracle + the in-fit
functional controllers), MetricsLogger round trips, and the 10-20 montage
tables the XAI suite maps importances through."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.core.logging import MetricsLogger
from multimodal_eeg_fmri_tpu.ops.schedules import (
    EarlyStopping,
    ReduceLROnPlateau,
    warmup_cosine_schedule,
)
from multimodal_eeg_fmri_tpu.xai.montage import (
    CHANNEL_NAMES_18,
    CHANNEL_POSITIONS,
    REGION_GROUPS,
    channel_region,
    default_channel_names,
    pair_names,
)


# --- schedules ------------------------------------------------------------

def test_warmup_cosine_shape():
    sched = warmup_cosine_schedule(1e-3, warmup_epochs=5, total_epochs=50)
    lrs = np.asarray([float(sched(e)) for e in range(50)])
    # ramp up through warmup, peak at its end, decay to ~min_lr
    assert np.all(np.diff(lrs[:5]) > 0)
    assert lrs[5] == pytest.approx(1e-3, rel=1e-6)
    assert np.all(np.diff(lrs[6:]) < 0)
    assert lrs[-1] < 1e-4


def test_warmup_cosine_matches_in_fit_scale():
    """The host schedule and the compiled fit's `_cosine_scale` implement
    the same curve (same warmup ramp and cosine floor)."""
    from multimodal_eeg_fmri_tpu.train.fit import _cosine_scale

    cfg = TrainConfig(learning_rate=1e-3, warmup_epochs=5, num_epochs=50,
                      min_lr=1e-6, schedule="warmup_cosine")
    fit_lrs = np.asarray([
        float(_cosine_scale(cfg, jnp.asarray(e))) * cfg.learning_rate
        for e in range(50)
    ])
    # same qualitative curve, same endpoints
    assert fit_lrs[4] == pytest.approx(1e-3, rel=1e-6)   # end of warmup
    assert fit_lrs[0] == pytest.approx(1e-3 / 5, rel=1e-6)
    assert fit_lrs[-1] == pytest.approx(1e-6, abs=1e-7)
    assert np.all(np.diff(fit_lrs[5:]) <= 0)


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")

    losses = [1.0, 0.9, 0.9, 0.9, 0.91, 0.89, 0.89, 0.89, 0.9, 0.9, 0.9,
              0.88, 0.95, 0.95, 0.95, 0.95]
    ours = ReduceLROnPlateau(factor=0.5, patience=2, threshold=1e-4)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, threshold=1e-4,
        threshold_mode="abs")
    for loss in losses:
        scale = ours.step(loss)
        ref.step(loss)
        assert scale == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9), \
            f"diverged at loss={loss}"


def test_early_stopping_policy():
    es = EarlyStopping(patience=3, min_delta=1e-3, mode="max")
    scores = [0.5, 0.6, 0.6, 0.6, 0.6]
    stops = [es(s) for s in scores]
    assert stops == [False, False, False, False, True]
    # improvement resets the counter
    es2 = EarlyStopping(patience=2, min_delta=1e-3, mode="max")
    assert [es2(s) for s in [0.5, 0.5, 0.6, 0.6, 0.6]] == [
        False, False, False, False, True]


# --- MetricsLogger --------------------------------------------------------

def test_metrics_logger_roundtrip(tmp_path):
    import csv
    import json

    ml = MetricsLogger()
    ml.log(0, loss=1.0, f1=0.5)
    ml.log(1, loss=0.8, f1=0.6)
    assert ml.latest("loss") == 0.8
    assert ml.series("f1") == [(0, 0.5), (1, 0.6)]
    assert np.isnan(ml.latest("missing"))

    jl = tmp_path / "m.jsonl"
    ml.to_jsonl(jl)
    rows = [json.loads(line) for line in jl.read_text().splitlines()]
    assert {(r["tag"], r["step"], r["value"]) for r in rows} == {
        ("loss", 0, 1.0), ("loss", 1, 0.8), ("f1", 0, 0.5), ("f1", 1, 0.6)}

    cv = tmp_path / "m.csv"
    ml.to_csv(cv)
    with open(cv) as f:
        got = list(csv.DictReader(f))
    loss_rows = [r for r in got if r["tag"] == "loss"]
    assert [float(r["value"]) for r in loss_rows] == [1.0, 0.8]


def test_metrics_logger_tensorboard_export(tmp_path):
    """Events written by to_tensorboard must read back with tensorboard's
    own loader: same tags, steps, and values."""
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    ml = MetricsLogger()
    ml.log(0, loss=1.0, f1=0.5)
    ml.log(1, loss=0.8, f1=0.6)
    out = ml.to_tensorboard(tmp_path / "tb")
    assert out is not None
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1

    got = set()
    for ev in EventFileLoader(str(files[0])).Load():
        for val in ev.summary.value:
            # the loader's data_compat pass migrates simple_value into a
            # rank-0 tensor proto; accept either representation
            x = (val.tensor.float_val[0] if val.tensor.float_val
                 else val.simple_value)
            got.add((val.tag, ev.step, round(x, 6)))
    assert got == {("loss", 0, 1.0), ("loss", 1, 0.8),
                   ("f1", 0, 0.5), ("f1", 1, 0.6)}


# --- montage --------------------------------------------------------------

def test_montage_tables_consistent():
    assert len(CHANNEL_NAMES_18) == 18 and "Cz" not in CHANNEL_NAMES_18
    # every named channel has a position and a region
    for name in CHANNEL_NAMES_18:
        assert name in CHANNEL_POSITIONS
        assert channel_region(name) is not None
    # regions partition without overlap (over the 18-channel montage)
    seen = [c for group in REGION_GROUPS.values() for c in group
            if c in CHANNEL_NAMES_18]
    assert sorted(seen) == sorted(CHANNEL_NAMES_18)


def test_pair_names_matches_conn_dim():
    pairs = pair_names(CHANNEL_NAMES_18)
    assert len(pairs) == 18 * 17 // 2 == 153
    # reference CONN feature dim = 3 metrics x C(18,2) = 459 (SURVEY §0)
    assert 3 * len(pairs) == 459
    assert pairs[0] == ("Fp1", "Fp2")


def test_default_channel_names_fallback():
    assert default_channel_names(18) == CHANNEL_NAMES_18
    assert default_channel_names(7) == [f"Ch{i}" for i in range(1, 8)]
