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


def test_checkpoint_resume_bit_exact(tmp_path):
    """save → load → continue must equal uninterrupted training bit-exactly:
    optimizer moments, rng stream, plateau controller and early-stop
    counters all survive the round-trip (the reference restores
    model+optimizer+scheduler)."""
    data = synthetic_bridge(n_subjects=12, separation=1.0, seed=3)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    cfg = TrainConfig(batch_size=4, num_epochs=6, learning_rate=2e-3,
                      schedule="plateau", patience=100)

    def make():
        return Trainer(BridgeFusionNet(bridge_dim=16), cfg)

    # uninterrupted: 6 epochs
    tr_full = make()
    losses_full = [tr_full.train_one_epoch(train) for _ in range(6)]

    # interrupted: 3 epochs, save, fresh trainer, load, 3 more
    tr_a = make()
    losses_a = [tr_a.train_one_epoch(train) for _ in range(3)]
    tr_a.save_checkpoint(tmp_path / "resume_ck")

    tr_b = make()
    tr_b.load_checkpoint(tmp_path / "resume_ck", train_data=train)
    assert tr_b.epoch == 3
    losses_b = [tr_b.train_one_epoch(train) for _ in range(3)]

    np.testing.assert_array_equal(losses_a + losses_b, losses_full)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tr_b.params, tr_full.params)


def test_trainer_warmup_cosine_matches_compiled_fit():
    """A ``warmup_cosine`` schedule through the imperative Trainer must
    produce the SAME loss history as the compiled multi-epoch fit —
    epoch-for-epoch, bit-exact (the host-side ``_host_lr_scale`` mirrors
    train/fit.py's in-graph ``_cosine_scale``). Guards the round-2 hole
    where the Trainer silently trained at constant LR."""
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

    data = synthetic_bridge(n_subjects=12, separation=1.0, seed=5)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(12)), 12)
    cfg = TrainConfig(batch_size=4, num_epochs=6, learning_rate=2e-3,
                      schedule="warmup_cosine", warmup_epochs=2,
                      patience=100, selection="train_loss")

    fit = jax.jit(make_fit_fn(BridgeFusionNet(bridge_dim=16), cfg,
                              eval_names=()))
    rng = jax.random.key(cfg.seed)
    res = fit(rng, jax.tree_util.tree_map(jnp.asarray, train), {}, None)
    compiled_losses = np.asarray(res.history["train_loss"])
    compiled_scales = np.asarray(res.history["lr_scale"])
    # the schedule must actually vary (warmup then cosine decay)
    assert len(set(np.round(compiled_scales, 6))) > 2

    tr = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    host_scales, losses = [], []
    for _ in range(6):
        host_scales.append(tr._host_lr_scale())
        losses.append(tr.train_one_epoch(train))
    # the host-side schedule must reproduce the in-graph one exactly...
    np.testing.assert_allclose(host_scales, compiled_scales, rtol=1e-6)
    # ...and the resulting training trajectory must agree (not bit-exact:
    # the one-epoch jit takes lr_scale as a runtime carry value while the
    # multi-epoch fit constant-folds the cosine in-graph — 1-ulp scale
    # differences compound into ~1e-7 loss differences)
    np.testing.assert_allclose(losses, compiled_losses, rtol=1e-5)


def test_trainer_rejects_unknown_schedule():
    data = synthetic_bridge(n_subjects=8, separation=1.0, seed=6)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(8)), 8)
    cfg = TrainConfig(batch_size=4, num_epochs=1, schedule="exotic")
    tr = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    with pytest.raises(ValueError, match="schedule"):
        tr.train_one_epoch(train)


def test_load_checkpoint_before_training(tmp_path):
    """load_checkpoint must work on a freshly-constructed trainer when
    given data to build the state structure."""
    data = synthetic_bridge(n_subjects=8, separation=1.0, seed=4)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(8)), 8)
    cfg = TrainConfig(batch_size=4, num_epochs=2, learning_rate=1e-3,
                      schedule="constant", patience=100)

    tr = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    tr.train_one_epoch(train)
    tr.save_checkpoint(tmp_path / "pre_ck")
    ref = tr.train_one_epoch(train)

    tr2 = Trainer(BridgeFusionNet(bridge_dim=16), cfg)
    tr2.load_checkpoint(tmp_path / "pre_ck", train_data=train)  # no prior fit
    got = tr2.train_one_epoch(train)
    assert got == ref


def test_trainer_ema_schedule_and_checkpoint(tmp_path):
    """EMA through the imperative Trainer (round-4 review finding): a
    warmup_cosine first epoch routes through _init_carry, which must build
    the ema_params slot (a () placeholder is a pytree-structure mismatch
    against the ema-compiled step); eval/selection must use the EMA
    snapshot; and the EMA must survive a checkpoint round-trip so resumed
    training stays bit-exact."""
    data = synthetic_bridge(n_subjects=12, separation=1.5, seed=5)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(8)), 8)
    val = pad_rows(subset(data, np.arange(8, 12)), 4)
    cfg = TrainConfig(batch_size=4, num_epochs=6, learning_rate=2e-3,
                      schedule="warmup_cosine", warmup_epochs=2,
                      patience=100, ema_decay=0.9)

    def make():
        return Trainer(BridgeFusionNet(bridge_dim=16), cfg)

    # the crash path: first epoch at scheduled scale != 1 → _init_carry
    tr_full = make()
    losses_full = [tr_full.train_one_epoch(train) for _ in range(4)]
    assert np.all(np.isfinite(losses_full))

    # eval/selection use the EMA snapshot, not the raw params
    raw = tr_full._carry.params
    ema = tr_full.eval_params
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        raw, ema)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
    tr_full.evaluate(val)
    tr_full.update_best(0.5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr_full.best_state[0], ema)

    # EMA survives save → load → continue bit-exactly
    tr_a = make()
    losses_a = [tr_a.train_one_epoch(train) for _ in range(2)]
    tr_a.save_checkpoint(tmp_path / "ema_ck")
    tr_b = make()
    tr_b.load_checkpoint(tmp_path / "ema_ck", train_data=train)
    losses_b = [tr_b.train_one_epoch(train) for _ in range(2)]
    np.testing.assert_array_equal(losses_a + losses_b, losses_full)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr_b._carry.ema_params, tr_full._carry.ema_params)


def test_trainer_checkpoint_ema_setting_cross_load(tmp_path):
    """A checkpoint saved WITHOUT EMA loads into an EMA-enabled trainer
    (EMA re-seeds from the restored live params) and vice versa — the
    orbax template structure mismatch must not surface (round-4 review:
    the promised fallback was unreachable dead code)."""
    data = synthetic_bridge(n_subjects=8, separation=1.5, seed=6)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(8)), 8)
    base = dict(batch_size=4, num_epochs=4, learning_rate=2e-3,
                schedule="constant", patience=100)

    # save without EMA → load with EMA
    tr0 = Trainer(BridgeFusionNet(bridge_dim=16), TrainConfig(**base))
    tr0.train_one_epoch(train)
    tr0.save_checkpoint(tmp_path / "no_ema")
    tr1 = Trainer(BridgeFusionNet(bridge_dim=16),
                  TrainConfig(**base, ema_decay=0.9))
    tr1.load_checkpoint(tmp_path / "no_ema", train_data=train)
    # EMA seeded from the restored live params
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(tr1._carry.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tr1._carry.params)[0]))
    assert np.isfinite(tr1.train_one_epoch(train))

    # save with EMA → load without EMA (restored EMA tree is dropped)
    tr1.save_checkpoint(tmp_path / "with_ema")
    tr2 = Trainer(BridgeFusionNet(bridge_dim=16), TrainConfig(**base))
    tr2.load_checkpoint(tmp_path / "with_ema", train_data=train)
    assert tr2._carry.ema_params == ()
    assert np.isfinite(tr2.train_one_epoch(train))
