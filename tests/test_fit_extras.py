"""Gradient accumulation + EMA (train/fit.py round-4 additions).

Exactness claims are tested against the framework's OWN non-accumulated /
non-averaged paths — not against tolerances loose enough to hide bugs:

- ``grad_accum=k`` must reproduce ``grad_accum=1`` on a LayerNorm-only
  model with dropout 0: the weighted-mean losses (ops/losses.py) decompose
  as Σ ŵ_k·L_k / Σ w_k, so microbatch backward passes recombined with the
  loss's own weight sums give the identical gradient up to f32 summation
  order. Nonuniform sample weights + class weights are exercised so the
  naive mean-of-means shortcut would fail loudly. The model is
  ``LongContextClassifier`` (the memory-bound family grad_accum exists
  for) — the bridge/EEG nets are unusable as exactness oracles because
  ``LearnedFusion``'s gate carries the reference's fixed 0.2 dropout
  (fusion.py:59), whose mask is batch-shape-dependent at train time.
- EMA must satisfy its defining recurrence ema_k = d·ema_{k-1} +
  (1-d)·params_k step for step (captured via bit-exact ``resume_carry``
  chaining), and model selection must return the EMA snapshot at
  ``best_epoch``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import (
    balanced_class_weights,
    pad_rows,
    subset,
)
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet, LongContextClassifier
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


def _long_fold(n_train=16, n_eval=8, T=64, C=4, seed=3):
    """Separable long-sequence fold with NONUNIFORM sample weights (two
    padding rows + per-row weights) so per-microbatch weight sums differ."""
    r = np.random.default_rng(seed)
    n = n_train + n_eval
    y = (np.arange(n) % 2).astype(np.int64)
    x = r.standard_normal((n, T, C)).astype(np.float32)
    drift = np.sin(np.linspace(0, 6 * np.pi, T))[None, :, None]
    x += 0.4 * (y * 2 - 1)[:, None, None] * drift
    data = {"erp": x, "label": y, "weight": np.ones((n,), np.float32)}
    train = subset(data, np.arange(n_train))
    train["weight"] = np.linspace(0.4, 1.6, n_train).astype(np.float32)
    train = pad_rows(train, n_train + 2)  # two weight-0 padding rows
    ev = pad_rows(subset(data, np.arange(n_train, n)), n_eval)
    cw = balanced_class_weights(train["label"], weights=train["weight"])
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return dev(train), {"val": dev(ev)}, jnp.asarray(cw)


def _bridge_fold(n_train=16, n_eval=8, pad_to=16):
    data = synthetic_bridge(n_subjects=n_train + n_eval, separation=1.0,
                            seed=3)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(n_train)), pad_to)
    ev = pad_rows(subset(data, np.arange(n_train, n_train + n_eval)), 12)
    cw = balanced_class_weights(train["label"], weights=train["weight"])
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return dev(train), {"val": dev(ev)}, jnp.asarray(cw)


def _fit_long(cfg, train, evals, cw, *, seed=0):
    model = LongContextClassifier(hidden_dim=32, num_layers=1, num_heads=4,
                                  dropout=0.0)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    return fit(jax.random.key(seed), train, evals, cw)


@pytest.mark.parametrize("accum", [2, 3, 6])
def test_grad_accum_matches_full_batch(accum):
    train, evals, cw = _long_fold()
    base = dict(batch_size=6, num_epochs=6, learning_rate=1e-3,
                schedule="constant", loss="weighted_ce", selection="val",
                patience=100)
    ref = _fit_long(TrainConfig(**base), train, evals, cw)
    got = _fit_long(TrainConfig(**base, grad_accum=accum), train, evals,
                    cw)

    # Loss/metric histories agree to f32 noise at EVERY epoch (measured
    # 6e-8 over 8 epochs) — each epoch's loss is computed from params
    # evolved through all previous accumulated steps, so this pins the
    # gradients themselves. Params get a looser bound: Adam's first-step
    # update is ≈ lr·sign(g), and sign() amplifies a 5e-8 summation-order
    # difference on a near-zero gradient coordinate to O(lr) — true for
    # ANY reassociated accumulation, not a defect of this one (the drifted
    # coordinates are flat directions; the loss histories above prove it).
    for k in ref.history:
        np.testing.assert_allclose(
            np.asarray(got.history[k]), np.asarray(ref.history[k]),
            rtol=1e-4, atol=5e-6,
            err_msg=f"history[{k!r}] diverged under grad_accum={accum}")
    ref_leaves = jax.tree_util.tree_leaves(ref.final_params)
    got_leaves = jax.tree_util.tree_leaves(got.final_params)
    for r, g in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-2, atol=3e-3)


def test_grad_accum_must_divide_batch():
    train, evals, cw = _long_fold()
    cfg = TrainConfig(batch_size=8, num_epochs=1, schedule="constant",
                      grad_accum=3, selection="val", patience=100)
    with pytest.raises(ValueError, match="grad_accum"):
        _fit_long(cfg, train, evals, cw)


def test_ema_recurrence_and_selection():
    d = 0.6
    train, evals, cw = _bridge_fold()
    base = dict(batch_size=16, num_epochs=1, learning_rate=2e-3,
                schedule="constant", loss="weighted_ce", selection="val",
                patience=100, min_delta=0.0, ema_decay=d)

    # one optimizer step per epoch → chain 4 single-epoch runs (bit-exact
    # resume) and capture the raw/EMA params after every step
    model = BridgeFusionNet(bridge_dim=32, dropout=0.0)
    fit = jax.jit(make_fit_fn(model, TrainConfig(**base), eval_names=("val",)))
    carry = None
    raws, emas = [], []
    for _ in range(4):
        res = fit(jax.random.key(0), train, evals, cw, None, carry)
        carry = res.carry
        raws.append(jax.tree_util.tree_map(np.asarray, carry.params))
        emas.append(jax.tree_util.tree_map(np.asarray, carry.ema_params))

    # ema_0 starts at init params; after step k: ema_k = d·ema_{k-1} +
    # (1-d)·raw_k. Verify the recurrence for k ≥ 1 from the captured trace.
    for k in range(1, 4):
        want = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, emas[k - 1], raws[k])
        for w, g in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(emas[k])):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)
        # EMA must lag the raw trajectory, not equal it
        flat_r = np.concatenate([x.ravel() for x in
                                 jax.tree_util.tree_leaves(raws[k])])
        flat_e = np.concatenate([x.ravel() for x in
                                 jax.tree_util.tree_leaves(emas[k])])
        assert not np.allclose(flat_r, flat_e)

    # model selection must return the EMA snapshot at best_epoch:
    # best_params is written from eval_params (= the EMA) at the improving
    # epoch, so within this chain the match is EXACT. (A single 4-epoch run
    # is not compared bit-for-bit here: a length-4 scan compiles to a
    # different f32 reassociation than 4 length-1 scans, and Adam's
    # sign-like first-step update amplifies that to ~1e-4 — same mechanism
    # the grad_accum test documents.)
    b = int(carry.best_epoch)
    assert 0 <= b < 4
    for w, g in zip(jax.tree_util.tree_leaves(emas[b]),
                    jax.tree_util.tree_leaves(carry.best_params)):
        np.testing.assert_array_equal(np.asarray(g), w)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_grad_accum_ema_compose_with_fold_mesh():
    """grad_accum + EMA inside the manual-SPMD fold axis: the microbatch
    scan and the EMA update run under shard_map(vmap(fit)) and must match
    the unsharded run fold-for-fold (same splits, same rngs)."""
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh
    from multimodal_eeg_fmri_tpu.train.cv import eeg_kfold_splits, run_cv

    plan = build_mesh(jax.devices()[:4], ensemble=4, data=1)
    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=2.0, seed=5)
    cfg = TrainConfig(batch_size=4, num_epochs=3, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100,
                      grad_accum=2, ema_decay=0.9)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    splits = eeg_kfold_splits(data, cfg, n_splits=4)
    res_sh = run_cv(model, cfg, data, splits,
                    normalize_keys=("erp", "pw", "conn"), mesh_plan=plan)
    res_ref = run_cv(model, cfg, data, splits,
                     normalize_keys=("erp", "pw", "conn"))
    for k in ("accuracy", "f1"):
        np.testing.assert_allclose(
            np.asarray(res_sh.fold_metrics[k]),
            np.asarray(res_ref.fold_metrics[k]), atol=1e-5,
            err_msg=f"sharded grad_accum+EMA fold {k} != unsharded")


def test_ema_with_batchnorm_selection_contract():
    """EMA × BatchNorm (the contract train/fit.py documents): the EMA
    covers PARAMS ONLY; selection pairs the EMA weight snapshot with the
    RAW running batch_stats of the same epoch. Trains the BN-heavy V4
    flagship with ema_decay>0 and pins:

    (a) the model actually carries batch_stats (this test means nothing
        on a BN-free model),
    (b) FitResult.params is the EMA (lags the raw trajectory) while
        FitResult.batch_stats tracks the raw running stats,
    (c) the recorded best selection metric is bit-reproducible from
        exactly that (EMA params, raw stats) pair — i.e. selection on a
        BN model evaluated what it says it evaluated.
    """
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4
    from multimodal_eeg_fmri_tpu.report.metrics import (
        binary_classification_metrics,
    )

    data = synthetic_eeg_trimodal(n_subjects=24, time_steps=32,
                                  erp_channels=6, pw_channels=8,
                                  conn_features=20, separation=2.0, seed=7)
    data.pop("subject")
    data["weight"] = np.ones(24, np.float32)
    train = subset(data, np.arange(16))
    ev = subset(data, np.arange(16, 24))
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    train, evals = dev(train), {"val": dev(ev)}

    model = TriModalFusionNetV4(hidden_dim=16, dropout=0.0)
    cfg = TrainConfig(batch_size=8, num_epochs=5, learning_rate=2e-3,
                      schedule="constant", selection="val", patience=100,
                      ema_decay=0.8)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    res = fit(jax.random.key(0), train, evals, None)

    # (a) BN-heavy: running stats exist and were actually updated
    bs_leaves = jax.tree_util.tree_leaves(res.batch_stats)
    assert bs_leaves, "V4 must carry batch_stats for this test to bite"
    assert int(res.best_epoch) >= 0
    assert np.isfinite(float(res.best_metric))

    # (b) returned params are the EMA snapshot, not the raw weights
    flat = lambda t: np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(t)])
    assert not np.allclose(flat(res.carry.params),
                           flat(res.carry.ema_params))
    # batch_stats carry NO ema twin anywhere in the result
    assert not any("ema" in str(p).lower() for p in
                   jax.tree_util.tree_leaves_with_path(res.batch_stats)
                   for p in (p[0],))

    # (c) best_metric reproduces EXACTLY from (EMA params, raw stats):
    # best_params/best_batch_stats were written at the improving epoch from
    # eval_params=EMA and the running stats — the same pair we re-apply here
    out = model.apply({"params": res.params, "batch_stats": res.batch_stats},
                      erp=evals["val"]["erp"], pw=evals["val"]["pw"],
                      conn=evals["val"]["conn"], train=False)
    m = binary_classification_metrics(out.logits, evals["val"]["label"],
                                      evals["val"].get("weight"))
    np.testing.assert_allclose(float(m["f1"]), float(res.best_metric),
                               rtol=0, atol=0)


def test_ema_off_keeps_raw_selection():
    train, evals, cw = _bridge_fold()
    cfg = TrainConfig(batch_size=8, num_epochs=3, schedule="constant",
                      selection="val", patience=100)
    model = BridgeFusionNet(bridge_dim=32, dropout=0.0)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
    res = fit(jax.random.key(0), train, evals, cw)
    assert res.carry.ema_params == ()
