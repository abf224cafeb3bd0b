"""FSDP / ZeRO-3 (parallel/fsdp.py): parameter + gradient + optimizer-state
sharding over the ``data`` axis, expressed as GSPMD annotations.

Checks, on the 8-virtual-device CPU mesh:
- the shape-driven specs shard every large kernel, keep small
  biases/norms replicated, and compose with (don't overwrite) TP specs;
- a full compiled training run (make_fit_fn(param_sharding=
  fsdp_param_constraint(...))) matches the unsharded run's first-epoch
  loss/metrics exactly and proceeds multi-epoch;
- the layout is REAL ZeRO: the compiled HLO all-gathers params and the
  carried optimizer state comes back actually sharded over ``data``;
- FSDP×TP on a (data, model) mesh trains and matches unsharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4
from multimodal_eeg_fmri_tpu.parallel.fsdp import (
    fsdp_param_constraint,
    fsdp_param_specs,
    fsdp_spec,
)
from multimodal_eeg_fmri_tpu.parallel.tensor import tp_param_specs
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _model_and_params(hidden=32):
    model = TriModalFusionNetV4(hidden_dim=hidden, num_transformer_layers=1,
                                num_heads=4, dropout=0.0)
    B, T = 8, 32
    r = np.random.default_rng(0)
    erp = jnp.asarray(r.normal(size=(B, T, 18)), jnp.float32)
    pw = jnp.asarray(r.normal(size=(B, T, 75)), jnp.float32)
    conn = jnp.asarray(r.normal(size=(B, 459)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        erp=erp, pw=pw, conn=conn, train=False,
    )
    return model, variables["params"]


def test_fsdp_spec_picks_largest_free_divisible_dim():
    assert fsdp_spec((64, 128), 8, min_size=1) == P(None, "data")
    assert fsdp_spec((256, 128), 8, min_size=1) == P("data", None)
    # non-divisible largest dim → next candidate
    assert fsdp_spec((257, 128), 8, min_size=1) == P(None, "data")
    # nothing divisible → replicated
    assert fsdp_spec((7, 13), 8, min_size=1) == P()
    # too small → untouched
    assert fsdp_spec((8, 8), 8) == P()
    # base (TP) spec is extended on a FREE dim, never overwritten
    assert fsdp_spec((64, 128), 8, base=P(None, "model"),
                     min_size=1) == P("data", "model")
    # base fully occupies → returned as-is
    assert fsdp_spec((64, 128), 8, base=P("model", "data"),
                     min_size=1) == P("model", "data")


def test_fsdp_param_specs_cover_kernels_not_biases():
    from flax import traverse_util

    _, params = _model_and_params()
    specs = traverse_util.flatten_dict(fsdp_param_specs(params, n_shard=8))
    flat = traverse_util.flatten_dict(params)
    n_sharded = 0
    for path, spec in specs.items():
        leaf = flat[path]
        if spec != P():
            n_sharded += 1
            assert "data" in jax.tree_util.tree_leaves(tuple(spec)), path
            assert leaf.size >= 2 ** 11, (path, leaf.shape)
    # the bulk of the parameter COUNT must be sharded
    total = sum(l.size for l in flat.values())
    sharded = sum(flat[p].size for p, s in specs.items() if s != P())
    assert sharded / total > 0.8, sharded / total
    assert n_sharded >= 10


def test_fsdp_composes_with_tp_specs():
    from flax import traverse_util

    _, params = _model_and_params()
    tp = tp_param_specs(params, n_model=4)
    both = traverse_util.flatten_dict(
        fsdp_param_specs(params, n_shard=2, base=tp))
    tp_flat = traverse_util.flatten_dict(tp)
    saw_2d = False
    for path, spec in both.items():
        axes = [a for a in tuple(spec) if a is not None]
        # the TP placement survives verbatim
        if tp_flat[path] != P():
            assert "model" in axes, path
        if "model" in axes and "data" in axes:
            saw_2d = True
            assert axes.count("model") == 1 and axes.count("data") == 1
    assert saw_2d  # at least one kernel carries the full 2D layout


def _fsdp_data(mesh):
    data = synthetic_eeg_trimodal(n_subjects=24, time_steps=32,
                                  separation=2.0, seed=5)
    data.pop("subject")
    train = subset(data, np.arange(16))
    val = subset(data, np.arange(16, 24))
    batch_sh = lambda x: NamedSharding(
        mesh, P("data", *([None] * (np.ndim(x) - 1))))
    dev = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sh(x)), t)
    return train, val, dev(train), dev(val)


@needs8
def test_fsdp_training_matches_unsharded_and_shards_opt_state():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    model = TriModalFusionNetV4(hidden_dim=32, num_transformer_layers=1,
                                num_heads=4, dropout=0.0)
    train, val, train_s, val_s = _fsdp_data(mesh)
    rng = jax.random.key(7)

    # (a) ONE epoch of ONE batch: a single fwd+bwd in both regimes must
    # agree to reassociation tolerance (same convention as the TP test —
    # multi-epoch bitwise equality is not the spec under resharding).
    cfg1 = TrainConfig(batch_size=16, num_epochs=1, learning_rate=3e-3,
                       schedule="constant", selection="val", patience=100)
    fit_plain = make_fit_fn(model, cfg1, eval_names=("val",))
    fit_fsdp = make_fit_fn(model, cfg1, eval_names=("val",),
                           param_sharding=fsdp_param_constraint(mesh))
    res_ref = jax.jit(fit_plain)(rng, train, {"val": val}, None)
    jitted = jax.jit(fit_fsdp)
    res_f = jitted(rng, train_s, {"val": val_s}, None)
    for key in ("train_loss", "val_f1", "val_accuracy"):
        np.testing.assert_allclose(
            np.asarray(res_f.history[key]), np.asarray(res_ref.history[key]),
            atol=1e-4, rtol=1e-4, err_msg=key)

    # (b) ZeRO is real, not silent replication:
    # params are gathered on use → HLO contains all-gather
    hlo = jitted.lower(rng, train_s, {"val": val_s},
                       None).compile().as_text()
    assert "all-gather" in hlo
    # and the carried Adam state comes back actually sharded over data
    mu = res_f.carry.opt_state[-1].mu
    sharded_leaves = [
        l for l in jax.tree_util.tree_leaves(mu)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "optimizer state is fully replicated"
    per_dev = sharded_leaves[0].addressable_shards[0].data.size
    assert per_dev * 8 == sharded_leaves[0].size  # 1/8th per device

    # (c) multi-epoch FSDP training proceeds: losses finite and decreasing
    cfg3 = TrainConfig(batch_size=8, num_epochs=6, learning_rate=3e-3,
                       schedule="constant", selection="val", patience=100)
    fit3 = make_fit_fn(model, cfg3, eval_names=("val",),
                       param_sharding=fsdp_param_constraint(mesh))
    losses = np.asarray(jax.jit(fit3)(
        rng, train_s, {"val": val_s}, None).history["train_loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@needs8
def test_fsdp_tp_2d_training_matches_unsharded():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "model"))
    model = TriModalFusionNetV4(hidden_dim=32, num_transformer_layers=1,
                                num_heads=4, dropout=0.0)
    train, val, train_s, val_s = _fsdp_data(mesh)
    rng = jax.random.key(7)
    cfg = TrainConfig(batch_size=16, num_epochs=1, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100)
    res_ref = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))(
        rng, train, {"val": val}, None)
    fit2d = make_fit_fn(
        model, cfg, eval_names=("val",),
        param_sharding=fsdp_param_constraint(mesh, tp=True))
    res_2d = jax.jit(fit2d)(rng, train_s, {"val": val_s}, None)
    for key in ("train_loss", "val_f1", "val_accuracy"):
        np.testing.assert_allclose(
            np.asarray(res_2d.history[key]),
            np.asarray(res_ref.history[key]),
            atol=1e-4, rtol=1e-4, err_msg=key)


@needs8
def test_fsdp_resumable_grad_accum_ema_crash_resume(tmp_path):
    """The production composition — FSDP layout × gradient accumulation ×
    EMA × chunked (async) checkpointing × crash-resume — trains as ONE
    story: the interrupted FSDP run's full history equals the
    uninterrupted UNSHARDED run's, and the post-restore carry actually
    trains sharded (the restored host arrays are re-pinned, not silently
    replicated)."""
    import dataclasses

    from multimodal_eeg_fmri_tpu.train.resilient import (
        fit_resumable,
        latest_chunk,
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    model = TriModalFusionNetV4(hidden_dim=32, num_transformer_layers=1,
                                num_heads=4, dropout=0.0)
    train, val, train_s, val_s = _fsdp_data(mesh)
    rng = jax.random.key(3)
    cfg = TrainConfig(batch_size=16, num_epochs=6, learning_rate=3e-3,
                      schedule="constant", selection="val", patience=100,
                      grad_accum=2, ema_decay=0.9)

    # oracle: uninterrupted, unsharded, synchronous saves
    ref = fit_resumable(model, cfg, rng, train, {"val": val},
                        tmp_path / "ref", chunk_epochs=2)

    # FSDP + async saves, "crashed" after chunk 1 (2 of 3 chunks)
    constraint = fsdp_param_constraint(mesh)
    partial_cfg = dataclasses.replace(cfg, num_epochs=4)
    fit_resumable(model, partial_cfg, rng, train_s, {"val": val_s},
                  tmp_path / "fsdp", chunk_epochs=2, async_save=True,
                  param_sharding=constraint)
    assert latest_chunk(tmp_path / "fsdp") == 1

    res = fit_resumable(model, cfg, rng, train_s, {"val": val_s},
                        tmp_path / "fsdp", chunk_epochs=2, async_save=True,
                        param_sharding=constraint)
    for k in ("train_loss", "val_f1"):
        np.testing.assert_allclose(
            np.asarray(res.history[k]), np.asarray(ref.history[k]),
            rtol=2e-4, atol=2e-5,
            err_msg=f"FSDP crash-resume history[{k!r}] != unsharded oracle")

    # the post-restore chunk really trained sharded: its carried params
    # (restored from disk as host arrays, then re-pinned by make_fit_fn)
    # come back distributed over ``data``
    sharded = [
        l for l in jax.tree_util.tree_leaves(res.carry.params)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded, "post-resume params are fully replicated — the " \
                    "restored carry was not re-pinned"


@needs8
def test_fsdp_composes_with_ep_and_trains_moe():
    """FSDP over ``data`` composed with expert parallelism over ``expert``
    (specs extended, never overwritten) trains the MoE long-context model
    equal to the fully-unsharded run."""
    from multimodal_eeg_fmri_tpu.models import LongContextClassifier
    from multimodal_eeg_fmri_tpu.parallel.expert import (
        build_ep_mesh,
        ep_param_specs,
    )

    ep_plan = build_ep_mesh(jax.devices()[:8], data=2, expert=4)
    mesh = ep_plan.mesh

    def moe_model(m):
        return LongContextClassifier(
            hidden_dim=16, num_layers=1, num_heads=2, dropout=0.0,
            num_experts=4, mesh=m, expert_axis="expert" if m else None)

    r = np.random.default_rng(2)
    y = (np.arange(16) % 2).astype(np.int64)
    x = r.standard_normal((16, 32, 4)).astype(np.float32)
    x += 0.4 * (y * 2 - 1)[:, None, None]
    data = {"erp": x, "label": y, "weight": np.ones(16, np.float32)}
    sh = lambda a: NamedSharding(mesh, P("data", *([None] * (np.ndim(a) - 1))))
    data_s = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh(a)), data)
    cfg = TrainConfig(batch_size=8, num_epochs=2, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)

    def constraint(params):
        base = ep_param_specs(params, 4)
        from flax import traverse_util

        from multimodal_eeg_fmri_tpu.parallel.fsdp import fsdp_param_specs
        specs = traverse_util.flatten_dict(
            fsdp_param_specs(params, n_shard=2, min_size=2 ** 6, base=base))
        flat = traverse_util.flatten_dict(params)
        # EP placements survive; at least one leaf carries the 2D layout
        base_flat = traverse_util.flatten_dict(base)
        two_d = 0
        for path, spec in specs.items():
            axes = [a for a in tuple(spec) if a is not None]
            if base_flat[path] != P():
                assert "expert" in axes, path
            if "expert" in axes and "data" in axes:
                two_d += 1
        assert two_d >= 1, "no leaf carries the EP x FSDP 2D layout"
        return traverse_util.unflatten_dict({
            p: jax.lax.with_sharding_constraint(
                flat[p], NamedSharding(mesh, s))
            for p, s in specs.items()})

    fit_s = make_fit_fn(moe_model(mesh), cfg, eval_names=(),
                        param_sharding=constraint)
    res_s = jax.jit(fit_s)(jax.random.key(0), data_s, {}, None)
    fit_ref = make_fit_fn(moe_model(None), cfg, eval_names=())
    res_ref = jax.jit(fit_ref)(
        jax.random.key(0), jax.tree_util.tree_map(jnp.asarray, data), {},
        None)
    np.testing.assert_allclose(
        np.asarray(res_s.history["train_loss"]),
        np.asarray(res_ref.history["train_loss"]),
        rtol=2e-4, atol=2e-5,
        err_msg="EPxFSDP MoE training != unsharded reference")
