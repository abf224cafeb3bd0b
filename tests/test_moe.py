"""Mixture-of-Experts FFN + expert parallelism (ops/moe.py,
parallel/expert.py).

No reference analogue (the reference has dense FFNs and no parallelism —
SURVEY §2.3); this is the framework's sixth parallelism axis. Checks:

- dense-reduction oracle: with every expert holding IDENTICAL weights and
  capacity ≥ tokens, the MoE layer equals the plain dense FFN exactly for
  ANY routing (gates renormalize to 1) — top-1 and top-2;
- static capacity actually drops: tokens routed past an expert's capacity
  contribute zero from the MoE branch (residual-only, Switch semantics);
- the sown Switch aux loss matches the hand-computed ``E·Σ f·p`` formula;
- on the 8-virtual-device mesh: EP-sharded forward == unsharded forward,
  the compiled program really communicates, and a full compiled training
  run (make_fit_fn + ep_param_constraint) matches the unsharded loss
  history one-epoch-exactly and keeps training multi-epoch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.models import LongContextClassifier
from multimodal_eeg_fmri_tpu.ops.moe import MoEFFN, top_k_routing
from multimodal_eeg_fmri_tpu.parallel.expert import (
    build_ep_mesh,
    ep_param_constraint,
    ep_param_specs,
    shard_params_ep,
)
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _tokens(B=2, T=8, D=16, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.standard_normal((B, T, D)), jnp.float32)


def _tile_experts(params):
    """Copy expert 0's weights into every expert (standalone MoEFFN params:
    w1/b1/w2/b2 live at the module's top level, router nested)."""
    p = dict(params)
    for k in ("w1", "b1", "w2", "b2"):
        p[k] = jnp.broadcast_to(p[k][0][None], p[k].shape)
    return p


@pytest.mark.parametrize("top_k", [1, 2])
def test_identical_experts_reduce_to_dense_ffn(top_k):
    """k ≥ 2: renormalized gates sum to 1 → exactly the dense FFN.
    k = 1: the Switch gate is the RAW router probability (renormalizing a
    single gate would be the constant 1.0, severing the router from the
    task gradient), so the reduction is p_top · dense(x)."""
    x = _tokens()
    B, T, D = x.shape
    E = 4
    moe = MoEFFN(d_model=16, num_experts=E, dim_feedforward=32,
                 top_k=top_k, capacity_factor=float(E))  # capacity = S
    params = moe.init(jax.random.key(0), x)["params"]
    params = _tile_experts(params)
    y = moe.apply({"params": params}, x)

    w1, b1 = params["w1"][0], params["b1"][0]
    w2, b2 = params["w2"][0], params["b2"][0]
    dense = _gelu(x @ w1 + b1) @ w2 + b2
    if top_k == 1:
        xs = np.asarray(x).reshape(-1, D)
        probs = jax.nn.softmax(
            jnp.asarray(xs, jnp.float32) @ params["router"]["kernel"], -1)
        p_top = np.max(np.asarray(probs), -1).reshape(B, T, 1)
        dense = p_top * dense
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


def test_top1_router_receives_task_gradient():
    """Regression (review): with renormalized top-1 gates the router's
    task-loss gradient was identically zero — only the aux loss (which
    pushes toward uniform) trained it. The Switch gate restores it."""
    x = _tokens()
    moe = MoEFFN(d_model=16, num_experts=4, dim_feedforward=32, top_k=1,
                 capacity_factor=4.0)
    params = moe.init(jax.random.key(0), x)["params"]

    def task_loss(p):
        return jnp.sum(moe.apply({"params": p}, x) ** 2)

    g = jax.grad(task_loss)(params)
    assert float(jnp.max(jnp.abs(g["router"]["kernel"]))) > 1e-6


def test_capacity_drops_zero_out_moe_branch():
    """All tokens forced to expert 0 with capacity for only 3: tokens 0-2
    get processed (in index order — the cumsum queue), the rest output 0."""
    S, E, C = 8, 4, 3
    logits = jnp.zeros((S, E), jnp.float32).at[:, 0].set(10.0)
    dispatch, combine, _ = top_k_routing(logits, k=1, capacity=C)
    occupancy = np.asarray(dispatch.sum(axis=(1, 2)))
    np.testing.assert_array_equal(occupancy[:C], 1.0)
    np.testing.assert_array_equal(occupancy[C:], 0.0)
    # slots are exclusive: no (expert, slot) pair holds two tokens
    assert np.max(np.asarray(dispatch.sum(axis=0))) <= 1.0
    # combine weights vanish with the drop
    np.testing.assert_array_equal(np.asarray(combine.sum(axis=(1, 2)))[C:],
                                  0.0)


def test_aux_loss_matches_formula():
    x = _tokens(seed=3)
    E = 4
    moe = MoEFFN(d_model=16, num_experts=E, dim_feedforward=32,
                 capacity_factor=2.0, aux_weight=0.5)
    variables = moe.init(jax.random.key(1), x)
    _, mut = moe.apply(variables, x, train=True, mutable=["losses"])
    (aux,) = mut["losses"]["moe_aux"]

    xs = np.asarray(x).reshape(-1, 16)
    logits = xs @ np.asarray(variables["params"]["router"]["kernel"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    f = np.zeros(E)
    np.add.at(f, probs.argmax(-1), 1.0 / len(xs))
    expected = 0.5 * E * float((f * probs.mean(0)).sum())
    np.testing.assert_allclose(float(aux), expected, rtol=1e-5)


def test_moe_block_trains_single_device():
    """Config-reachable: LongContextClassifier(num_experts=4) trains under
    the compiled fit; the aux loss flows through the 'losses' collection."""
    r = np.random.default_rng(0)
    n, T, C = 16, 32, 4
    y = (np.arange(n) % 2).astype(np.int64)
    x = r.standard_normal((n, T, C)).astype(np.float32)
    x += 0.5 * (y * 2 - 1)[:, None, None]
    data = {"erp": x, "label": y, "weight": np.ones((n,), np.float32)}
    model = LongContextClassifier(hidden_dim=16, num_layers=1, num_heads=2,
                                  dropout=0.0, num_experts=4)
    cfg = TrainConfig(batch_size=8, num_epochs=5, learning_rate=3e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    res = fit(jax.random.key(0),
              jax.tree_util.tree_map(jnp.asarray, data), {}, None)
    losses = np.asarray(res.history["train_loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def _lc_model(mesh=None):
    return LongContextClassifier(
        hidden_dim=32, num_layers=1, num_heads=4, dropout=0.0,
        num_experts=4, moe_top_k=2, mesh=mesh,
        expert_axis="expert" if mesh is not None else None)


def _lc_data(n, T=32, C=4, seed=0):
    r = np.random.default_rng(seed)
    y = (np.arange(n) % 2).astype(np.int64)
    x = r.standard_normal((n, T, C)).astype(np.float32)
    x += 0.4 * (y * 2 - 1)[:, None, None]
    return {"erp": x, "label": y, "weight": np.ones((n,), np.float32)}


@needs8
def test_ep_specs_and_sharded_forward_matches():
    plan = build_ep_mesh(jax.devices()[:8], data=2, expert=4)
    model = _lc_model(mesh=plan.mesh)
    data = _lc_data(8)
    erp = jnp.asarray(data["erp"])
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, erp=erp,
                           train=False)
    params = variables["params"]

    # the rules hit exactly the stacked expert weights
    from flax import traverse_util
    specs = traverse_util.flatten_dict(ep_param_specs(params, 4))
    sharded = {p for p, s in specs.items() if s != P()}
    assert sharded, "no expert params matched"
    for path in sharded:
        assert "moe" in path
    for name in ("w1", "b1", "w2", "b2"):
        assert any(p[-1] == name for p in sharded), name
    assert all(p[-2] != "router" for p in sharded)

    ref_model = _lc_model(mesh=None)
    ref = jax.jit(lambda p, e: ref_model.apply(
        {"params": p}, erp=e, train=False).logits)(params, erp)

    ep_params = shard_params_ep(params, plan)
    erp_s = jax.device_put(
        erp, NamedSharding(plan.mesh, P("data", None, None)))
    fwd = jax.jit(lambda p, e: model.apply(
        {"params": p}, erp=e, train=False).logits)
    got = fwd(ep_params, erp_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # real expert parallelism: the compiled program moves tokens/activations
    hlo = fwd.lower(ep_params, erp_s).compile().as_text()
    assert any(c in hlo for c in
               ("all-to-all", "all-gather", "all-reduce",
                "collective-permute")), "no collectives in EP program"


@needs8
def test_ep_training_matches_unsharded():
    plan = build_ep_mesh(jax.devices()[:8], data=2, expert=4)
    data = _lc_data(16, seed=4)
    train = {k: v[:12] for k, v in data.items()}
    val = {k: v[12:] for k, v in data.items()}
    rng = jax.random.key(7)
    batch_sh = lambda x: NamedSharding(
        plan.mesh, P("data", *([None] * (np.ndim(x) - 1))))
    dev = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), batch_sh(x)), t)

    # (a) one epoch of one batch: sharded == unsharded to float tolerance
    cfg1 = TrainConfig(batch_size=12, num_epochs=1, learning_rate=3e-3,
                       schedule="constant", selection="val", patience=100)
    fit_ref = make_fit_fn(_lc_model(None), cfg1, eval_names=("val",))
    fit_ep = make_fit_fn(_lc_model(plan.mesh), cfg1, eval_names=("val",),
                         param_sharding=ep_param_constraint(plan))
    res_ref = jax.jit(fit_ref)(rng, train, {"val": val}, None)
    res_ep = jax.jit(fit_ep)(rng, dev(train), {"val": dev(val)}, None)
    for key in ("train_loss", "val_f1", "val_accuracy"):
        np.testing.assert_allclose(
            np.asarray(res_ep.history[key]),
            np.asarray(res_ref.history[key]),
            atol=1e-4, rtol=1e-4, err_msg=key)

    # (b) multi-epoch EP training proceeds: finite, decreasing
    cfg3 = TrainConfig(batch_size=4, num_epochs=6, learning_rate=3e-3,
                       schedule="constant", selection="val", patience=100)
    fit_ep3 = make_fit_fn(_lc_model(plan.mesh), cfg3, eval_names=("val",),
                          param_sharding=ep_param_constraint(plan))
    res3 = jax.jit(fit_ep3)(rng, dev(train), {"val": dev(val)}, None)
    losses = np.asarray(res3.history["train_loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@needs8
def test_nondividing_experts_warn_once(caplog, monkeypatch):
    """E not a multiple of the expert-axis size → replicated fallback must
    WARN (once), not silently drop the configured parallelism."""
    import logging

    from multimodal_eeg_fmri_tpu.ops import moe as moe_mod

    # Any earlier test that touched core.logging.get_logger sets
    # propagate=False on the package root logger, which would stop these
    # records short of caplog's root handler — force propagation here so
    # the test is order-independent.
    monkeypatch.setattr(
        logging.getLogger("multimodal_eeg_fmri_tpu"), "propagate", True)

    plan = build_ep_mesh(jax.devices()[:8], data=2, expert=4)
    layer = MoEFFN(d_model=16, num_experts=3, mesh=plan.mesh,
                   expert_axis="expert")
    x = _tokens(D=16)
    variables = layer.init(jax.random.key(0), x)
    moe_mod._REPLICATION_WARNED.clear()
    with caplog.at_level(logging.WARNING, logger="multimodal_eeg_fmri_tpu.ops.moe"):
        out = jax.jit(lambda v, x: layer.apply(v, x))(variables, x)
        np.asarray(out)
    msgs = [r for r in caplog.records if "REPLICATED" in r.message]
    assert msgs, "expected a replication-fallback warning"
    # dense reference: unsharded module, same params
    ref = MoEFFN(d_model=16, num_experts=3)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.apply(variables, x)),
        rtol=1e-5, atol=1e-6)


def test_flagship_v4_trains_with_moe():
    """The flagship TriModalFusionNetV4 with num_experts>0 (VERDICT r3
    next-#8): trains under make_fit_fn (Switch aux loss collected from
    BOTH encoders' blocks), and num_experts=0 keeps the reference-dense
    param tree (golden replay unaffected)."""
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4

    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=1.5, seed=0)
    data.pop("subject")
    cfg = TrainConfig(batch_size=8, num_epochs=3, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    kw = dict(hidden_dim=32, num_transformer_layers=1, num_heads=2,
              dropout=0.0)

    moe_model = TriModalFusionNetV4(num_experts=4, moe_top_k=2, **kw)
    fit = jax.jit(make_fit_fn(moe_model, cfg, eval_names=()))
    dev = jax.tree_util.tree_map(jnp.asarray, data)
    res = fit(jax.random.key(0), dev, {}, None)
    loss = np.asarray(res.history["train_loss"]).ravel()
    assert np.all(np.isfinite(loss)) and loss[-1] < loss[0], loss

    # MoE params exist in both temporal transformers
    p = res.params
    for enc in ("erp_encoder", "pw_encoder"):
        assert "moe" in p[enc]["transformer_0"], p[enc]["transformer_0"].keys()
        assert p[enc]["transformer_0"]["moe"]["w1"].shape[0] == 4

    # the Switch aux loss is sown during training applies
    batch = {k: v[:8] for k, v in dev.items() if k not in ("label", "weight")}
    _, mut = moe_model.apply(
        {"params": res.params, "batch_stats": res.batch_stats}, **batch,
        train=True, rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats", "losses"])
    leaves = jax.tree_util.tree_leaves(mut.get("losses", {}))
    assert len(leaves) == 2, mut.get("losses")  # one per encoder's block

    # experts off == the reference-dense architecture (ffn1/ffn2, no moe)
    dense = TriModalFusionNetV4(num_experts=0, **kw)
    vd = dense.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)},
                    **batch, train=False)
    blk = vd["params"]["erp_encoder"]["transformer_0"]
    assert "ffn1" in blk and "moe" not in blk


@needs8
def test_flagship_v4_moe_ep_sharded_matches_unsharded():
    """Flagship V4 with experts sharded over the expert mesh axis: one
    compiled training epoch equals the identical unsharded run."""
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4

    data = synthetic_eeg_trimodal(n_subjects=16, time_steps=32,
                                  separation=1.5, seed=1)
    data.pop("subject")
    cfg = TrainConfig(batch_size=8, num_epochs=1, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    kw = dict(hidden_dim=32, num_transformer_layers=1, num_heads=2,
              dropout=0.0, num_experts=4, moe_top_k=1)
    plan = build_ep_mesh(jax.devices()[:8], data=2, expert=4)

    dev = jax.tree_util.tree_map(jnp.asarray, data)
    dp = lambda x: NamedSharding(
        plan.mesh, P("data", *([None] * (np.ndim(x) - 1))))
    dev_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dp(x)), dev)

    model_sh = TriModalFusionNetV4(mesh=plan.mesh, expert_axis="expert", **kw)
    fit_sh = jax.jit(make_fit_fn(model_sh, cfg, eval_names=(),
                                 param_sharding=ep_param_constraint(plan)))
    res_sh = fit_sh(jax.random.key(0), dev_sh, {}, None)

    model = TriModalFusionNetV4(**kw)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    res = fit(jax.random.key(0), dev, {}, None)

    np.testing.assert_allclose(
        np.asarray(res_sh.history["train_loss"]),
        np.asarray(res.history["train_loss"]), rtol=2e-4, atol=2e-5,
        err_msg="EP-sharded flagship loss != unsharded")
