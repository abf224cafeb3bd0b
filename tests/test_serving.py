"""Serving predictor tests: arbitrary request sizes against one compiled
executable, checkpoint loading, fused preprocessing, latency stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.checkpoint import save_checkpoint
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_bridge
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
from multimodal_eeg_fmri_tpu.parallel.mesh import build_mesh
from multimodal_eeg_fmri_tpu.serving import (
    EnsemblePredictor, Predictor, stack_variable_trees)


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


def test_predictor_calibrated(trained):
    """`calibrated` must fit a finite positive T on held-out data, keep
    every argmax decision (temperature is monotone per row), apply
    softmax(z/T) exactly, and not worsen validation NLL."""
    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    labels = np.asarray(data["label"], np.int32)
    val = {"eeg": data["eeg"], "fmri": data["fmri"]}
    pc = p.calibrated(val, labels)
    assert pc.temperature is not None and 0.01 < pc.temperature < 60.0

    raw, cal = p(**val), pc(**val)
    assert np.array_equal(raw.argmax(-1), cal.argmax(-1))
    # exact softmax(z/T) semantics
    logits = np.asarray(model.apply(
        variables, eeg=jnp.asarray(data["eeg"]),
        fmri=jnp.asarray(data["fmri"]), train=False).logits)
    expect = np.asarray(jax.nn.softmax(
        jnp.asarray(logits, jnp.float32) / pc.temperature, -1))
    np.testing.assert_allclose(cal, expect, rtol=2e-4, atol=2e-5)

    def nll(probs):
        return -np.mean(np.log(probs[np.arange(len(labels)), labels] + 1e-9))

    assert nll(cal) <= nll(raw) + 1e-6


@pytest.fixture(scope="module")
def fold_models(trained):
    """Four independently-initialized fold models (the reference's
    best_*_fold{k} checkpoints) + their stacked variable trees."""
    model, _, data = trained
    member_vars = [
        model.init({"params": jax.random.key(i), "dropout": jax.random.key(i)},
                   eeg=jnp.asarray(data["eeg"][:4]),
                   fmri=jnp.asarray(data["fmri"][:4]), train=False)
        for i in range(4)
    ]
    stacked = stack_variable_trees([v["params"] for v in member_vars])
    return model, member_vars, stacked, data


def test_ensemble_matches_sequential_late_fusion(fold_models):
    """Late-fusion mean over K models == mean of K individual predictors."""
    model, member_vars, stacked, data = fold_models
    ens = EnsemblePredictor(model, stacked, batch_size=8)
    probs = ens(eeg=data["eeg"][:11], fmri=data["fmri"][:11])
    assert probs.shape == (11, 2)
    seq = np.mean([
        Predictor(model, v["params"], batch_size=8)(
            eeg=data["eeg"][:11], fmri=data["fmri"][:11])
        for v in member_vars
    ], axis=0)
    np.testing.assert_allclose(probs, seq, rtol=2e-4, atol=2e-5)


def test_ensemble_per_member_and_mesh_sharded(fold_models):
    """reduce='none' returns per-member probs; sharding the member axis over
    the mesh's ensemble dimension changes nothing numerically."""
    model, member_vars, stacked, data = fold_models
    ens = EnsemblePredictor(model, stacked, batch_size=8, reduce="none")
    per_member = ens(eeg=data["eeg"][:10], fmri=data["fmri"][:10])
    assert per_member.shape == (4, 10, 2)
    np.testing.assert_allclose(per_member.sum(-1), 1.0, rtol=1e-5)

    plan = build_mesh(ensemble=4, data=2)  # 8 virtual CPU devices
    sharded = EnsemblePredictor(model, stacked, plan=plan, batch_size=8)
    probs = sharded(eeg=data["eeg"][:10], fmri=data["fmri"][:10])
    np.testing.assert_allclose(probs, per_member.mean(0), rtol=2e-4,
                               atol=2e-5)


def test_ensemble_calibrated(fold_models):
    """Shared-T late fusion: exact mean-softmax(z/T) semantics, val NLL
    not worse than the uncalibrated ensemble."""
    model, member_vars, stacked, data = fold_models
    labels = np.asarray(data["label"], np.int32)
    val = {"eeg": data["eeg"], "fmri": data["fmri"]}
    ens = EnsemblePredictor(model, stacked, batch_size=8)
    cal = ens.calibrated(val, labels)
    assert cal.temperature is not None and 0.01 < cal.temperature < 60.0

    member_logits = np.stack([
        np.asarray(model.apply(v, eeg=jnp.asarray(data["eeg"]),
                               fmri=jnp.asarray(data["fmri"]),
                               train=False).logits)
        for v in member_vars])
    expect = np.asarray(jax.nn.softmax(
        jnp.asarray(member_logits, jnp.float32) / cal.temperature,
        -1)).mean(0)
    np.testing.assert_allclose(cal(**val), expect, rtol=2e-4, atol=2e-5)

    def nll(probs):
        return -np.mean(np.log(probs[np.arange(len(labels)), labels] + 1e-9))

    assert nll(cal(**val)) <= nll(ens(**val)) + 1e-6


def test_ensemble_from_checkpoints(fold_models, tmp_path):
    model, member_vars, stacked, data = fold_models
    paths = []
    for k, v in enumerate(member_vars):
        save_checkpoint(tmp_path / f"fold{k}", v["params"],
                        v.get("batch_stats"))
        paths.append(tmp_path / f"fold{k}")
    ens = EnsemblePredictor.from_checkpoints(model, paths, batch_size=4)
    probs = ens(eeg=data["eeg"][:3], fmri=data["fmri"][:3])
    assert probs.shape == (3, 2)

    bad = stack_variable_trees([member_vars[0]["params"]] * 3)
    with pytest.raises(ValueError, match="not divisible"):
        EnsemblePredictor(model, bad, plan=build_mesh(ensemble=4, data=2))


def test_export_artifact_roundtrip(trained, tmp_path):
    """StableHLO deployment artifact: serialize the compiled forward
    (weights baked in), reload WITHOUT model code/params, outputs equal."""
    from multimodal_eeg_fmri_tpu.serving import load_artifact

    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    example = {"eeg": data["eeg"][:8], "fmri": data["fmri"][:8]}
    path = tmp_path / "bridge.stablehlo"
    blob = p.export_artifact(example, str(path))
    assert path.stat().st_size == len(blob) > 1000

    served = load_artifact(str(path))
    got = served(eeg=jnp.asarray(example["eeg"]),
                 fmri=jnp.asarray(example["fmri"]))
    want = p(**example)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ensemble_export_artifact_roundtrip(fold_models, tmp_path):
    """The whole K-model late-fusion ensemble ships as ONE StableHLO
    artifact and reproduces the live sharded predictor."""
    from multimodal_eeg_fmri_tpu.serving import load_artifact

    model, _, stacked, data = fold_models
    ens = EnsemblePredictor(model, stacked, batch_size=8)
    example = {"eeg": data["eeg"][:8], "fmri": data["fmri"][:8]}
    path = tmp_path / "ensemble.stablehlo"
    ens.export_artifact(example, str(path))

    served = load_artifact(str(path))
    got = served(eeg=jnp.asarray(example["eeg"]),
                 fmri=jnp.asarray(example["fmri"]))
    want = ens(**example)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dynamic_batcher_coalesces_concurrent_requests(trained):
    """32 concurrent single-row requests come back row-exact vs the direct
    predictor AND are served in far fewer device calls than requests."""
    import threading

    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    want = p(eeg=data["eeg"], fmri=data["fmri"])
    # warm the compile BEFORE timing-sensitive concurrency
    n = len(data["eeg"])
    results = [None] * n
    with DynamicBatcher(p, max_delay_ms=50.0, max_batch=8) as b:
        def one(i):
            results[i] = b(eeg=data["eeg"][i:i + 1],
                           fmri=data["fmri"][i:i + 1])

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batches, rows = b.batches, b.rows
    assert rows == n
    assert batches < n, (batches, n)  # coalescing actually happened
    got = np.concatenate(results, axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dynamic_batcher_multirow_and_deadline(trained):
    """A single request (no peers) flushes on the deadline, with any row
    count, and matches the direct predictor."""
    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    with DynamicBatcher(p, max_delay_ms=1.0) as b:
        got = b(eeg=data["eeg"][:5], fmri=data["fmri"][:5])
    np.testing.assert_allclose(
        got, p(eeg=data["eeg"][:5], fmri=data["fmri"][:5]),
        rtol=2e-4, atol=2e-5)
    assert got.shape == (5, 2)


def test_dynamic_batcher_error_delivery_and_close(trained):
    """A failing underlying call raises in the CALLER (worker survives for
    the next request); calls after close() raise."""
    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    model, variables, data = trained
    p = Predictor(model, variables["params"], variables.get("batch_stats"),
                  batch_size=8)
    b = DynamicBatcher(p, max_delay_ms=1.0)
    with pytest.raises(Exception):
        b(eeg=data["eeg"][:1])  # missing fmri → model.apply raises
    # worker is still alive and serves the next, valid request
    out = b(eeg=data["eeg"][:1], fmri=data["fmri"][:1])
    assert out.shape == (1, 2)
    b.close()
    b.close()  # idempotent
    with pytest.raises(RuntimeError):
        b(eeg=data["eeg"][:1], fmri=data["fmri"][:1])


def test_dynamic_batcher_rejects_nonleading_batch_axis(fold_models):
    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    model, _, stacked, _ = fold_models
    ens = EnsemblePredictor(model, stacked, batch_size=8, reduce="none")
    with pytest.raises(ValueError):
        DynamicBatcher(ens)


def test_dynamic_batcher_wraps_reducing_ensemble(fold_models):
    """The batcher serves a reducing (mean) K-model ensemble: concurrent
    rows equal the direct ensemble output."""
    import threading

    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    model, _, stacked, data = fold_models
    ens = EnsemblePredictor(model, stacked, batch_size=8)
    want = ens(eeg=data["eeg"][:8], fmri=data["fmri"][:8])
    results = [None] * 8
    with DynamicBatcher(ens, max_delay_ms=50.0, max_batch=8) as b:
        threads = [
            threading.Thread(target=lambda i=i: results.__setitem__(
                i, b(eeg=data["eeg"][i:i + 1], fmri=data["fmri"][i:i + 1])))
            for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    np.testing.assert_allclose(np.concatenate(results), want,
                               rtol=2e-4, atol=2e-5)


def test_ensemble_from_quantized(fold_models, tmp_path):
    """K int8 weight-only payloads serve in ONE vmapped ensemble forward
    with the same bounded-drift + identical-argmax contract as the
    single-model quantized predictor."""
    from multimodal_eeg_fmri_tpu.core.quantize import save_quantized

    model, member_vars, stacked, data = fold_models
    paths = []
    for k, v in enumerate(member_vars):
        payload = {"params": jax.tree_util.tree_map(np.asarray, v["params"])}
        if v.get("batch_stats"):
            payload["batch_stats"] = jax.tree_util.tree_map(
                np.asarray, v["batch_stats"])
        paths.append(save_quantized(tmp_path / f"fold{k}_q", payload))

    ens_ref = EnsemblePredictor(model, stacked, batch_size=8)
    ens_q = EnsemblePredictor.from_quantized(model, paths, batch_size=8)
    assert ens_q.n_members == 4
    x = {"eeg": data["eeg"][:11], "fmri": data["fmri"][:11]}
    probs_ref, probs_q = ens_ref(**x), ens_q(**x)
    assert probs_q.shape == (11, 2)
    assert np.max(np.abs(probs_q - probs_ref)) < 0.05
    np.testing.assert_array_equal(probs_q.argmax(-1), probs_ref.argmax(-1))


def test_dynamic_batcher_backpressure_rejects_overload():
    """Enqueue rate >> flush rate with a bounded queue: pending rows never
    exceed max_queue (memory bounded), overflow callers get QueueFull
    immediately, accepted callers still get correct results."""
    import threading
    import time as _time

    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher, QueueFull

    max_queue = 4

    def slow_predict(**inputs):
        _time.sleep(0.05)  # device far slower than the request burst
        return np.asarray(inputs["x"]) * 2.0

    served, rejected = [], []
    lock = threading.Lock()
    with DynamicBatcher(slow_predict, max_delay_ms=1.0, max_batch=4,
                        max_queue=max_queue) as b:
        def one(i):
            try:
                out = b(x=np.asarray([[float(i)]]))
                with lock:
                    served.append((i, out))
            except QueueFull:
                with lock:
                    rejected.append(i)
            # observable bound: the queue can never hold more than
            # max_queue rows, whatever the burst size
            with b._cv:
                assert sum(r.n for _, r in b._queue) <= max_queue

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        n_rejected = b.rejected
    assert len(served) + len(rejected) == 32
    assert len(rejected) > 0 and n_rejected == len(rejected)
    assert len(served) >= 1  # the queue kept draining under overload
    for i, out in served:
        np.testing.assert_allclose(out, [[2.0 * i]])


def test_dynamic_batcher_timeout_unsticks_wedged_device():
    """A wedged predictor (the half-up tunnel mode) must not strand
    callers: with timeout_s they raise TimeoutError promptly, and a
    request still queued at timeout is withdrawn from the queue."""
    import threading
    import time as _time

    from multimodal_eeg_fmri_tpu.serving import DynamicBatcher

    release = threading.Event()

    def wedged_predict(**inputs):
        release.wait()  # simulates a device call that never returns
        return np.asarray(inputs["x"])

    b = DynamicBatcher(wedged_predict, max_delay_ms=1.0, max_batch=2,
                       timeout_s=0.2)
    try:
        t0 = _time.perf_counter()
        with pytest.raises(TimeoutError, match="timed out"):
            b(x=np.zeros((1, 1), np.float32))
        assert _time.perf_counter() - t0 < 2.0  # prompt, not wedged
        # a second caller times out while the worker is still stuck on the
        # first batch — its request is withdrawn, the queue stays empty
        with pytest.raises(TimeoutError):
            b(x=np.zeros((1, 1), np.float32))
        with b._cv:
            assert not b._queue
    finally:
        release.set()
        b.close()


def test_ensemble_vote_reduce(fold_models):
    """reduce='vote' = per-class majority-vote fractions: argmax equals
    the members' majority vote (reference LOSO §31 semantics) and rows
    still sum to 1."""
    model, _, stacked, data = fold_models
    ens_none = EnsemblePredictor(model, stacked, batch_size=8,
                                 reduce="none")
    ens_vote = EnsemblePredictor(model, stacked, batch_size=8,
                                 reduce="vote")
    x = {"eeg": data["eeg"][:8], "fmri": data["fmri"][:8]}
    per_member = ens_none(**x)                      # (K, n, C)
    frac = ens_vote(**x)                            # (n, C)
    K = per_member.shape[0]
    member_votes = per_member.argmax(-1)            # (K, n)
    want = np.stack([(member_votes == c).mean(0)
                     for c in range(per_member.shape[-1])], axis=-1)
    np.testing.assert_allclose(frac, want, atol=1e-6)
    np.testing.assert_allclose(frac.sum(-1), 1.0, atol=1e-6)
    assert K == 4
