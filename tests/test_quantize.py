"""Int8 weight-only quantization (core/quantize.py) + quantized serving.

No reference analogue (raw torch.save state dicts); deployment surface.
Checks: per-channel round-trip error bound, tree pass-through rules,
npz payload ~4× smaller than f32, and a trained flagship model served
from the quantized payload keeps its predictions (bounded logit drift,
zero/near-zero prediction flips on a real task).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.core.quantize import (
    dequantize_tree,
    load_quantized,
    quantize_leaf,
    quantize_tree,
    save_quantized,
)
from multimodal_eeg_fmri_tpu.data.arrays import subset
from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


def test_leaf_roundtrip_error_bound():
    r = np.random.default_rng(0)
    w = (r.standard_normal((64, 32)) * r.uniform(0.01, 10.0, (32,))).astype(
        np.float32)  # per-channel dynamic ranges spanning 3 decades
    q, s = quantize_leaf(w)
    assert q.dtype == np.int8 and s.shape == (32,)
    err = np.abs(q.astype(np.float32) * s - w)
    # symmetric round-to-nearest: |err| <= scale/2 per channel
    assert np.all(err <= s / 2 + 1e-7)
    # per-channel scales: error tracks each channel's own range
    rel = err.max(0) / np.abs(w).max(0)
    assert rel.max() < 0.5 / 127 + 1e-6


def test_tree_rules_and_roundtrip():
    tree = {
        "dense": {"kernel": np.random.default_rng(1)
                  .standard_normal((8, 4)).astype(np.float32),
                  "bias": np.zeros((4,), np.float32)},
        "bn": {"mean": np.ones((4,), np.float32)},
        "emb": {"table": np.random.default_rng(2)
                .standard_normal((3, 5, 7)).astype(np.float32)},
    }
    tree["attn"] = {"bias": np.random.default_rng(3)
                    .standard_normal((4, 8)).astype(np.float32)}  # 2-D bias
    qt, st = quantize_tree(tree)
    assert qt["dense"]["kernel"].dtype == np.int8
    assert qt["emb"]["table"].dtype == np.int8       # ndim>=2 quantizes
    assert qt["dense"]["bias"].dtype == np.float32   # 1-D passes through
    assert st["dense"]["bias"] is None
    # DenseGeneral-style (heads, head_dim) biases stay f32 by NAME — the
    # rank test alone quantized every attention projection bias (review)
    assert qt["attn"]["bias"].dtype == np.float32
    assert st["attn"]["bias"] is None
    deq = dequantize_tree(qt, st)
    np.testing.assert_array_equal(deq["bn"]["mean"], tree["bn"]["mean"])
    np.testing.assert_allclose(deq["dense"]["kernel"],
                               tree["dense"]["kernel"], atol=0.05)


@pytest.fixture(scope="module")
def trained_lite():
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32,
                                  separation=1.5, seed=11)
    data.pop("subject")
    train = subset(data, np.arange(24))
    test = subset(data, np.arange(24, 32))
    model = TriModalFusionNetV4Lite()
    cfg = TrainConfig(batch_size=8, num_epochs=8, learning_rate=2e-3,
                      schedule="constant", selection="train_loss",
                      patience=100)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))
    res = fit(jax.random.key(0),
              jax.tree_util.tree_map(jnp.asarray, train), {}, None)
    return model, res, test


def test_quantized_serving_preserves_predictions(trained_lite, tmp_path):
    from multimodal_eeg_fmri_tpu.serving import Predictor

    model, res, test = trained_lite
    variables = {"params": jax.tree_util.tree_map(np.asarray, res.params)}
    if res.batch_stats:
        variables["batch_stats"] = jax.tree_util.tree_map(
            np.asarray, res.batch_stats)

    path = save_quantized(tmp_path / "lite_q", variables)
    restored = load_quantized(path)
    assert sorted(restored) == sorted(variables)

    p_ref = Predictor(model, variables["params"],
                      variables.get("batch_stats"), batch_size=8)
    p_q = Predictor.from_quantized(model, path, batch_size=8)
    inputs = {k: test[k] for k in ("erp", "pw", "conn")}
    probs_ref = p_ref(**inputs)
    probs_q = p_q(**inputs)
    # bounded drift, identical argmax decisions on a trained real task
    assert np.max(np.abs(probs_q - probs_ref)) < 0.05
    np.testing.assert_array_equal(probs_q.argmax(-1), probs_ref.argmax(-1))


def test_payload_size_reduction(trained_lite, tmp_path):
    model, res, _ = trained_lite
    params = jax.tree_util.tree_map(np.asarray, res.params)
    f32_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    path = save_quantized(tmp_path / "size_q", {"params": params})
    # compare against the UNcompressed f32 footprint the orbax checkpoint
    # pays; the npz is additionally deflate-compressed
    ratio = f32_bytes / path.stat().st_size
    assert ratio > 3.0, f"only {ratio:.2f}x smaller"


def test_int4_leaf_roundtrip_error_bound():
    from multimodal_eeg_fmri_tpu.core.quantize import (
        dequantize_leaf_int4,
        quantize_leaf_int4,
    )

    r = np.random.default_rng(3)
    # 3-D leaf with ragged group boundary (flattened rows % 64 != 0) and
    # 3-decade per-channel ranges
    w = (r.standard_normal((5, 23, 16))
         * r.uniform(0.01, 10.0, (16,))).astype(np.float32)
    packed, scales, shape = quantize_leaf_int4(w, group_size=64)
    assert packed.dtype == np.uint8 and shape == w.shape
    assert scales.shape == (-(-5 * 23 // 64), 16)
    deq = dequantize_leaf_int4(packed, scales, shape, group_size=64)
    assert deq.shape == w.shape
    # per-(group, channel) bound: |err| <= scale/2
    rows = (w - deq).reshape(-1, 16)
    g = np.zeros_like(rows)
    for gi in range(scales.shape[0]):
        g[gi * 64:(gi + 1) * 64] = scales[gi] / 2
    assert np.all(np.abs(rows) <= g + 1e-7)


def test_int4_serving_and_size(trained_lite, tmp_path):
    """int4 payload: ~2x smaller than int8, still decision-safe on the
    trained flagship (bounded drift, argmax agreement)."""
    from multimodal_eeg_fmri_tpu.serving import Predictor

    model, res, test = trained_lite
    variables = {"params": jax.tree_util.tree_map(np.asarray, res.params)}
    if res.batch_stats:
        variables["batch_stats"] = jax.tree_util.tree_map(
            np.asarray, res.batch_stats)

    p8 = save_quantized(tmp_path / "q8", variables, bits=8)
    p4 = save_quantized(tmp_path / "q4", variables, bits=4)
    assert p4.stat().st_size < 0.62 * p8.stat().st_size

    p_ref = Predictor(model, variables["params"],
                      variables.get("batch_stats"), batch_size=8)
    p_q4 = Predictor.from_quantized(model, p4, batch_size=8)
    inputs = {k: test[k] for k in ("erp", "pw", "conn")}
    probs_ref = p_ref(**inputs)
    probs_q4 = p_q4(**inputs)
    assert np.max(np.abs(probs_q4 - probs_ref)) < 0.15
    np.testing.assert_array_equal(probs_q4.argmax(-1),
                                  probs_ref.argmax(-1))


def test_int4_rejects_bad_bits(tmp_path):
    with pytest.raises(ValueError, match="bits"):
        save_quantized(tmp_path / "x", {"params": {}}, bits=5)
