"""Classification / regression losses.

Functional equivalents of the reference's loss inventory (SURVEY §1 L3):
weighted CE (used everywhere), ``FocalLoss`` (α=0.25 γ=2,
``CrossModal_EEG_scr.ipynb §20``), ``LabelSmoothingCrossEntropy`` (ε=0.1,
``EEG_CODE/crossmodal_v4_enhancements.py:665-677``), and MSE for the fMRI
regression task (``fMRI_CODE/run_fmri_v11.py:990-1017``).

All are pure functions of (logits, labels[, class_weights]) returning a
scalar, so they inline into the jitted train step and fuse with the backward
pass. Losses reduce in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over the batch; ``labels`` are int class ids.

    ``sample_weights`` (batch,) support masked batches (padding rows get 0),
    which is how fixed-shape fold-vmapped training handles ragged fold sizes.
    """
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if sample_weights is None:
        return jnp.mean(nll)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CE with per-class weights (sklearn ``compute_class_weight('balanced')``
    semantics, matching torch ``CrossEntropyLoss(weight=...)``: weighted mean
    normalized by the summed weights of the participating samples)."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights.astype(jnp.float32)[labels]
    if sample_weights is not None:
        w = w * sample_weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal reweighting of CE: ``alpha * (1-p_t)^gamma * CE``
    (reference ``FocalLoss``, ``CrossModal_EEG_scr.ipynb §20``)."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-nll)
    loss = alpha * (1.0 - pt) ** gamma * nll
    if sample_weights is None:
        return jnp.mean(loss)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-8)


def label_smoothing_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smoothing: float = 0.1,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``(1-ε)·NLL + ε·mean(-logp)`` — exactly the reference formulation
    (``crossmodal_v4_enhancements.py:672-677``), which smooths with the mean
    over classes rather than the uniform-mixture convention."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    if sample_weights is None:
        return jnp.mean(loss)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-8)


def mse_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    err = (preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    if sample_weights is None:
        return jnp.mean(err)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-8)


def make_loss_fn(name: str, **kw):
    """Resolve a TrainConfig.loss name to a callable
    ``loss(logits, labels, class_weights, sample_weights)``."""
    if name == "ce":
        return lambda lo, la, cw=None, sw=None: cross_entropy(lo, la, sw)
    if name == "weighted_ce":
        def _wce(lo, la, cw=None, sw=None):
            if cw is None:
                return cross_entropy(lo, la, sw)
            return weighted_cross_entropy(lo, la, cw, sw)
        return _wce
    if name == "focal":
        a = kw.get("alpha", 0.25)
        g = kw.get("gamma", 2.0)
        return lambda lo, la, cw=None, sw=None: focal_loss(lo, la, a, g, sw)
    if name == "label_smoothing":
        s = kw.get("smoothing", 0.1)
        return lambda lo, la, cw=None, sw=None: label_smoothing_cross_entropy(lo, la, s, sw)
    if name == "mse":
        return lambda lo, la, cw=None, sw=None: mse_loss(lo, la, sw)
    raise ValueError(f"unknown loss {name!r}")
