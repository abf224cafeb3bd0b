"""Standalone dataset evaluation (the L3 ``evaluate`` API).

Reference: ``FlexibleTrainer.evaluate`` returns (metrics, targets, probs,
fused feats, gates, subjects) (``CrossModal_EEG_scr.ipynb §23``) and
``run_fmri_v11.py:453-504``. Here a single jitted forward over the
HBM-resident eval set returns the full ``ModelOutput`` plus the metric dict;
callers slice what they need.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
    regression_metrics,
    softmax_probs,
)
from multimodal_eeg_fmri_tpu.train.fit import split_batch


def apply_model(model, params, batch_stats, data, train: bool = False,
                rng: Optional[jax.Array] = None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs = {}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    return model.apply(variables, **split_batch(data), train=train, **kwargs)


def evaluate_dataset(
    model,
    params,
    batch_stats,
    data: Dict[str, jnp.ndarray],
    task: str = "classification",
) -> Tuple[Dict[str, jnp.ndarray], Any]:
    """Returns (metric dict, ModelOutput) for a whole dataset in one pass."""
    out = jax.jit(
        lambda p, bs, d: apply_model(model, p, bs, d, train=False)
    )(params, batch_stats, data)
    w = data.get("weight")
    if task == "regression":
        metrics = regression_metrics(out.logits, data["label"], w)
    else:
        metrics = binary_classification_metrics(out.logits, data["label"], w)
    return metrics, out


def predict_probs(model, params, batch_stats, data) -> jnp.ndarray:
    _, out = evaluate_dataset(model, params, batch_stats, data)
    return softmax_probs(out.logits)
