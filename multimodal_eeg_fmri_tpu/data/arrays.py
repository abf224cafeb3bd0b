"""Array-dataset utilities: padding, subsetting, fold stacking.

Datasets in this framework are plain dicts of host/device arrays with a
leading sample axis plus a ``weight`` mask (1 = real row, 0 = padding).
Fixed shapes are what make fold-vmapped training possible (SURVEY §7 "tiny
batches" hard part): every fold pads to a common size and the mask removes
padding from losses and metrics.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


Dataset = Dict[str, np.ndarray]


def subset(data: Dataset, idx: Sequence[int]) -> Dataset:
    idx = np.asarray(idx)
    return {k: np.asarray(v)[idx] for k, v in data.items()}


def pad_rows(data: Dataset, target: int) -> Dataset:
    """Pad every leaf to ``target`` rows; pad rows get weight 0.

    Padding rows are CYCLED from the whole dataset (row i % n) rather than
    repeating row 0 or zeros, so BatchNorm batch statistics over a shuffled
    training batch stay representative of the fold distribution. The weight
    mask removes pad rows from loss, gradients and metrics.

    Known residual effects vs an unpadded run (documented tradeoff of
    static-shape training): pad rows still contribute to BN *batch*
    statistics during training (a mild smoothing toward the fold mean,
    vanishing as padding fraction → 0), and an epoch over a heavily-padded
    fold runs ``target // batch_size`` optimizer steps, not
    ``n // batch_size`` — gradients are correctly masked per-sample, so each
    step averages over fewer REAL samples rather than taking extra biased
    steps.
    """
    n = len(next(iter(data.values())))
    if "weight" not in data:
        data = {**data, "weight": np.ones((n,), np.float32)}
    if n == target:
        return data
    if n > target:
        raise ValueError(f"cannot pad {n} rows down to {target}")
    idx = np.arange(target - n) % n  # cycle through the fold
    out = {}
    for k, v in data.items():
        v = np.asarray(v)
        pad = v[idx]
        if k == "weight":
            pad = np.zeros_like(pad)
        out[k] = np.concatenate([v, pad], axis=0)
    return out


def stack_trees(trees: List[Dataset]) -> Dataset:
    """Stack a list of same-shape datasets along a new leading (fold) axis."""
    keys = trees[0].keys()
    return {k: np.stack([t[k] for t in trees], axis=0) for k in keys}


def pad_and_stack(folds: List[Dataset], multiple_of: int = 1) -> Dataset:
    """Pad each fold dataset to the common max size (rounded up to
    ``multiple_of`` for clean batching) and stack on a fold axis."""
    sizes = [len(next(iter(f.values()))) for f in folds]
    target = max(sizes)
    if multiple_of > 1:
        target = ((target + multiple_of - 1) // multiple_of) * multiple_of
    return stack_trees([pad_rows(f, target) for f in folds])


def balanced_class_weights(labels: np.ndarray, num_classes: int = 2,
                           weights: np.ndarray = None) -> np.ndarray:
    """sklearn ``compute_class_weight('balanced')``: n / (k · bincount)."""
    labels = np.asarray(labels)
    if weights is not None:
        mask = np.asarray(weights) > 0
        labels = labels[mask]
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1)
    return (len(labels) / (num_classes * counts)).astype(np.float32)


def train_val_split(
    n: int, val_ratio: float, rng: np.random.Generator,
    labels: np.ndarray = None,
):
    """Stratified train/val index split (reference
    ``run_fmri_v11.py:769-784`` uses sklearn ``train_test_split`` with
    stratify; this reproduces the stratified assignment)."""
    idx = np.arange(n)
    if labels is None or val_ratio <= 0:
        perm = rng.permutation(idx)
        n_val = max(1, int(round(n * val_ratio))) if val_ratio > 0 else 0
        return perm[n_val:], perm[:n_val]
    val_idx = []
    for c in np.unique(labels):
        c_idx = rng.permutation(idx[labels == c])
        n_val = max(1, int(round(len(c_idx) * val_ratio)))
        val_idx.extend(c_idx[:n_val])
    val_idx = np.asarray(sorted(val_idx))
    train_idx = np.asarray(sorted(set(idx) - set(val_idx)))
    return train_idx, val_idx
