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


def validate_dataset(
    data: Dataset,
    *,
    require_label: bool = True,
    num_classes: int = 2,
    batch_size: int = None,
    name: str = "dataset",
    warn_missing_weight: bool = True,
) -> Dataset:
    """Host-side sanity check of a user-built dataset dict, with
    ACTIONABLE error messages (migration surface: a malformed dict
    otherwise fails deep inside a traced fit with a shape error that
    names no key). Returns the dataset unchanged so calls can chain.

    Checks: dict-of-arrays with one shared leading sample axis; integer
    ``label`` in ``[0, num_classes)``; ``weight`` (if present) is a
    non-negative 1-D float mask; warns (via ``logging``) on non-finite
    values (NaN propagates to NaN loss by design — loaders scrub at
    ingest, hand-built arrays may not be), float64 leaves (cast to f32
    on TPU), and a batch size that drops remainder rows.
    """
    import logging

    log = logging.getLogger("multimodal_eeg_fmri_tpu.data")
    if not isinstance(data, dict) or not data:
        raise ValueError(
            f"{name} must be a non-empty dict of arrays keyed by modality "
            f"(e.g. {{'erp': (n,T,18), 'pw': (n,T,75), 'conn': (n,459), "
            f"'label': (n,), 'weight': (n,)}}), got {type(data).__name__}")
    arrays = {}
    for k, v in data.items():
        try:
            arrays[k] = np.asarray(v)
        except Exception as e:
            raise ValueError(
                f"{name}[{k!r}] is not array-convertible: {e}") from e
        if arrays[k].ndim == 0:
            raise ValueError(
                f"{name}[{k!r}] is a scalar — every entry needs a leading "
                f"sample axis (shape (n, ...))")
    sizes = {k: len(v) for k, v in arrays.items()}
    if len(set(sizes.values())) > 1:
        raise ValueError(
            f"{name} entries disagree on the sample count: {sizes} — all "
            f"leaves must share the leading axis (did a modality lose rows "
            f"during subject alignment? see data/handler.py)")
    n = next(iter(sizes.values()))
    if require_label:
        if "label" not in arrays:
            raise ValueError(
                f"{name} has no 'label' entry (keys: {sorted(arrays)}); "
                f"training data needs integer labels in [0, {num_classes})")
        lab = arrays["label"]
        if not np.issubdtype(lab.dtype, np.integer):
            raise ValueError(
                f"{name}['label'] has dtype {lab.dtype}; cast to an integer "
                f"type (e.g. labels.astype(np.int64)) — float labels are a "
                f"classification/regression mixup")
        if lab.ndim != 1:
            raise ValueError(
                f"{name}['label'] must be 1-D (n,), got shape {lab.shape}")
        if n and (lab.min() < 0 or lab.max() >= num_classes):
            raise ValueError(
                f"{name}['label'] values span [{lab.min()}, {lab.max()}] "
                f"but num_classes={num_classes}; remap labels to "
                f"[0, {num_classes}) (the reference binarizes the clinical "
                f"score at <=2 — data/loaders.load_labels does this)")
    if "weight" in arrays:
        w = arrays["weight"]
        if w.ndim != 1 or not np.issubdtype(w.dtype, np.floating):
            raise ValueError(
                f"{name}['weight'] must be a 1-D float mask (1=real row, "
                f"0=padding), got dtype {w.dtype} shape {w.shape}; "
                f"pad_rows() builds it for you")
        if n and w.min() < 0:
            raise ValueError(f"{name}['weight'] has negative entries "
                             f"(min {w.min()}) — weights are multiplicative "
                             f"loss masks and must be >= 0")
    elif require_label and warn_missing_weight:
        log.warning(
            "%s has no 'weight' column; add np.ones((%d,), np.float32) "
            "(or use pad_rows) — losses/metrics mask padding through it",
            name, n)
    for k, v in arrays.items():
        if np.issubdtype(v.dtype, np.floating):
            if v.dtype == np.float64:
                log.warning("%s[%r] is float64; it will be cast to float32 "
                            "on TPU (x64 is CPU-oracle-only here)", name, k)
            if not np.isfinite(v).all():
                bad = int((~np.isfinite(v)).sum())
                log.warning(
                    "%s[%r] has %d non-finite value(s); NaN propagates to "
                    "NaN loss by design — scrub at ingest (loaders do; "
                    "np.nan_to_num for hand-built arrays)", name, k, bad)
    if batch_size and n % batch_size:
        log.warning(
            "%s: %d rows with batch_size=%d drops the last %d row(s) each "
            "epoch (fit runs n // batch_size full batches); pad_rows(%d) "
            "keeps them with zero-weight padding",
            name, n, batch_size, n % batch_size,
            ((n + batch_size - 1) // batch_size) * batch_size)
    return data


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
