"""Cross-validation split generation (host-side).

Split *identity* matters for parity with the reference (SURVEY §7 hard
parts): the reference uses sklearn's StratifiedGroupKFold / GroupShuffleSplit
/ StratifiedKFold / LeaveOneOut with fixed random_state, so we call the same
sklearn APIs on host and ship index arrays to the device. Splits are
metadata, not compute — the device never sees them as anything but gathers.

Reference drivers these reproduce:
- ``run_stratified_group_kfold_trimodal`` (``CrossModal_EEG_scr.ipynb §30``):
  SGKF(5, shuffle, seed) grouped by subject + inner GroupShuffleSplit(0.2).
- ``run_experiment`` (``run_fmri_v11.py:715-931``): StratifiedKFold(5) (or
  KFold for regression) + inner stratified train_test_split(0.15).
- LOSO (``CrossModal_EEG_scr.ipynb §31``, ``CrossModal_fmri_scr.ipynb §12``):
  leave-one-subject-out over unique subjects.
- Bridge LOOCV (``_test_bridge.py:826-989``): LeaveOneOut over subjects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass(frozen=True)
class Split:
    """Index triple into a sample-axis dataset."""

    train: np.ndarray
    val: np.ndarray
    test: np.ndarray
    fold: int


def stratified_group_kfold(
    labels: np.ndarray,
    groups: np.ndarray,
    n_splits: int = 5,
    val_ratio: float = 0.2,
    seed: int = 42,
) -> List[Split]:
    """SGKF grouped by subject with an inner group-shuffle val split."""
    from sklearn.model_selection import GroupShuffleSplit, StratifiedGroupKFold

    labels = np.asarray(labels)
    groups = np.asarray(groups)
    sgkf = StratifiedGroupKFold(n_splits=n_splits, shuffle=True,
                                random_state=seed)
    splits = []
    for fold, (train_idx, test_idx) in enumerate(
        sgkf.split(np.zeros_like(labels), labels, groups)
    ):
        if val_ratio > 0:
            gss = GroupShuffleSplit(n_splits=1, test_size=val_ratio,
                                    random_state=seed + fold)
            tr, va = next(gss.split(train_idx, labels[train_idx],
                                    groups[train_idx]))
            splits.append(Split(train_idx[tr], train_idx[va], test_idx, fold))
        else:
            splits.append(Split(train_idx, test_idx, test_idx, fold))
    return splits


def stratified_kfold(
    labels: np.ndarray,
    n_splits: int = 5,
    val_ratio: float = 0.15,
    seed: int = 42,
    stratify: bool = True,
) -> List[Split]:
    """StratifiedKFold (or plain KFold) + inner stratified val split —
    the fMRI v11 leakage-free protocol."""
    from sklearn.model_selection import KFold, StratifiedKFold, train_test_split

    labels = np.asarray(labels)
    cls = StratifiedKFold if stratify else KFold
    kf = cls(n_splits=n_splits, shuffle=True, random_state=seed)
    splits = []
    for fold, (train_idx, test_idx) in enumerate(
        kf.split(np.zeros_like(labels), labels if stratify else None)
    ):
        if val_ratio > 0:
            strat = labels[train_idx] if stratify else None
            tr, va = train_test_split(
                train_idx, test_size=val_ratio, random_state=seed + fold,
                stratify=strat,
            )
            splits.append(Split(np.asarray(tr), np.asarray(va), test_idx, fold))
        else:
            splits.append(Split(train_idx, test_idx, test_idx, fold))
    return splits


def leave_one_subject_out(
    subjects: np.ndarray,
    val_ratio: Optional[float] = None,
    labels: Optional[np.ndarray] = None,
    seed: int = 42,
) -> List[Split]:
    """One fold per unique subject; that subject's samples are the test set.

    ``val_ratio=None`` (the default) carves a leakage-free inner val split
    of 15% of the REMAINING subjects, so ``selection='val'`` never sees the
    held-out test subject. The reference's LOSO instead lets val alias the
    test subject — test-set model selection, the leakage documented in
    SURVEY §2.5 — and that mode is OPT-IN via an explicit ``val_ratio=0``
    (the golden-protocol replays use it to reproduce the reference
    bit-for-bit); it warns every time."""
    if val_ratio is None:
        val_ratio = 0.15
    subjects = np.asarray(subjects)
    uniq = np.unique(subjects)
    rng = np.random.default_rng(seed)
    splits = []
    leaky_folds = 0
    for fold, s in enumerate(uniq):
        test_idx = np.where(subjects == s)[0]
        rest = np.where(subjects != s)[0]
        rest_subj = np.unique(subjects[rest])
        if val_ratio > 0 and len(rest_subj) >= 2:
            n_val = min(max(1, int(round(len(rest_subj) * val_ratio))),
                        len(rest_subj) - 1)
            val_subj = rng.choice(rest_subj, size=n_val, replace=False)
            va = rest[np.isin(subjects[rest], val_subj)]
            tr = rest[~np.isin(subjects[rest], val_subj)]
        else:
            tr, va = rest, test_idx
            leaky_folds += 1
        splits.append(Split(tr, va, test_idx, fold))
    if leaky_folds:
        import warnings

        warnings.warn(
            f"leave_one_subject_out: {leaky_folds} fold(s) have val "
            "ALIASING the TEST subject"
            + (" (explicit val_ratio=0 — the reference-faithful mode)"
               if val_ratio <= 0 else
               " (too few remaining subjects to carve an inner split)")
            + ", so selection='val' becomes test-set model selection "
            "(leaky). Use the default val_ratio, or select on "
            "'train_loss'/'test' explicitly.", stacklevel=2)
    return splits


def leave_one_out(n: int) -> List[Split]:
    """LOOCV over samples (bridge protocol: selection on train loss)."""
    idx = np.arange(n)
    return [
        Split(np.delete(idx, i), np.asarray([i]), np.asarray([i]), i)
        for i in range(n)
    ]
