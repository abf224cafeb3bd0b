"""Cross-validation drivers — the L4 harness, fold-parallel on TPU.

The reference's CV drivers are sequential Python loops: 5-fold SGKF × 4
models (``CrossModal_EEG_scr.ipynb §30``), LOSO over ~60 subjects (§31),
fMRI 5-fold × 3 models (``run_fmri_v11.py:715-931``), bridge LOOCV over 32
subjects (``_test_bridge.py:826-989``). Every fold trains a fresh tiny model
— embarrassingly parallel work the reference serializes.

Here each driver:
1. generates split indices on host with the same sklearn protocols
   (data/splits.py — split identity parity);
2. applies leakage-safe per-fold normalization (data/normalize.py);
3. pads folds to a common fixed shape with weight masks and stacks them on a
   leading **fold axis**;
4. runs ``jax.vmap(fit)`` over that axis — ALL folds train simultaneously in
   one compiled program — optionally sharded over the mesh's ``ensemble``
   axis so an 8-chip slice trains 8 folds at the wall-clock cost of one;
5. evaluates best-state params per fold and aggregates mean ± std like the
   reference's summaries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data.arrays import (
    balanced_class_weights,
    pad_rows,
    stack_trees,
    subset,
)
from multimodal_eeg_fmri_tpu.data.normalize import FoldNormalizer, feature_standardize
from multimodal_eeg_fmri_tpu.data.splits import (
    Split,
    leave_one_out,
    leave_one_subject_out,
    stratified_group_kfold,
    stratified_kfold,
)
from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
    regression_metrics,
)
from multimodal_eeg_fmri_tpu.train.fit import FitResult, make_fit_fn, split_batch


@dataclass
class CVResult:
    """Outcome of one model across all folds."""

    fold_metrics: Dict[str, np.ndarray]       # metric -> (n_folds,)
    summary: Dict[str, Tuple[float, float]]   # metric -> (mean, std)
    params: Any                               # fold-stacked best params
    batch_stats: Any
    history: Dict[str, np.ndarray]            # metric -> (n_folds, epochs)
    best_epochs: np.ndarray                   # (n_folds,)
    n_folds: int
    # per-sample test-set outputs for stats/late-fusion/XAI:
    test_probs: Optional[np.ndarray] = None   # (n_folds, n_test_max, C)
    test_labels: Optional[np.ndarray] = None  # (n_folds, n_test_max)
    test_weight: Optional[np.ndarray] = None  # mask (n_folds, n_test_max)
    test_subjects: Optional[np.ndarray] = None

    def metric(self, name: str) -> Tuple[float, float]:
        return self.summary[name]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def build_fold_arrays(
    data: Dict[str, np.ndarray],
    splits: Sequence[Split],
    normalize: str = "scalar",
    normalize_keys: Sequence[str] = (),
    batch_multiple: int = 1,
    fold_multiple: int = 1,
    num_classes: int = 2,
    weighted_classes: bool = True,
):
    """Normalize per fold, pad to fixed shapes, stack on a fold axis.

    Returns (train_stack, eval_stacks{'val','test'}, class_weights (F,C),
    fold_mask (F,)). When ``fold_multiple`` > 1 the fold axis is padded by
    repeating the last fold (mask 0) so it shards evenly over the mesh.
    """
    trains, vals, tests, cws = [], [], [], []
    for sp in splits:
        if normalize == "scalar" and normalize_keys:
            d = FoldNormalizer(normalize_keys).fit_transform(data, sp.train)
        elif normalize == "feature" and normalize_keys:
            d = feature_standardize(data, sp.train, normalize_keys)
        else:
            d = data
        trains.append(subset(d, sp.train))
        vals.append(subset(d, sp.val))
        tests.append(subset(d, sp.test))
        if weighted_classes:
            cws.append(balanced_class_weights(
                np.asarray(d["label"])[sp.train], num_classes))
        else:
            cws.append(np.ones((num_classes,), np.float32))

    def _stack(folds: List[dict], multiple=1):
        target = _round_up(max(len(next(iter(f.values()))) for f in folds),
                           multiple)
        return stack_trees([pad_rows(f, target) for f in folds])

    train_stack = _stack(trains, batch_multiple)
    val_stack = _stack(vals)
    test_stack = _stack(tests)
    cw = np.stack(cws)
    n = len(splits)
    n_pad = _round_up(n, fold_multiple)
    fold_mask = np.ones((n_pad,), np.float32)
    if n_pad > n:
        fold_mask[n:] = 0.0
        rep = lambda t: {k: np.concatenate(
            [v] + [v[-1:]] * (n_pad - n), axis=0) for k, v in t.items()}
        train_stack, val_stack, test_stack = map(rep, (train_stack, val_stack,
                                                       test_stack))
        cw = np.concatenate([cw] + [cw[-1:]] * (n_pad - n), axis=0)
    return train_stack, {"val": val_stack, "test": test_stack}, cw, fold_mask


def run_cv(
    model,
    cfg: TrainConfig,
    data: Dict[str, np.ndarray],
    splits: Sequence[Split],
    *,
    task: str = "classification",
    augment: Optional[Callable] = None,
    normalize: str = "scalar",
    normalize_keys: Sequence[str] = (),
    mesh_plan=None,
    rng: Optional[jax.Array] = None,
    num_epochs: Optional[int] = None,
    aot_dir: Optional[str] = None,
) -> CVResult:
    """Train one model architecture across all folds simultaneously.

    ``aot_dir`` (optional) enables the AOT bundle cache (core/aot.py): the
    fold-vmapped fit program is serialized there keyed by config+shapes,
    and later processes skip re-tracing it entirely.
    """
    # 'subject' rides along in the stacks (split_batch keeps it out of the
    # model inputs) so LOSO votes and per-subject reports can use it.
    from multimodal_eeg_fmri_tpu.data.arrays import validate_dataset

    validate_dataset(data, require_label=task == "classification",
                     num_classes=getattr(cfg, "num_classes", 2),
                     name="run_cv data",
                     # build_fold_arrays adds per-fold padding masks itself
                     warn_missing_weight=False)
    model_data = {k: np.asarray(v) for k, v in data.items()}

    fold_multiple = mesh_plan.n_ensemble if mesh_plan is not None else 1
    train_stack, eval_stacks, cw, fold_mask = build_fold_arrays(
        model_data, splits, normalize, normalize_keys,
        batch_multiple=1, fold_multiple=fold_multiple,
        weighted_classes=cfg.loss == "weighted_ce" and task == "classification",
    )
    n_folds = len(splits)
    n_total = len(fold_mask)

    fit_fn = make_fit_fn(
        model, cfg, num_epochs=num_epochs, task=task,
        eval_names=tuple(eval_stacks.keys()), augment=augment,
    )

    if rng is None:
        rng = jax.random.key(cfg.seed)
    rng = jnp.asarray(rng)
    # legacy raw PRNG keys (jax.random.PRNGKey → (2,) uint32) are a SINGLE
    # key despite ndim 1 — classify by dtype, not ndim (found in review:
    # the ndim test read a raw key as "a stack of 2 per-fold keys")
    is_typed = jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
    per_fold = jnp.ndim(rng) >= 1 if is_typed else jnp.ndim(rng) >= 2
    if per_fold:
        # precomputed per-fold keys (shape (n_folds,)) — used when a caller
        # needs a specific fold of a larger sweep to replay with the exact
        # key the full sweep would use (e.g. the padding-bias comparison)
        if rng.shape[0] != n_total:
            raise ValueError(
                f"per-fold rng has {rng.shape[0]} keys, need {n_total}")
        fold_rngs = rng
    else:
        fold_rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(n_total)
        )

    dev = jax.tree_util.tree_map(jnp.asarray, (train_stack, eval_stacks, cw))
    train_dev, evals_dev, cw_dev = dev
    if mesh_plan is not None:
        from multimodal_eeg_fmri_tpu.parallel.mesh import shard_ensemble_tree

        train_dev = shard_ensemble_tree(mesh_plan, train_dev)
        evals_dev = shard_ensemble_tree(mesh_plan, evals_dev)
        cw_dev = shard_ensemble_tree(mesh_plan, cw_dev)
        fold_rngs = shard_ensemble_tree(mesh_plan, fold_rngs)

    # NOTE on donation: donating the fold-stacked train data here was
    # measured to alias NOTHING (66-fold LOSO AOT memory analysis: identical
    # arg/temp/alias bytes with and without donate_argnums=(1,)) — XLA only
    # aliases donated inputs into same-shaped outputs, and no FitResult leaf
    # matches the data shapes. The carry→carry resume path (train/resilient)
    # is where donation aliases 100% — see docs/DESIGN.md.
    if mesh_plan is not None:
        # fold axis as MANUAL SPMD (shard_map) — each ensemble group trains
        # its local folds with zero partitioner involvement, bit-identical
        # to the unsharded vmap. GSPMD auto-partitioning of the vmapped
        # fold axis is NOT safe on current XLA (silent miscompilation of
        # sharded vmapped conv stacks — parallel/mesh.ensemble_vmap).
        from multimodal_eeg_fmri_tpu.parallel.mesh import ensemble_vmap

        vfit = jax.jit(ensemble_vmap(fit_fn, mesh_plan))
    else:
        vfit = jax.jit(jax.vmap(fit_fn))
    if aot_dir is not None:
        from multimodal_eeg_fmri_tpu.core.aot import bundle_or_jit

        mesh_tag = ("none" if mesh_plan is None else
                    f"{getattr(mesh_plan, 'n_ensemble', '?')}x"
                    f"{getattr(mesh_plan, 'n_data', '?')}")
        tag = (f"run_cv::{model!r}::{cfg!r}::task={task}"
               f"::evals={tuple(eval_stacks.keys())}"
               f"::epochs={num_epochs}"
               f"::mesh={mesh_tag}"
               f"::aug={getattr(augment, '_aot_tag', repr(augment))}")
        vfit = bundle_or_jit(
            vfit, (fold_rngs, train_dev, evals_dev, cw_dev), aot_dir, tag)
    res: FitResult = vfit(fold_rngs, train_dev, evals_dev, cw_dev)

    # final test metrics from the selected (best) state, per fold
    def _test_metrics(params, batch_stats, test):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, **split_batch(test), train=False)
        w = test.get("weight")
        if task == "regression":
            m = regression_metrics(out.logits, test["label"], w)
            probs = out.logits
        else:
            m = binary_classification_metrics(out.logits, test["label"], w)
            probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
        return m, probs

    metrics, probs = jax.jit(jax.vmap(_test_metrics))(
        res.params, res.batch_stats, evals_dev["test"]
    )

    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    metrics = host(metrics)
    fold_metrics = {k: v[:n_folds] for k, v in metrics.items()}
    summary = {
        k: (float(np.mean(v)), float(np.std(v))) for k, v in fold_metrics.items()
    }
    test_np = host(eval_stacks["test"])
    return CVResult(
        fold_metrics=fold_metrics,
        summary=summary,
        params=res.params,
        batch_stats=res.batch_stats,
        history=host(res.history),
        best_epochs=np.asarray(res.best_epoch)[:n_folds],
        n_folds=n_folds,
        test_probs=np.asarray(probs)[:n_folds],
        test_labels=test_np["label"][:n_folds],
        test_weight=test_np["weight"][:n_folds],
        test_subjects=(test_np["subject"][:n_folds]
                       if "subject" in test_np else None),
    )


def run_model_suite(
    models: Dict[str, Any],
    cfg: TrainConfig,
    data: Dict[str, np.ndarray],
    splits: Sequence[Split],
    **kw,
) -> Dict[str, CVResult]:
    """Train several architectures over the same folds (the reference's
    4-models-per-fold / 3-models-per-fold comparisons). Different
    architectures can't share one vmap, so they run back-to-back — each one
    internally fold-parallel."""
    return {name: run_cv(m, cfg, data, splits, **kw)
            for name, m in models.items()}


def run_seed_sweep(
    model,
    cfg: TrainConfig,
    train_data: Dict[str, np.ndarray],
    eval_sets: Dict[str, Dict[str, np.ndarray]],
    n_seeds: int,
    *,
    class_weights=None,
    mesh_plan=None,
    base_seed: int = 0,
    task: str = "classification",
) -> Dict[str, Any]:
    """Train ``n_seeds`` runs differing ONLY in the PRNG seed as one
    vmapped program and summarize the spread.

    The reference reports mean±std across FOLDS only
    (`CrossModal_EEG_scr.ipynb §44`); at 66 subjects the run-to-run
    variance of training itself (init + shuffling + dropout masks) is the
    other half of the uncertainty and goes unreported. Here the seed axis
    is a device axis: all seeds train simultaneously under ``vmap`` and —
    given a ``mesh_plan`` — shard over the mesh's ``ensemble`` dimension
    (manual SPMD, same machinery as folds), so S seeds cost one seed's
    wall-clock on an S-chip slice.

    Returns ``{"best_metric": (S,), "mean", "ci95": (lo, hi),
    "history": {metric: (S, epochs)}, "result": FitResult}``; the CI is
    the t-distribution interval (`report/stats.confidence_interval`,
    reference §28).
    """
    from multimodal_eeg_fmri_tpu.data.arrays import validate_dataset
    from multimodal_eeg_fmri_tpu.report.stats import confidence_interval

    validate_dataset(train_data, require_label=task == "classification",
                     num_classes=getattr(cfg, "num_classes", 2),
                     name="seed_sweep train_data")
    eval_names = tuple(eval_sets)
    fit = make_fit_fn(model, cfg, eval_names=eval_names, task=task)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.key(base_seed), i))(jnp.arange(n_seeds))
    tdev = jax.tree_util.tree_map(jnp.asarray, train_data)
    edev = jax.tree_util.tree_map(jnp.asarray, dict(eval_sets))
    cw = None if class_weights is None else jnp.asarray(class_weights)

    if mesh_plan is not None:
        from multimodal_eeg_fmri_tpu.parallel.mesh import (
            ensemble_sharding,
            ensemble_vmap,
        )

        if n_seeds % mesh_plan.n_ensemble:
            raise ValueError(
                f"the ensemble axis ({mesh_plan.n_ensemble}) must divide "
                f"n_seeds={n_seeds}")
        keys = jax.device_put(keys, ensemble_sharding(mesh_plan, 1))
        vfit = jax.jit(ensemble_vmap(fit, mesh_plan,
                                     in_axes=(0, None, None, None)))
    else:
        vfit = jax.jit(jax.vmap(fit, in_axes=(0, None, None, None)))
    res = vfit(keys, tdev, edev, cw)
    best = np.asarray(res.best_metric)
    mean, lo, hi = confidence_interval(best)
    return {
        "best_metric": best,
        "mean": mean,
        "std": float(best.std(ddof=1)) if n_seeds > 1 else 0.0,
        "ci95": (lo, hi),
        "history": {k: np.asarray(v) for k, v in res.history.items()},
        "result": res,
    }


# ---------------------------------------------------------------------------
# Protocol front-ends matching the reference drivers
# ---------------------------------------------------------------------------

def eeg_kfold_splits(data, cfg: TrainConfig, n_splits=5, val_ratio=0.2):
    return stratified_group_kfold(
        data["label"], data.get("subject", np.arange(len(data["label"]))),
        n_splits=n_splits, val_ratio=val_ratio, seed=cfg.seed,
    )


def fmri_kfold_splits(data, cfg: TrainConfig, n_splits=5, val_ratio=0.15,
                      stratify=True):
    return stratified_kfold(data["label"], n_splits=n_splits,
                            val_ratio=val_ratio, seed=cfg.seed,
                            stratify=stratify)


def loso_splits(data, cfg: TrainConfig, val_ratio=None):
    """LOSO folds. Default: a leakage-free 15% inner val split over the
    remaining subjects; the reference-faithful leaky mode (val == test
    subject) is opt-in via explicit ``val_ratio=0`` (see
    ``data.splits.leave_one_subject_out``)."""
    return leave_one_subject_out(
        data.get("subject", np.arange(len(data["label"]))),
        val_ratio=val_ratio, labels=data["label"], seed=cfg.seed,
    )


def loocv_splits(data):
    return leave_one_out(len(data["label"]))


def subject_level_votes(result: CVResult) -> Dict[int, int]:
    """LOSO majority vote per held-out subject
    (``run_loso_subject_evaluation``, ``CrossModal_EEG_scr.ipynb §31``):
    each fold's test samples belong to one subject; the vote is the mean
    class-1 probability thresholded at 0.5 over that subject's samples.
    (The reference rounds the mean of HARD argmax predictions; the mean
    soft probability is the smoother equivalent and, unlike np.round's
    banker's rounding, has no even-count tie artifact. The golden LOSO
    replay compares the two rules end-to-end:
    ``tests/test_golden_protocol.py::test_loso_golden_protocol_replay``.)"""
    votes = {}
    for f in range(result.n_folds):
        w = result.test_weight[f] > 0
        if result.test_subjects is None or not w.any():
            continue
        subj = int(result.test_subjects[f][w][0])
        p1 = result.test_probs[f][w][:, 1].mean()
        votes[subj] = int(p1 > 0.5)
    return votes
