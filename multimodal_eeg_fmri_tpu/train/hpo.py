"""Hyperparameter optimization with trial-parallel training.

Reference: ``OptunaHPOTrainer`` (``enhanced_models_v4.py:664-817``) — Optuna
TPE + MedianPruner over 7 hyperparameters (lr, hidden_dim, dropout, layers,
heads, weight_decay, use_gnn), 10-epoch proxy training per trial, strictly
sequential.

TPU-native design: trials are another ensemble axis.
- **Optimizer hyperparameters** (lr, weight decay) are runtime scalars in
  the compiled fit (train/fit.py ``hyper``), so trials that share an
  architecture train simultaneously under one ``vmap`` — on an 8-device
  mesh that's n_arch_groups compiles for the whole study instead of
  n_trials sequential runs.
- **Architecture hyperparameters** (hidden_dim, layers, heads, dropout,
  model family) change the compiled graph, so trials are grouped by
  architecture and groups run back-to-back.
- Search: quasi-random low-discrepancy sampling (scrambled Halton) over the
  space — competitive with TPE at these trial counts and embarrassingly
  parallel, which TPE's sequential posterior updates are not.
- Pruning: successive halving between rungs replaces the MedianPruner
  (proxy-epochs rung → top fraction → full-epoch rung).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


# ---------------------------------------------------------------------------
# Search space
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LogUniform:
    lo: float
    hi: float


@dataclass(frozen=True)
class Uniform:
    lo: float
    hi: float


@dataclass(frozen=True)
class Choice:
    options: Tuple[Any, ...]


SearchSpace = Dict[str, Any]  # name -> LogUniform | Uniform | Choice

# the reference study's 7-hyperparameter space
# (enhanced_models_v4.py:700-720 equivalents, incl. the model-family axis)
DEFAULT_SPACE: SearchSpace = {
    "lr": LogUniform(1e-5, 1e-2),
    "wd": LogUniform(1e-6, 1e-2),
    "hidden_dim": Choice((64, 96, 128)),
    "dropout": Choice((0.2, 0.3, 0.4, 0.5)),
    "num_transformer_layers": Choice((1, 2, 3)),
    "num_heads": Choice((2, 4, 8)),
    "use_gnn": Choice((False, True)),
}


def build_trimodal(use_gnn: bool = False, **arch_kwargs):
    """Model-family builder for the DEFAULT_SPACE ``use_gnn`` axis
    (reference: ``EnhancedTriModalFusionNet(use_gnn=...)``,
    ``enhanced_models_v4.py:700-720``). The GNN family needs ``conn`` in
    matrix form (B, N, N, M); the MLP family flattens matrix conn, so one
    matrix-form dataset serves both families in a single study."""
    from multimodal_eeg_fmri_tpu.models import (
        TriModalFusionNetGNN,
        TriModalFusionNetV4,
    )

    cls = TriModalFusionNetGNN if use_gnn else TriModalFusionNetV4
    return cls(**arch_kwargs)

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]


def _halton(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def sample_trials(space: SearchSpace, n_trials: int,
                  seed: int = 0) -> List[Dict[str, Any]]:
    """Scrambled-Halton quasi-random samples over the space."""
    rng = np.random.default_rng(seed)
    shifts = {k: rng.random() for k in space}
    trials = []
    for t in range(1, n_trials + 1):
        trial = {}
        for d, (name, spec) in enumerate(space.items()):
            u = (_halton(t, _PRIMES[d % len(_PRIMES)]) + shifts[name]) % 1.0
            if isinstance(spec, LogUniform):
                trial[name] = float(math.exp(
                    math.log(spec.lo)
                    + u * (math.log(spec.hi) - math.log(spec.lo))))
            elif isinstance(spec, Uniform):
                trial[name] = float(spec.lo + u * (spec.hi - spec.lo))
            elif isinstance(spec, Choice):
                trial[name] = spec.options[int(u * len(spec.options))
                                           % len(spec.options)]
            else:
                raise TypeError(f"unknown spec for {name}: {spec!r}")
        trials.append(trial)
    return trials


# ---------------------------------------------------------------------------
# Study
# ---------------------------------------------------------------------------

@dataclass
class HPOResult:
    best_params: Dict[str, Any]
    best_score: float
    trials: List[Dict[str, Any]]          # trial dicts with 'score' added
    rung_scores: List[np.ndarray] = field(default_factory=list)


OPT_KEYS = ("lr", "wd")  # runtime (vmapped); everything else = architecture


def run_hpo(
    model_builder: Callable[..., Any],  # (**arch_kwargs) -> flax module
    base_cfg: TrainConfig,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    space: Optional[SearchSpace] = None,
    n_trials: int = 16,
    proxy_epochs: int = 10,
    full_epochs: Optional[int] = None,
    top_fraction: float = 0.25,
    seed: int = 0,
    class_weights: Optional[np.ndarray] = None,
    metric: str = "f1",
    mesh_plan=None,
) -> HPOResult:
    """Quasi-random search + successive halving.

    Rung 1: all trials at ``proxy_epochs`` (the reference's 10-epoch proxy),
    vmapped within architecture groups. Rung 2: top ``top_fraction`` rerun
    at ``full_epochs``. Maximizes val ``metric``. With ``mesh_plan`` the
    trial axis is padded to the mesh's ensemble size and SHARDED over it, so
    an 8-chip slice runs 8 trials at one trial's wall-clock cost.
    """
    space = space or DEFAULT_SPACE
    trials = sample_trials(space, n_trials, seed)
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    train_dev, val_dev = dev(train_data), dev(val_data)
    cw = jnp.asarray(class_weights) if class_weights is not None else None

    def arch_key(trial):
        return tuple(sorted(
            (k, v) for k, v in trial.items()
            if k not in OPT_KEYS and k != "score"))

    def run_rung(rung_trials: List[dict], epochs: int) -> np.ndarray:
        scores = np.full(len(rung_trials), -np.inf)
        by_arch: Dict[tuple, List[int]] = {}
        for i, t in enumerate(rung_trials):
            by_arch.setdefault(arch_key(t), []).append(i)
        for key, idxs in by_arch.items():
            arch_kwargs = dict(key)
            model = model_builder(**arch_kwargs)
            import dataclasses

            cfg = dataclasses.replace(base_cfg, num_epochs=epochs,
                                      selection="val")
            fit_fn = make_fit_fn(model, cfg, eval_names=("val",))
            n_real = len(idxs)
            n_pad = n_real
            if mesh_plan is not None:
                m = mesh_plan.n_ensemble
                n_pad = ((n_real + m - 1) // m) * m
            pad_idx = idxs + [idxs[-1]] * (n_pad - n_real)
            lrs = jnp.asarray([rung_trials[i]["lr"] for i in pad_idx])
            wds = jnp.asarray([rung_trials[i].get("wd", cfg.weight_decay)
                               for i in pad_idx])
            rngs = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.key(seed), i)
            )(jnp.arange(n_pad))
            if mesh_plan is not None:
                from multimodal_eeg_fmri_tpu.parallel.mesh import (
                    ensemble_sharding,
                )

                shard = lambda x: jax.device_put(
                    x, ensemble_sharding(mesh_plan, np.ndim(x)))
                lrs, wds, rngs = shard(lrs), shard(wds), shard(rngs)
            trial_axes = (0, None, None, None, {"lr": 0, "wd": 0})
            if mesh_plan is not None:
                # trial axis as manual SPMD — auto-partitioning a vmapped
                # axis is unsafe (parallel/mesh.ensemble_vmap docstring)
                from multimodal_eeg_fmri_tpu.parallel.mesh import (
                    ensemble_vmap,
                )

                vfit = jax.jit(ensemble_vmap(fit_fn, mesh_plan,
                                             in_axes=trial_axes))
            else:
                vfit = jax.jit(jax.vmap(fit_fn, in_axes=trial_axes))
            res = vfit(rngs, train_dev, {"val": val_dev}, cw,
                       {"lr": lrs, "wd": wds})
            # best val metric over epochs per trial (MedianPruner analogue:
            # the proxy score IS the selection metric at its best epoch)
            hist = np.asarray(res.history[f"val_{metric}"])  # (T, E)
            best = hist.max(axis=1)
            for j, i in enumerate(idxs):
                scores[i] = best[j]
        return scores

    scores1 = run_rung(trials, proxy_epochs)
    for t, s in zip(trials, scores1):
        t["score"] = float(s)
    k = max(1, int(round(n_trials * top_fraction)))
    top_idx = np.argsort(-scores1)[:k]
    finalists = [dict(trials[i]) for i in top_idx]

    full_epochs = full_epochs or base_cfg.num_epochs
    scores2 = run_rung(finalists, full_epochs)
    for t, s in zip(finalists, scores2):
        t["score"] = float(s)
    best_i = int(np.argmax(scores2))
    return HPOResult(
        best_params={k: v for k, v in finalists[best_i].items()
                     if k != "score"},
        best_score=float(scores2[best_i]),
        trials=trials,
        rung_scores=[scores1, scores2],
    )


# ---------------------------------------------------------------------------
# Optional Optuna backend (reference API parity)
# ---------------------------------------------------------------------------

def run_hpo_optuna(
    model_builder: Callable[..., Any],
    base_cfg: TrainConfig,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    space: Optional[SearchSpace] = None,
    n_trials: int = 50,
    timeout: Optional[int] = 3600,
    proxy_epochs: int = 10,
    seed: int = 0,
    class_weights: Optional[np.ndarray] = None,
    metric: str = "f1",
) -> HPOResult:
    """Optuna TPE + MedianPruner study over the same search space — the
    reference's ``OptunaHPOTrainer`` interface (``enhanced_models_v4.py:664-817``).

    Optional backend: raises ImportError with guidance when optuna is not
    installed (the default quasi-random ``run_hpo`` engine needs nothing and
    additionally trains same-architecture trials in parallel). Each trial is
    one compiled proxy run; the per-epoch val series feeds
    ``trial.report`` so the MedianPruner can stop bad trials.
    """
    try:
        import optuna
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "optuna is not installed; use train.hpo.run_hpo (the built-in "
            "vmapped quasi-random engine) or install optuna for this backend"
        ) from e

    import dataclasses

    space = space or DEFAULT_SPACE
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    train_dev, val_dev = dev(train_data), dev(val_data)
    cw = jnp.asarray(class_weights) if class_weights is not None else None
    cfg = dataclasses.replace(base_cfg, num_epochs=proxy_epochs,
                              selection="val")
    trials_out: List[Dict[str, Any]] = []

    def objective(trial):
        params: Dict[str, Any] = {}
        for name, spec in space.items():
            if isinstance(spec, LogUniform):
                params[name] = trial.suggest_float(name, spec.lo, spec.hi,
                                                   log=True)
            elif isinstance(spec, Uniform):
                params[name] = trial.suggest_float(name, spec.lo, spec.hi)
            elif isinstance(spec, Choice):
                params[name] = trial.suggest_categorical(
                    name, list(spec.options))
        arch = {k: v for k, v in params.items() if k not in OPT_KEYS}
        model = model_builder(**arch)
        fit_fn = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))
        res = fit_fn(jax.random.fold_in(jax.random.key(seed), trial.number),
                     train_dev, {"val": val_dev}, cw,
                     {"lr": params.get("lr", cfg.learning_rate),
                      "wd": params.get("wd", cfg.weight_decay)})
        series = np.asarray(res.history[f"val_{metric}"])
        for epoch, v in enumerate(series):
            trial.report(float(v), epoch)
            if trial.should_prune():
                raise optuna.TrialPruned()
        score = float(series.max())
        trials_out.append({**params, "score": score})
        return score

    study = optuna.create_study(
        direction="maximize",
        sampler=optuna.samplers.TPESampler(seed=seed),
        pruner=optuna.pruners.MedianPruner(n_startup_trials=5,
                                           n_warmup_steps=5),
    )
    study.optimize(objective, n_trials=n_trials, timeout=timeout,
                   show_progress_bar=False)
    return HPOResult(
        best_params=dict(study.best_params),
        best_score=float(study.best_value),
        trials=trials_out,
    )
