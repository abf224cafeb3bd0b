"""Whole-run compiled training.

The reference's L3/L4 training loop (``FlexibleTrainer`` +
epoch-loop-with-early-stopping, ``CrossModal_EEG_scr.ipynb §23,30``) is a
Python loop doing per-batch host→device transfers, per-epoch sklearn metric
syncs, and ``copy.deepcopy`` best-state checkpointing. On TPU that pattern is
latency-bound: the models are ~1M params and batches are 8 rows, so each step
is microseconds of compute and milliseconds of dispatch.

Here the ENTIRE training run — epoch loop, batch loop, shuffling, metric
evaluation, best-state tracking, plateau LR control, early-stopping gates —
is one ``lax.scan`` compiled under ``jit``:

- datasets are HBM-resident arrays (the whole cohort is < 1 MB);
- per-epoch shuffling is ``jax.random.permutation`` on device;
- eval metrics (accuracy/F1/AUC) are jnp (report/metrics.py), so model
  selection never syncs to host;
- "checkpoint best state" is a ``tree_map(where(improved, new, best))`` —
  a register select instead of a deepcopy;
- early stopping keeps the epoch count static (required for one compiled
  graph) but freezes optimizer/params once patience is exhausted —
  numerically identical selected model to the reference's break.

The resulting ``fit`` is a pure function of (rng, data, class_weights), so
cross-validation folds / HPO trials / ensemble members ``vmap`` over it
(train/cv.py) and shard over the mesh's ensemble axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.ops.losses import make_loss_fn
from multimodal_eeg_fmri_tpu.report.metrics import (
    binary_classification_metrics,
    regression_metrics,
)

# batch keys that are not model inputs
RESERVED_KEYS = ("label", "reg_label", "weight", "subject")


def split_batch(batch: Dict[str, jnp.ndarray]):
    inputs = {k: v for k, v in batch.items() if k not in RESERVED_KEYS}
    return inputs


class FitResult(NamedTuple):
    params: Any            # best params (selection metric)
    batch_stats: Any       # best batch_stats (possibly empty dict)
    final_params: Any      # last-epoch params
    final_batch_stats: Any
    best_metric: jnp.ndarray
    best_epoch: jnp.ndarray
    history: Dict[str, jnp.ndarray]  # per-epoch series, each (num_epochs,)
    carry: Any = None      # full final training state — pass back via
    #                        ``resume_carry`` to continue training
    #                        (fault-tolerant chunked runs, train/resilient.py)


@struct.dataclass
class _Carry:
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray
    best_params: Any
    best_batch_stats: Any
    best_metric: jnp.ndarray
    best_epoch: jnp.ndarray
    bad_epochs: jnp.ndarray     # early-stopping counter
    stopped: jnp.ndarray        # bool
    plateau_best: jnp.ndarray   # plateau-LR controller state
    plateau_bad: jnp.ndarray
    lr_scale: jnp.ndarray
    epoch: jnp.ndarray
    ema_params: Any = ()        # Polyak average (cfg.ema_decay>0), else ()


def _base_tx(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW decomposed so LR and weight decay are applied as RUNTIME
    scalars in the train step: updates = -(lr·lr_scale)·(adam + wd·p).
    This keeps plateau/cosine scheduling a pure carry scalar and makes
    (lr, wd) vmappable axes — HPO trials that differ only in optimizer
    hyperparameters train inside one compiled program (train/hpo.py)."""
    txs = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip))
    txs.append(optax.scale_by_adam())
    return optax.chain(*txs)


def _cosine_scale(cfg: TrainConfig, epoch: jnp.ndarray) -> jnp.ndarray:
    """warmup+cosine as a multiplier on base lr (reference
    ``CosineAnnealingWarmup`` semantics; epoch is 0-indexed here)."""
    e = epoch.astype(jnp.float32) + 1.0
    warm = jnp.maximum(cfg.warmup_epochs, 1)
    warm_scale = e / warm
    progress = (e - warm) / jnp.maximum(cfg.num_epochs - warm, 1)
    progress = jnp.clip(progress, 0.0, 1.0)
    min_scale = cfg.min_lr / cfg.learning_rate
    cos_scale = min_scale + 0.5 * (1.0 - min_scale) * (
        1.0 + jnp.cos(jnp.pi * progress)
    )
    return jnp.where(e <= warm, warm_scale, cos_scale)


def _plateau_update(cfg: TrainConfig, best, bad, scale, metric):
    """Functional ReduceLROnPlateau (mode=min on train loss)."""
    improved = metric < best - 1e-4
    best = jnp.where(improved, metric, best)
    bad = jnp.where(improved, 0, bad + 1)
    trigger = bad > cfg.plateau_patience
    scale = jnp.where(
        trigger,
        jnp.maximum(scale * cfg.plateau_factor, cfg.min_lr / cfg.learning_rate),
        scale,
    )
    bad = jnp.where(trigger, 0, bad)
    return best, bad, scale


def make_fit_fn(
    model,
    cfg: TrainConfig,
    *,
    num_epochs: Optional[int] = None,
    task: str = "classification",
    eval_names: Tuple[str, ...] = ("val", "test"),
    loss_kwargs: Optional[dict] = None,
    augment: Optional[Callable] = None,
    preprocess: Optional[Callable] = None,
    param_sharding: Optional[Callable] = None,
) -> Callable[..., FitResult]:
    """Build a jitted ``fit(rng, train_data, eval_sets, class_weights)``.

    train_data / eval_sets leaves are fixed-shape arrays with a ``weight``
    mask column (0 = padding row). ``eval_sets`` is a dict keyed by
    ``eval_names``. The returned function is pure → vmap/shard freely.

    ``param_sharding`` (optional ``params → params``) pins a tensor-parallel
    / FSDP layout on the freshly-initialized params (see
    ``parallel.tensor.tp_param_constraint`` /
    ``parallel.fsdp.fsdp_param_constraint``); when resuming via
    ``resume_carry`` the same layout is re-pinned on every params-shaped
    tree in the carry (params, best/EMA snapshots, optimizer moments) —
    a checkpoint-restored carry arrives as unsharded host arrays and must
    not silently train replicated.

    Buffer donation happens at the CALLER's outermost ``jax.jit`` (an inner
    jit's donation is ignored under an outer jit/vmap). Measured outcomes
    (DESIGN.md "Buffer donation"): donating ``run_cv``'s fold-stacked train
    data aliases nothing (no same-shaped output) and is left off;
    ``train/resilient.py`` donates the resume carry (argnum 5), which
    aliases fully and cuts peak HBM ~34%.
    """
    E = num_epochs or cfg.num_epochs
    if cfg.selection != "train_loss" and cfg.selection not in eval_names:
        raise ValueError(
            f"cfg.selection={cfg.selection!r} but eval_names={eval_names}; "
            "pass the selection set or use selection='train_loss'"
        )
    lk = dict(loss_kwargs or {})
    if task == "regression":
        loss_fn = make_loss_fn("mse")
    else:
        name = cfg.loss
        if name == "focal":
            lk.setdefault("alpha", cfg.focal_alpha)
            lk.setdefault("gamma", cfg.focal_gamma)
        if name == "label_smoothing":
            lk.setdefault("smoothing", cfg.label_smoothing)
        loss_fn = make_loss_fn(name, **lk)

    tx = _base_tx(cfg)
    target_key = "label"
    metric_mode_max = cfg.selection != "train_loss"

    # mixed precision: master params stay f32 for AdamW; forward/backward
    # run in bf16 (MXU-native). Casts are inserted inside the loss so the
    # gradient of the cast returns f32 grads automatically. Norm running
    # stats stay f32.
    mp_dtype = (jnp.bfloat16 if getattr(cfg, "compute_dtype", "") ==
                "bfloat16" else None)

    def _mp_cast(tree):
        if mp_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(mp_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def _apply_train(params, batch_stats, batch, rng):
        params = _mp_cast(params)
        if preprocess is not None:
            # deterministic on-device preprocessing (z-score, band-pass,
            # spectrograms, …) fused into the compiled step — the BASELINE
            # "host NumPy/SciPy work disappears" hook; applied identically
            # at eval time below.
            batch = {**batch, **preprocess(split_batch(batch))}
        batch = {**batch, **_mp_cast(split_batch(batch))}
        inputs = split_batch(batch)
        variables = {"params": params}
        # "losses" collects auxiliary training losses sown by modules
        # (e.g. the MoE load-balance loss, ops/moe.py); eval applies are
        # non-mutable so the sows are no-ops there.
        mutable = ["losses"]
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats", "losses"]
        out, mut = model.apply(
            variables, **inputs, train=True, rngs={"dropout": rng},
            mutable=mutable,
        )
        new_bs = mut.get("batch_stats", batch_stats)
        if mp_dtype is not None and batch_stats:
            # keep running stats at the master dtype so the scan carry's
            # dtypes are invariant across steps
            new_bs = jax.tree_util.tree_map(
                lambda n, o: n.astype(o.dtype), new_bs, batch_stats)
        aux_losses = jax.tree_util.tree_leaves(mut.get("losses", {}))
        aux = (jnp.sum(jnp.stack([jnp.asarray(a, jnp.float32).sum()
                                  for a in aux_losses]))
               if aux_losses else jnp.float32(0.0))
        return out, new_bs, aux

    def _apply_eval(params, batch_stats, batch):
        if preprocess is not None:
            batch = {**batch, **preprocess(split_batch(batch))}
        inputs = split_batch(batch)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, **inputs, train=False)

    def _loss_and_stats(params, batch_stats, batch, rng, class_weights):
        out, new_bs, aux = _apply_train(params, batch_stats, batch, rng)
        loss = loss_fn(out.logits, batch[target_key], class_weights,
                       batch.get("weight"))
        return loss + aux, new_bs

    grad_fn = jax.value_and_grad(_loss_and_stats, has_aux=True)

    accum = max(int(getattr(cfg, "grad_accum", 1) or 1), 1)
    ema_d = float(getattr(cfg, "ema_decay", 0.0) or 0.0)

    def _eff_weight(batch, class_weights):
        """Per-row effective weight matching the loss's OWN denominator
        (ops/losses.py: every loss reduces as Σ w·l / max(Σ w, 1e-8)) —
        this is what makes microbatch gradient accumulation exact."""
        lbl = batch[target_key]
        sw = batch.get("weight")
        w = (jnp.ones(lbl.shape[0], jnp.float32) if sw is None
             else sw.astype(jnp.float32))
        if (task != "regression" and cfg.loss == "weighted_ce"
                and class_weights is not None):
            w = w * class_weights.astype(jnp.float32)[lbl]
        return w

    def _scaled_loss(params, batch_stats, batch, rng, class_weights,
                     task_scale):
        """task_scale·L_micro + aux/accum — summed over microbatches this
        reproduces the full-batch objective exactly (the task term re-weights
        each microbatch's weighted-mean by its own weight-sum over the full
        batch's; the aux term, e.g. MoE load-balance, is per-microbatch by
        nature and averages)."""
        out, new_bs, aux = _apply_train(params, batch_stats, batch, rng)
        task = loss_fn(out.logits, batch[target_key], class_weights,
                       batch.get("weight"))
        return task_scale * task + aux / accum, new_bs

    accum_grad_fn = jax.value_and_grad(_scaled_loss, has_aux=True)

    def _accum_grads(params, batch_stats, batch, drop_rng, class_weights):
        """Exact gradient accumulation over ``accum`` microbatches.

        Full-batch loss = Σ_k ŵ_k·L_k / max(Σ_k w_k, ε) with
        ŵ_k = max(w_k, ε) the microbatch's own clamped denominator, so
        ∇L_full = Σ_k (ŵ_k/Ŵ)·∇L_k — each microbatch backward is scaled
        by its share of the effective weight and summed. Running BN stats
        thread through microbatches sequentially; dropout keys fold in the
        microbatch index."""
        n_rows = batch[target_key].shape[0]
        micro = n_rows // accum
        mbs = jax.tree_util.tree_map(
            lambda x: x[: micro * accum].reshape(
                accum, micro, *x.shape[1:]), batch)
        w_rows = _eff_weight(batch, class_weights)[: micro * accum]
        w_k = w_rows.reshape(accum, micro).sum(axis=1)
        denom = jnp.maximum(jnp.sum(w_k), 1e-8)
        task_scales = jnp.maximum(w_k, 1e-8) / denom

        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)

        def micro_body(acc, inp):
            gsum, lsum, bs = acc
            mb, ts, k = inp
            (sloss, new_bs), g = accum_grad_fn(
                params, bs, mb, jax.random.fold_in(drop_rng, k),
                class_weights, ts)
            gsum = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), gsum, g)
            return (gsum, lsum + sloss, new_bs), None

        (grads, loss, new_bs), _ = jax.lax.scan(
            micro_body, (zero_g, jnp.float32(0.0), batch_stats),
            (mbs, task_scales, jnp.arange(accum)))
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, params)
        return (loss, new_bs), grads

    def _train_step(carry, batch, class_weights, lr, wd):
        params, batch_stats, opt_state, ema, rng, lr_scale, stopped = carry
        rng, drop_rng, aug_rng = jax.random.split(rng, 3)
        if augment is not None:
            batch = augment(aug_rng, batch)
        if accum > 1:
            (loss, new_bs), grads = _accum_grads(
                params, batch_stats, batch, drop_rng, class_weights)
        else:
            (loss, new_bs), grads = grad_fn(params, batch_stats, batch,
                                            drop_rng, class_weights)
        updates, new_opt = tx.update(grads, opt_state, params)
        # decoupled weight decay + runtime LR (AdamW semantics). Note: a
        # fused flat-vector AdamW was tried and measured SLOWER on v5e
        # (3.05 vs 1.91 ms/step — ravel/unravel concat passes cost more
        # than per-leaf kernels at this param count); see ops/optim.py.
        step_size = lr * lr_scale
        updates = jax.tree_util.tree_map(
            lambda u, p: -step_size * (u + wd * p), updates, params)
        new_params = optax.apply_updates(params, updates)
        # freeze everything once early-stopped (static-shape early stop)
        sel = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, b, a), new, old
        )
        params = sel(new_params, params)
        batch_stats = sel(new_bs, batch_stats) if batch_stats else new_bs
        opt_state = sel(new_opt, opt_state)
        if ema_d > 0:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_d * e + (1.0 - ema_d) * p, ema, params)
            ema = sel(new_ema, ema)
        return (params, batch_stats, opt_state, ema, rng, lr_scale,
                stopped), loss

    def _eval_metrics(params, batch_stats, data):
        out = _apply_eval(params, batch_stats, data)
        w = data.get("weight")
        if task == "regression":
            return regression_metrics(out.logits, data[target_key], w)
        return binary_classification_metrics(out.logits, data[target_key], w)

    def fit(rng, train_data, eval_sets, class_weights=None,
            hyper=None, resume_carry=None) -> FitResult:
        """``hyper`` (optional dict {'lr','wd'} of scalars) overrides the
        config's optimizer hyperparameters at runtime — a vmappable axis.
        ``resume_carry`` (a previous result's ``.carry``) continues training
        from saved state instead of re-initializing."""
        lr = (hyper or {}).get("lr", cfg.learning_rate)
        wd = (hyper or {}).get("wd", cfg.weight_decay)
        n = jax.tree_util.tree_leaves(train_data)[0].shape[0]
        bsz = min(cfg.batch_size, n)
        steps = n // bsz
        used = steps * bsz
        if accum > 1 and bsz % accum:
            raise ValueError(
                f"grad_accum={accum} must divide the (effective) batch "
                f"size {bsz}")

        # --- init ---
        rng, init_rng, drop_rng = jax.random.split(rng, 3)
        init_batch = jax.tree_util.tree_map(lambda x: x[:bsz], train_data)
        variables = model.init(
            {"params": init_rng, "dropout": drop_rng},
            **split_batch(init_batch), train=True,
        )
        params = variables["params"]
        if param_sharding is not None:
            # pin a tensor-parallel layout (parallel/tensor.py) on the
            # freshly-initialized params; GSPMD propagates it through the
            # scan carry, gradients, and optimizer state from this one
            # constraint — no further annotations needed.
            params = param_sharding(params)
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        if resume_carry is not None:
            carry = resume_carry
            if param_sharding is not None:
                # re-pin the declared layout on every param-like tree in
                # the carry: a carry restored from a checkpoint arrives as
                # host arrays with NO sharding (train/resilient.py), and
                # "whatever the carry has" would silently train unsharded
                # (replicated params/opt-state — the exact memory ceiling
                # FSDP exists to remove). Matching by pytree structure
                # covers params, the best/EMA snapshots, and the optimizer
                # moments (optax mu/nu are params-shaped) without knowing
                # the optimizer's state layout.
                pdef = jax.tree_util.tree_structure(carry.params)
                is_params_like = (
                    lambda t: jax.tree_util.tree_structure(t) == pdef)
                carry = jax.tree_util.tree_map(
                    lambda t: param_sharding(t) if is_params_like(t) else t,
                    carry, is_leaf=is_params_like)
        else:
            carry = _Carry(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                rng=rng,
                best_params=params,
                best_batch_stats=batch_stats,
                best_metric=jnp.asarray(-jnp.inf, jnp.float32),
                best_epoch=jnp.asarray(-1, jnp.int32),
                bad_epochs=jnp.asarray(0, jnp.int32),
                stopped=jnp.asarray(False),
                plateau_best=jnp.asarray(jnp.inf, jnp.float32),
                plateau_bad=jnp.asarray(0, jnp.int32),
                lr_scale=jnp.asarray(1.0, jnp.float32),
                epoch=jnp.asarray(0, jnp.int32),
                ema_params=params if ema_d > 0 else (),
            )

        def epoch_body(c: _Carry, _):
            rng, perm_rng = jax.random.split(c.rng)
            perm = jax.random.permutation(perm_rng, n)[:used]
            batches = jax.tree_util.tree_map(
                lambda x: x[perm].reshape(steps, bsz, *x.shape[1:]),
                train_data,
            )
            lr_scale = (
                _cosine_scale(cfg, c.epoch)
                if cfg.schedule == "warmup_cosine"
                else c.lr_scale
            )
            (params, batch_stats, opt_state, ema, rng, _, _), losses = (
                jax.lax.scan(
                    partial(_train_step, class_weights=class_weights, lr=lr,
                            wd=wd),
                    (c.params, c.batch_stats, c.opt_state, c.ema_params, rng,
                     lr_scale, c.stopped),
                    batches,
                ))
            train_loss = jnp.mean(losses)

            # --- evaluation & selection ---
            # With EMA enabled, epoch-end evaluation and model selection use
            # the Polyak-averaged weights (so FitResult.params is the best
            # EMA snapshot); the raw weights keep training underneath.
            # CONTRACT (EMA × BatchNorm): the EMA covers PARAMS ONLY — eval
            # pairs the averaged weights with the RAW running batch_stats of
            # the same epoch (standard practice: torch.optim.swa_utils and
            # flax both leave BN stats out of the average; the running stats
            # are themselves an EMA of activation moments and track the raw
            # trajectory closely at these decay rates). FitResult therefore
            # returns (EMA params at best_epoch, raw batch_stats at
            # best_epoch) — the exact pair the selection metric was computed
            # from, pinned by tests/test_fit_extras.py::
            # test_ema_with_batchnorm_selection_contract.
            eval_params = ema if ema_d > 0 else params
            metrics_out = {"train_loss": train_loss, "lr_scale": lr_scale}
            sel_metric = -train_loss  # default: selection == 'train_loss'
            for name in eval_names:
                m = _eval_metrics(eval_params, batch_stats, eval_sets[name])
                for k, v in m.items():
                    metrics_out[f"{name}_{k}"] = v
                key = "f1" if task == "classification" else "r2"
                if cfg.selection == name:
                    sel_metric = m[key]

            improved = jnp.logical_and(
                sel_metric > c.best_metric + (cfg.min_delta if metric_mode_max else 0.0),
                ~c.stopped,
            )
            take_new = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(improved, a, b), new, old
            )
            best_params = take_new(eval_params, c.best_params)
            best_bs = (
                take_new(batch_stats, c.best_batch_stats)
                if batch_stats else batch_stats
            )
            best_metric = jnp.where(improved, sel_metric, c.best_metric)
            best_epoch = jnp.where(improved, c.epoch, c.best_epoch)
            bad = jnp.where(improved, 0, c.bad_epochs + 1)
            stopped = jnp.logical_or(c.stopped, bad >= cfg.patience)

            # plateau LR on train loss (reference scheduler input)
            if cfg.schedule == "plateau":
                p_best, p_bad, lr_scale2 = _plateau_update(
                    cfg, c.plateau_best, c.plateau_bad, lr_scale, train_loss
                )
            else:
                p_best, p_bad, lr_scale2 = c.plateau_best, c.plateau_bad, lr_scale

            new_c = _Carry(
                params=params, batch_stats=batch_stats, opt_state=opt_state,
                rng=rng, best_params=best_params, best_batch_stats=best_bs,
                best_metric=best_metric, best_epoch=best_epoch,
                bad_epochs=bad, stopped=stopped,
                plateau_best=p_best, plateau_bad=p_bad, lr_scale=lr_scale2,
                epoch=c.epoch + 1, ema_params=ema,
            )
            return new_c, metrics_out

        final, history = jax.lax.scan(epoch_body, carry, None, length=E)
        return FitResult(
            params=final.best_params,
            batch_stats=final.best_batch_stats,
            final_params=final.params,
            final_batch_stats=final.batch_stats,
            best_metric=final.best_metric,
            best_epoch=final.best_epoch,
            history=history,
            carry=final,
        )

    return fit


def fit(model, cfg: TrainConfig, rng, train_data, eval_sets,
        class_weights=None, **kw) -> FitResult:
    """Convenience one-shot (jits internally on first call per shape)."""
    fn = make_fit_fn(model, cfg, eval_names=tuple(eval_sets.keys()), **kw)
    return jax.jit(fn)(rng, train_data, eval_sets, class_weights)
