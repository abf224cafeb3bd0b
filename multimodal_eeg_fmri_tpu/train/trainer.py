"""Class-based trainer — the ``FlexibleTrainer`` API surface.

Reference: ``FlexibleTrainer`` (``CrossModal_EEG_scr.ipynb §23``) exposes
``train_one_epoch`` / ``evaluate`` / ``save_checkpoint`` / ``load_checkpoint``
with modality-dispatched forwards, weighted-CE/Focal losses, AdamW, plateau
LR and grad clipping. The functional core here is train/fit.py (whole-run
compiled scan — the fast path every driver uses); this class is the
imperative wrapper for users who want the reference's stateful,
epoch-at-a-time workflow (interactive notebooks, custom loops). Each
``train_one_epoch`` call runs one compiled epoch and keeps best-state
tracking, early stopping and the plateau controller on the host side.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from multimodal_eeg_fmri_tpu.ops.schedules import ReduceLROnPlateau
from multimodal_eeg_fmri_tpu.train.evaluate import evaluate_dataset
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn


class Trainer:
    """Stateful epoch-at-a-time trainer over the compiled fit core."""

    def __init__(
        self,
        model,
        cfg: Optional[TrainConfig] = None,
        task: str = "classification",
        augment=None,
        rng: Optional[jax.Array] = None,
    ):
        self.model = model
        self.cfg = cfg or TrainConfig()
        self.task = task
        self.rng = rng if rng is not None else jax.random.key(self.cfg.seed)
        # one-epoch compiled runs; host drives the epoch loop
        # selection/early-stop/schedule live on the host in this wrapper;
        # disarm the compiled core's own early-stop so it can't freeze
        # updates underneath the host loop
        self._one_epoch_cfg = dataclasses.replace(
            self.cfg, schedule="constant", selection="train_loss",
            patience=10**9)
        self._fit1 = jax.jit(make_fit_fn(
            self.model, self._one_epoch_cfg, num_epochs=1, task=task,
            eval_names=(), augment=augment,
        ))
        self._carry = None
        self.epoch = 0
        self.history: Dict[str, list] = {}
        self.best_metric = -np.inf
        self.best_state: Optional[Tuple[Any, Any]] = None
        self._plateau = ReduceLROnPlateau(
            factor=self.cfg.plateau_factor,
            patience=self.cfg.plateau_patience,
            min_lr_scale=self.cfg.min_lr / self.cfg.learning_rate,
        )
        self._bad_epochs = 0
        self.stopped = False

    # -- state access -------------------------------------------------------
    @property
    def params(self):
        return None if self._carry is None else self._carry.params

    @property
    def batch_stats(self):
        return None if self._carry is None else self._carry.batch_stats

    @property
    def eval_params(self):
        """Parameters used for evaluation/selection: the EMA snapshot when
        ``cfg.ema_decay>0`` (mirrors the compiled core, train/fit.py:438),
        the raw training params otherwise."""
        if self._carry is None:
            return None
        if self.cfg.ema_decay and self.cfg.ema_decay > 0:
            return self._carry.ema_params
        return self._carry.params

    def _host_lr_scale(self) -> float:
        """The LR multiplier for the NEXT epoch, computed host-side —
        mirrors the compiled core's schedule handling (train/fit.py:332)
        so the imperative API honors every ``TrainConfig.schedule``."""
        if self.cfg.schedule == "plateau":
            return float(self._plateau.scale)
        if self.cfg.schedule == "warmup_cosine":
            from multimodal_eeg_fmri_tpu.train.fit import _cosine_scale

            return float(_cosine_scale(
                self.cfg, jnp.asarray(self.epoch, jnp.int32)))
        if self.cfg.schedule == "constant":
            return 1.0
        raise ValueError(
            f"Trainer does not support schedule={self.cfg.schedule!r}")

    # -- API ---------------------------------------------------------------
    def train_one_epoch(self, train_data, class_weights=None) -> float:
        """Run one compiled epoch; returns mean train loss."""
        if self._carry is None:
            # first contact with user data: fail with actionable messages
            # instead of a traced shape error (host-side, once)
            from multimodal_eeg_fmri_tpu.data.arrays import validate_dataset

            validate_dataset(
                train_data,
                require_label=self.task == "classification",
                num_classes=getattr(self.cfg, "num_classes", 2),
                batch_size=self.cfg.batch_size, name="train_data")
        dev = jax.tree_util.tree_map(jnp.asarray, train_data)
        cw = jnp.asarray(class_weights) if class_weights is not None else None
        scale = self._host_lr_scale()
        if self._carry is None and scale != 1.0:
            # first epoch must already run at the scheduled scale (e.g.
            # cosine warmup epoch 0 = 1/warmup_epochs, not 1.0) — build
            # the carry up front so lr_scale can be set before training
            self._carry = self._init_carry(train_data)
        if self._carry is not None:
            self._carry = self._carry.replace(
                lr_scale=jnp.asarray(scale, jnp.float32))
        res = self._fit1(self.rng, dev, {}, cw, None, self._carry)
        self._carry = res.carry
        self.rng = res.carry.rng
        loss = float(np.asarray(res.history["train_loss"])[0])
        self.history.setdefault("train_loss", []).append(loss)
        self.epoch += 1
        if self.cfg.schedule == "plateau":
            self._plateau.step(loss)
        return loss

    def evaluate(self, data) -> Dict[str, float]:
        """Full-dataset evaluation with the current params."""
        metrics, _ = evaluate_dataset(
            self.model, self.eval_params, self._carry.batch_stats,
            jax.tree_util.tree_map(jnp.asarray, data), task=self.task)
        out = {k: float(v) for k, v in metrics.items()}
        for k, v in out.items():
            self.history.setdefault(k, []).append(v)
        return out

    def update_best(self, metric: float) -> bool:
        """Best-state tracking + early-stopping bookkeeping (the
        reference's deepcopy-on-improvement, here a device-array ref)."""
        improved = metric > self.best_metric + self.cfg.min_delta
        if improved:
            self.best_metric = metric
            self.best_state = (self.eval_params, self._carry.batch_stats)
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs >= self.cfg.patience:
                self.stopped = True
        return improved

    def fit(self, train_data, val_data=None, class_weights=None,
            metric: str = "f1") -> Dict[str, list]:
        """Reference-style epoch loop with early stopping. For production
        runs prefer train.fit (one compiled scan, no host round-trips)."""
        for _ in range(self.cfg.num_epochs):
            if self.stopped:
                break
            loss = self.train_one_epoch(train_data, class_weights)
            if val_data is not None:
                m = self.evaluate(val_data)
                self.update_best(m[metric])
            else:
                self.update_best(-loss)
        return self.history

    # -- persistence --------------------------------------------------------
    def _init_carry(self, train_data):
        """Build a fresh (untrained) carry with the same structure the
        compiled core produces — params init on the first batch + optimizer
        state — so checkpoints can be restored BEFORE any training."""
        from multimodal_eeg_fmri_tpu.train.fit import (
            _base_tx,
            _Carry,
            split_batch,
        )

        dev = jax.tree_util.tree_map(jnp.asarray, train_data)
        n = jax.tree_util.tree_leaves(dev)[0].shape[0]
        bsz = min(self.cfg.batch_size, n)
        rng, init_rng, drop_rng = jax.random.split(self.rng, 3)
        init_batch = jax.tree_util.tree_map(lambda x: x[:bsz], dev)
        variables = self.model.init(
            {"params": init_rng, "dropout": drop_rng},
            **split_batch(init_batch), train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = _base_tx(self._one_epoch_cfg).init(params)
        return _Carry(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            rng=rng, best_params=params, best_batch_stats=batch_stats,
            best_metric=jnp.asarray(-jnp.inf, jnp.float32),
            best_epoch=jnp.asarray(-1, jnp.int32),
            bad_epochs=jnp.asarray(0, jnp.int32),
            stopped=jnp.asarray(False),
            plateau_best=jnp.asarray(jnp.inf, jnp.float32),
            plateau_bad=jnp.asarray(0, jnp.int32),
            lr_scale=jnp.asarray(1.0, jnp.float32),
            epoch=jnp.asarray(0, jnp.int32),
            # the compiled core seeds the Polyak average with the initial
            # params when EMA is on (train/fit.py:409); a () placeholder
            # here would be a pytree-structure mismatch against _fit1
            ema_params=params if (self.cfg.ema_decay or 0) > 0 else (),
        )

    def save_checkpoint(self, path: str | Path,
                        metrics: Optional[Dict[str, float]] = None) -> Path:
        """Full-state checkpoint: best params in the main slot (what
        downstream consumers load), PLUS the live training state —
        current params/batch_stats/optimizer/rng and the host-side
        controller (epoch, best metric, early-stop and plateau state) —
        so resuming continues bit-exactly (the reference restores
        model+optimizer+scheduler, ``CrossModal_EEG_scr.ipynb §23``)."""
        params, bs = (self.best_state if self.best_state is not None
                      else (self._carry.params, self._carry.batch_stats))
        extra = {
            "cur_params": self._carry.params,
            "cur_batch_stats": self._carry.batch_stats,
            "rng": jax.random.key_data(self._carry.rng),
        }
        if (self.cfg.ema_decay or 0) > 0:
            extra["ema_params"] = self._carry.ema_params
        trainer_state = {
            "epoch": self.epoch,
            "best_metric": float(self.best_metric),
            "bad_epochs": self._bad_epochs,
            "stopped": bool(self.stopped),
            "plateau": {"best": self._plateau.best,
                        "bad_epochs": self._plateau.bad_epochs,
                        "scale": self._plateau.scale},
            "history": {k: [float(v) for v in vs]
                        for k, vs in self.history.items()},
        }
        return save_checkpoint(
            path, params, batch_stats=bs,
            opt_state=self._carry.opt_state, step=self.epoch,
            metrics=metrics or {"best_metric": float(self.best_metric)},
            metadata={"trainer_state": trainer_state},
            extra=extra,
        )

    def load_checkpoint(self, path: str | Path, train_data=None) -> None:
        """Restore the FULL trainer state (params, batch stats, optimizer
        moments, rng, epoch counter, best/early-stop/plateau controllers).
        Works before any training when ``train_data`` (or any batch with
        the right shapes) is supplied to build the state structure."""
        if self._carry is None:
            if train_data is None:
                raise RuntimeError(
                    "no training state yet — pass train_data so the "
                    "optimizer/param structure can be built, or call "
                    "train_one_epoch/fit first")
            self._carry = self._init_carry(train_data)

        def _restore(with_ema: bool):
            template = {
                "params": self._carry.params,
                "batch_stats": self._carry.batch_stats,
                "opt_state": self._carry.opt_state,
                "step": np.asarray(0),
                "extra": {
                    "cur_params": self._carry.params,
                    "cur_batch_stats": self._carry.batch_stats,
                    "rng": jax.random.key_data(self._carry.rng),
                },
            }
            if with_ema:
                # params-shaped template even when this trainer has EMA
                # off — carry.ema_params is () then
                template["extra"]["ema_params"] = self._carry.params
            return load_checkpoint(path, template=template)

        want_ema = (self.cfg.ema_decay or 0) > 0
        try:
            restored = _restore(want_ema)
        except ValueError:
            # the checkpoint was written with the OPPOSITE EMA setting —
            # orbax rejects the structure mismatch in either direction.
            # Retry with the other template; a restored-but-unwanted EMA
            # tree is simply dropped, and a missing-but-wanted one is
            # re-seeded from the restored live params below.
            restored = _restore(not want_ema)
        extra = restored.get("extra") or {}
        cur_params = extra.get("cur_params", restored["params"])
        cur_bs = extra.get("cur_batch_stats",
                           restored.get("batch_stats", {}))
        self._carry = self._carry.replace(
            params=cur_params,
            batch_stats=cur_bs,
            opt_state=restored.get("opt_state", self._carry.opt_state),
        )
        if "rng" in extra:
            rng = jax.random.wrap_key_data(jnp.asarray(extra["rng"]))
            self._carry = self._carry.replace(rng=rng)
            self.rng = rng
        if (self.cfg.ema_decay or 0) > 0:
            # older checkpoints may predate EMA: re-seed from the restored
            # live params (the compiled core's own initialization choice)
            self._carry = self._carry.replace(
                ema_params=extra.get("ema_params", cur_params))
        # best-state: the main params slot holds the best snapshot
        self.best_state = (restored["params"],
                           restored.get("batch_stats", {}))

        ts = (restored.get("metadata") or {}).get("trainer_state")
        if ts:
            self.epoch = int(ts["epoch"])
            self.best_metric = float(ts["best_metric"])
            self._bad_epochs = int(ts["bad_epochs"])
            self.stopped = bool(ts["stopped"])
            p = ts.get("plateau") or {}
            self._plateau.best = p.get("best")
            self._plateau.bad_epochs = int(p.get("bad_epochs", 0))
            self._plateau.scale = float(p.get("scale", 1.0))
            self.history = {k: list(v)
                            for k, v in (ts.get("history") or {}).items()}
