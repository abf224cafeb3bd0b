"""Learning-rate schedules.

The reference uses two schedulers (SURVEY §1 L3): torch
``ReduceLROnPlateau`` (EEG trainer / fMRI / bridge) and a hand-rolled
warmup+cosine (``crossmodal_v4_enhancements.py:1084-1112``). Warmup-cosine
maps directly onto an optax schedule (pure function of step — jit-friendly).
Plateau scheduling is *metric-driven* so it cannot be a function of step; we
implement it as a functional controller whose scale factor is fed into the
jitted step as a scalar argument (no recompilation when the LR changes).
"""

from __future__ import annotations

from dataclasses import dataclass

import optax


def warmup_cosine_schedule(
    base_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    steps_per_epoch: int = 1,
    min_lr: float = 1e-6,
) -> optax.Schedule:
    """Linear warmup then cosine decay to ``min_lr`` — semantics of the
    reference ``CosineAnnealingWarmup`` (linear ramp over ``warmup_epochs``,
    cosine from base_lr to min_lr over the remainder)."""
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    total_steps = max(warmup_steps + 1, total_epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr / warmup_steps,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )


@dataclass
class ReduceLROnPlateau:
    """Host-side plateau controller mirroring torch's ReduceLROnPlateau
    (mode='min' on training loss, as used in ``CrossModal_EEG_scr.ipynb §23``
    and ``run_fmri_v11.py:833-856``). Emits a multiplicative LR scale that the
    train step consumes as a runtime scalar."""

    factor: float = 0.5
    patience: int = 5
    min_lr_scale: float = 1e-3
    threshold: float = 1e-4
    mode: str = "min"

    def __post_init__(self):
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "min" and metric < self.best - self.threshold)
            or (self.mode == "max" and metric > self.best + self.threshold)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr_scale)
                self.bad_epochs = 0
        return self.scale


@dataclass
class EarlyStopping:
    """Standalone early-stopping controller for host-driven loops
    (reference ``EarlyStopping``, ``crossmodal_v4_enhancements.py:1115-1143``).
    The compiled fit (train/fit.py) implements the same policy on device."""

    patience: int = 10
    min_delta: float = 1e-3
    mode: str = "max"

    def __post_init__(self):
        self.counter = 0
        self.best_score = None
        self.should_stop = False

    def __call__(self, score: float) -> bool:
        if self.best_score is None:
            self.best_score = score
            return False
        improved = (
            score > self.best_score + self.min_delta
            if self.mode == "max"
            else score < self.best_score - self.min_delta
        )
        if improved:
            self.best_score = score
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
