"""PRNG-key discipline.

Replaces the reference's global seeding (``EEG_CODE/config.py:97-105``
``set_seed``: torch/numpy/random + deterministic cuDNN) with JAX's explicit
key-splitting model. A single root seed determinizes the whole run — data
splits (host numpy), parameter init, dropout, and augmentation each get a
named, independently-split stream so adding consumers never perturbs others.
"""

from __future__ import annotations

import random
from typing import Dict

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host-side RNGs (numpy/random — used for sklearn splits) and
    return the root JAX key. The device side needs no global seeding: all
    device randomness flows through explicit keys."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def training_key(seed: int) -> jax.Array:
    """Root key for TRAINING randomness (dropout masks, augmentation,
    shuffles) using the ``rbg`` generator: on v5e the default threefry
    PRNG costs 0.74 ms of the 1.86 ms fused train step (40%! — dropout
    masks are regenerated in forward and backward every step); rbg is
    hardware-accelerated and cuts the measured step to 1.26 ms (−32%).

    rbg is deterministic per (key, shape) on a fixed backend but its bit
    stream is not guaranteed stable across XLA versions/backends — fine for
    dropout/augment noise, NOT for anything that must replay bit-exactly
    across environments (use the default ``jax.random.key`` there, e.g.
    parameter init and the determinism harness)."""
    return jax.random.key(seed, impl="rbg")


class RngStream:
    """Named, replay-stable PRNG streams.

    ``stream.next("dropout")`` returns a fresh key each call; keys for
    different names are independent; the sequence for a given name depends
    only on (root seed, name, call index) so runs replay exactly regardless
    of interleaving with other streams.
    """

    def __init__(self, root: jax.Array):
        self._root = root
        self._counters: Dict[str, int] = {}

    def next(self, name: str) -> jax.Array:
        idx = self._counters.get(name, 0)
        self._counters[name] = idx + 1
        named = jax.random.fold_in(self._root, _stable_hash(name))
        return jax.random.fold_in(named, idx)

    def fold(self, name: str) -> "RngStream":
        """Child stream for a sub-scope (e.g. per fold)."""
        return RngStream(jax.random.fold_in(self._root, _stable_hash(name)))


def _stable_hash(name: str) -> int:
    """Deterministic 31-bit hash (python's hash() is salted per process)."""
    h = 2166136261
    for ch in name.encode():
        h = (h ^ ch) * 16777619 & 0xFFFFFFFF
    return h & 0x7FFFFFFF
