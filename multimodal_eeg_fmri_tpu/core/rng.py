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
