"""Collective wrappers.

The single place where axis names meet ``jax.lax`` collectives. The reference
has no communication backend (SURVEY §2.3/§5); this module is its TPU-native
equivalent: DP gradient reduction (`pmean_grads`) and the raw collectives used
by shard_map'd steps, all expressed over the named mesh axes so XLA lowers
them onto ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax import lax

from multimodal_eeg_fmri_tpu.parallel.mesh import DATA_AXIS


def psum(x: Any, axis_name: str = DATA_AXIS):
    return jax.tree_util.tree_map(lambda v: lax.psum(v, axis_name), x)


def pmean(x: Any, axis_name: str = DATA_AXIS):
    return jax.tree_util.tree_map(lambda v: lax.pmean(v, axis_name), x)


def pmean_grads(grads: Any, axis_name: str = DATA_AXIS):
    """DP gradient allreduce (the NCCL-allreduce equivalent, over ICI)."""
    return pmean(grads, axis_name)


def all_gather(x: Any, axis_name: str = DATA_AXIS, axis: int = 0):
    return jax.tree_util.tree_map(
        lambda v: lax.all_gather(v, axis_name, axis=axis, tiled=True), x
    )


def ppermute_shift(x: Any, axis_name: str, shift: int = 1):
    """Ring shift along a mesh axis (building block for pipelined exchange)."""
    def _shift(v):
        n = lax.axis_size(axis_name)
        perm = [(i, (i + shift) % n) for i in range(n)]
        return lax.ppermute(v, axis_name, perm)

    return jax.tree_util.tree_map(_shift, x)
