"""Pytree helpers.

``count_parameters`` is the reference utility
(``crossmodal_v4_enhancements.py:606-608``); the rest support mixed-precision
and memory accounting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_parameters(params) -> int:
    """Total number of elements across a params pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves (inputs/activations for bf16 compute);
    integer leaves pass through."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
