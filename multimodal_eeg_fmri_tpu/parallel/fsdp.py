"""Fully-sharded data parallelism (FSDP / ZeRO-3) over the ``data`` axis.

Plain data parallelism replicates parameters, gradients, and optimizer
state on every device in the ``data`` axis — for the production EEG models
(0.4-1.3M params, SURVEY §2.3) that is free, but the long-context /
wide-`d_model` headroom path (docs/DESIGN.md flash table) triples the
parameter state (params + Adam mu/nu) and replication becomes the HBM
ceiling before activations do.

FSDP shards that state over the SAME mesh axis the batch is already
sharded over. TPU-native expression: pure ``NamedSharding`` annotations on
the parameter tree (one ``with_sharding_constraint`` at init — the
``make_fit_fn(param_sharding=...)`` hook), exactly like tensor parallelism
(parallel/tensor.py). XLA's SPMD partitioner then derives the ZeRO-3
schedule itself:

- forward/backward: parameters are **all-gathered** just before each use
  (and the gathered copy is freed after — peak param memory is one layer,
  not the model);
- backward: gradients of sharded params are **reduce-scattered** instead
  of all-reduced (each device keeps only its shard's sum);
- optimizer: Adam mu/nu inherit the param layout through ``tx.init`` and
  the scan carry, so the update step runs on 1/n-th of the state per
  device with zero extra communication.

We never write a collective; the layout IS the algorithm. Unlike
Megatron TP (which keys on module names), FSDP is shape-driven: every
float leaf big enough to matter is sharded along its largest
``n_shard``-divisible dimension, and everything else stays replicated
(correct, just not sharded — same convention as parallel/tensor.py).

Composes with TP: ``fsdp_param_specs(..., base=tp_param_specs(...))``
extends each leaf's Megatron spec along a FREE dimension, giving the
classic 2D (data-sharded × model-sharded) weight layout on a
(data, model) mesh.

Reference analogue: none — the reference is single-GPU torch; this is
TPU-native scaling surface (SURVEY §2.3, §5 "Distributed backend").
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import jax

DATA_AXIS = "data"

# Leaves smaller than this many elements stay replicated: sharding a
# 75-element bias saves nothing and costs an all-gather dispatch. 2**11
# (= 8 KiB of f32) is far below any kernel worth sharding and far above
# every bias/norm scale in the model zoo.
DEFAULT_MIN_SIZE = 2 ** 11


def fsdp_spec(
    shape: tuple,
    n_shard: int,
    *,
    axis: str = DATA_AXIS,
    base: Optional[P] = None,
    min_size: int = DEFAULT_MIN_SIZE,
) -> P:
    """PartitionSpec sharding ``shape``'s largest free dim over ``axis``.

    ``base`` (e.g. a Megatron spec from ``parallel.tensor.tp_spec``) is
    extended, never overwritten: only dimensions ``base`` leaves
    unconstrained are candidates. Returns ``base`` unchanged when the leaf
    is too small or no dimension divides ``n_shard``.
    """
    ndim = len(shape)
    entries = list(base) if base is not None else []
    entries += [None] * (ndim - len(entries))
    if int(np.prod(shape, dtype=np.int64)) < min_size:
        return P(*entries) if any(e is not None for e in entries) else P()
    cands = [d for d in range(ndim)
             if entries[d] is None and shape[d] % n_shard == 0]
    if not cands:
        return P(*entries) if any(e is not None for e in entries) else P()
    d = max(cands, key=lambda i: shape[i])
    entries[d] = axis
    return P(*entries)


def _iter_specs(params: Any, n_shard: int, axis: str, base: Any,
                min_size: int):
    flat = traverse_util.flatten_dict(params)
    base_flat = (traverse_util.flatten_dict(base) if base is not None
                 else {})
    for path, leaf in flat.items():
        dt = getattr(leaf, "dtype", None)
        if dt is None:
            dt = np.asarray(leaf).dtype
        if not np.issubdtype(dt, np.floating):
            yield path, leaf, P()
            continue
        yield path, leaf, fsdp_spec(
            np.shape(leaf), n_shard, axis=axis,
            base=base_flat.get(path), min_size=min_size)


def fsdp_param_specs(
    params: Any,
    n_shard: int,
    *,
    axis: str = DATA_AXIS,
    base: Any = None,
    min_size: int = DEFAULT_MIN_SIZE,
) -> Any:
    """Pytree (nested dict) of PartitionSpec matching ``params``.

    ``base`` is an optional spec tree (same structure) to extend — pass
    ``parallel.tensor.tp_param_specs(params, n_model)`` to get the 2D
    FSDP×TP layout.
    """
    out = {p: s for p, _, s in _iter_specs(params, n_shard, axis, base,
                                           min_size)}
    return traverse_util.unflatten_dict(out)


def shard_params_fsdp(params: Any, mesh: Mesh, *, axis: str = DATA_AXIS,
                      base: Any = None,
                      min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """Device-put a host/replicated param tree with the FSDP layout
    (serving/eval entry — training uses ``fsdp_param_constraint``)."""
    n_shard = mesh.shape[axis]
    out = {
        p: jax.device_put(leaf, NamedSharding(mesh, s))
        for p, leaf, s in _iter_specs(params, n_shard, axis, base, min_size)
    }
    return traverse_util.unflatten_dict(out)


def fsdp_param_constraint(mesh: Mesh, *, axis: str = DATA_AXIS,
                          tp: bool = False,
                          min_size: int = DEFAULT_MIN_SIZE):
    """A ``params → params`` hook for ``make_fit_fn(param_sharding=...)``.

    Pins the FSDP layout on the freshly-initialized params inside the
    compiled run; GSPMD propagates it through the scan carry, gradients
    (reduce-scatter), and optimizer state from this one constraint.

    ``tp=True`` composes with Megatron sharding on a (data, model) mesh:
    attention/FFN params shard over BOTH axes, everything else over
    ``data`` only.
    """
    n_shard = mesh.shape[axis]

    def constrain(params):
        base = None
        if tp:
            from multimodal_eeg_fmri_tpu.parallel.tensor import (
                tp_param_specs,
            )
            base = tp_param_specs(params, mesh.shape["model"])
        out = {
            p: jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, s))
            for p, leaf, s in _iter_specs(params, n_shard, axis, base,
                                          min_size)
        }
        return traverse_util.unflatten_dict(out)

    return constrain
