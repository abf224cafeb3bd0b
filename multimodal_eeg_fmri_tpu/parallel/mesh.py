"""Mesh construction and sharding plans.

Design (SURVEY §2.3): the models are small (0.4M-1.3M params) and batches are
tiny, so tensor/pipeline parallelism would be pure overhead. The two axes
that genuinely scale this workload on a TPU slice are:

- ``ensemble``: independent model replicas — CV folds, LOOCV subjects, HPO
  trials, ensemble members. The reference trains them *sequentially*
  (4 models × 5 folds EEG, 32 LOOCV bridge folds); here they are a sharded
  leading axis, so a v5e-8 trains 8 folds at the wall-clock cost of one.
- ``data``: classic DP over the batch; gradients reduce with ``psum`` over
  ICI.

Both axes live in one ``jax.sharding.Mesh``; everything downstream consumes a
``MeshPlan`` and never touches device lists directly, so a DCN-spanning mesh
remains a drop-in change.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = "ensemble"
DATA_AXIS = "data"


@dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the framework's canonical axis names."""

    mesh: Mesh
    ensemble_axis: str = ENSEMBLE_AXIS
    data_axis: str = DATA_AXIS

    @property
    def n_ensemble(self) -> int:
        return self.mesh.shape[self.ensemble_axis]

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_devices(self) -> int:
        return self.n_ensemble * self.n_data


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    ensemble: int = 0,
    data: int = 0,
) -> MeshPlan:
    """Build a 2D (ensemble, data) mesh.

    ``ensemble=0`` / ``data=0`` infer sizes: by default all devices go to the
    ensemble axis (fold parallelism is the headline win for this workload)
    and DP gets the remainder when an explicit ``ensemble`` leaves one.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if ensemble <= 0 and data <= 0:
        ensemble, data = n, 1
    elif ensemble <= 0:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        ensemble = n // data
    elif data <= 0:
        if n % ensemble:
            raise ValueError(f"{n} devices not divisible by ensemble={ensemble}")
        data = n // ensemble
    if ensemble * data != n:
        raise ValueError(f"mesh {ensemble}x{data} != {n} devices")
    arr = np.asarray(devices).reshape(ensemble, data)
    return MeshPlan(Mesh(arr, (ENSEMBLE_AXIS, DATA_AXIS)))


def replicated(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P())


def batch_sharding(plan: MeshPlan, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(plan.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def ensemble_sharding(plan: MeshPlan, ndim: int = 1) -> NamedSharding:
    """Shard the leading (fold/trial/member) dim over the ensemble axis."""
    return NamedSharding(plan.mesh, P(ENSEMBLE_AXIS, *([None] * (ndim - 1))))


def ensemble_batch_sharding(plan: MeshPlan, ndim: int = 2) -> NamedSharding:
    """Shard dim0 over ensemble and dim1 over data — the layout of
    fold-stacked batches ``(n_folds, batch, ...)``."""
    return NamedSharding(
        plan.mesh, P(ENSEMBLE_AXIS, DATA_AXIS, *([None] * (ndim - 2)))
    )


def shard_batch(plan: MeshPlan, tree):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(plan, np.ndim(x))), tree
    )


def shard_ensemble_tree(plan: MeshPlan, tree):
    """Device-put a pytree whose leaves have a leading ensemble axis
    (e.g. fold-stacked params) sharded over the ensemble axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, ensemble_sharding(plan, np.ndim(x))), tree
    )


def ensemble_vmap(fn, plan: MeshPlan, in_axes=0):
    """Fold-parallel execution as MANUAL SPMD: ``vmap(fn)`` inside a
    ``shard_map`` over the ensemble axis.

    Every argument and result leaf must carry a leading fold axis divisible
    by ``plan.n_ensemble``. Each ensemble group runs its local folds'
    programs entirely locally — zero collectives, zero partitioner
    choices — so the sharded result equals the plain ``jit(vmap(fn))``
    run per fold (to ≤1-ulp compile-tiling reassociation).

    Why not GSPMD auto-partitioning of the vmapped fold axis: jax 0.9.0's
    XLA SPMD partitioner (BOTH Shardy and GSPMD propagation)
    **miscompiles** vmapped stacked-conv models whose operands are sharded
    along the vmap axis — every fold's output collapses to one value that
    is correct for NO fold (measured max|Δ| ≈ 2-6 on O(1) activations; see
    docs/DESIGN.md "Partitioner pin" and
    tests/test_partitioner_regression.py). shard_map sidesteps the
    partitioner entirely and is the idiomatic form for an embarrassingly
    parallel axis anyway. Leaves the ``data`` axis unmentioned — inputs
    replicate across it (fold compute is duplicated per data-group; use
    ``data=1`` meshes for pure fold sweeps).

    ``in_axes`` follows ``jax.vmap``: args whose entry is ``None`` are
    SHARED across folds (replicated into every group); anything else maps
    fold axis 0 (and is sharded over ``ensemble``).
    """
    vfn = jax.vmap(fn, in_axes=in_axes)

    def call(*args):
        axes = (tuple(in_axes) if isinstance(in_axes, (tuple, list))
                else (in_axes,) * len(args))
        spec = tuple(
            jax.tree_util.tree_map(
                lambda _: P() if ax is None else P(ENSEMBLE_AXIS), a)
            for a, ax in zip(args, axes))
        return jax.shard_map(
            vfn, mesh=plan.mesh, in_specs=spec,
            out_specs=P(ENSEMBLE_AXIS), check_vma=False,
        )(*args)

    return call
