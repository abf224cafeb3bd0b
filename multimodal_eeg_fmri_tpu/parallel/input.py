"""Per-process input feeding for multi-host meshes.

The reference is single-process: its DataLoaders materialize every fold's
tensors in one host's memory (`EEG_CODE/run_training_lite.py` /
`_test_bridge.py` train loops). On a multi-host mesh that pattern breaks
twice — no single host can hold a pod-scale dataset, and device_put from
one host cannot populate other hosts' addressable shards.

This module is the TPU-native replacement: each process LOADS ONLY the
fold/batch rows that land on its own devices, and
``jax.make_array_from_process_local_data`` assembles the global
``jax.Array`` view from those per-process shards without any host ever
materializing the global array. Layout contracts match `parallel/mesh.py`
(fold axis → ``ensemble`` mesh axis, batch axis → ``data``) and
`parallel/distributed.build_hybrid_mesh` (ensemble axis is the
DCN/process dimension — so a process's local folds are a CONTIGUOUS block
of the global fold axis, which is exactly what a per-subject file loader
wants to glob).

Single-process runs degrade to the whole-array case (local == global), so
the same code path serves 1 chip, 1 slice, and N hosts unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np

from multimodal_eeg_fmri_tpu.parallel.mesh import (
    MeshPlan,
    batch_sharding,
    ensemble_sharding,
)


def process_fold_range(
    n_folds: int,
    plan: Optional[MeshPlan] = None,
    process_index: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> Tuple[int, int]:
    """[lo, hi) of the global fold axis that THIS process must load.

    Folds map to the ensemble mesh axis outermost-first (the hybrid mesh
    puts the process/DCN dimension outermost), so each process owns a
    contiguous block of ``n_folds / num_processes`` folds. ``n_folds``
    must divide evenly — fold padding to the mesh size happens upstream
    (``train.cv`` pads fold COUNT the same way batches pad rows).
    """
    if process_index is None:
        process_index = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    if plan is not None and plan.n_ensemble % num_processes:
        raise ValueError(
            f"ensemble axis ({plan.n_ensemble}) not divisible by process "
            f"count ({num_processes}) — use build_hybrid_mesh sizing")
    if n_folds % num_processes:
        raise ValueError(
            f"{n_folds} folds not divisible by {num_processes} processes; "
            "pad the fold list to the mesh's ensemble size first")
    per = n_folds // num_processes
    return process_index * per, (process_index + 1) * per


def global_ensemble_tree(plan: MeshPlan, local_tree: Any,
                         n_global_folds: Optional[int] = None) -> Any:
    """Assemble global fold-stacked arrays from per-process local stacks.

    ``local_tree``: pytree of numpy/jax arrays whose leading axis is this
    process's OWN folds (the ``process_fold_range`` block), in global fold
    order. Returns a pytree of global ``jax.Array``s sharded like
    ``shard_ensemble_tree`` would produce — but assembled from every
    process's local data rather than one host's global copy.
    """
    n_local = jax.tree_util.tree_leaves(local_tree)[0].shape[0]
    n_global = n_global_folds or n_local * jax.process_count()

    def make(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            ensemble_sharding(plan, x.ndim), x, (n_global,) + x.shape[1:])

    return jax.tree_util.tree_map(make, local_tree)


def global_batch_tree(plan: MeshPlan, local_tree: Any,
                      n_global_rows: Optional[int] = None) -> Any:
    """Same as ``global_ensemble_tree`` for a DATA-sharded batch: each
    process contributes its own rows of the global batch (single-fold DP
    across hosts — only valid when the data axis spans processes, i.e. a
    non-hybrid mesh; with ``build_hybrid_mesh`` DP stays inside one host
    and this is just a local device_put)."""
    n_local = jax.tree_util.tree_leaves(local_tree)[0].shape[0]
    n_global = n_global_rows or n_local * jax.process_count()

    def make(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            batch_sharding(plan, x.ndim), x, (n_global,) + x.shape[1:])

    return jax.tree_util.tree_map(make, local_tree)
