"""Multi-host (DCN-spanning) runtime glue.

The reference is strictly single-process (SURVEY §2.3: no torch.distributed,
no NCCL/MPI). Single-slice ICI covers its model sizes, but the framework's
mesh layer was designed so a DCN-spanning mesh is a drop-in change
(parallel/mesh.py docstring); this module is that drop-in:

- ``initialize_distributed``: idempotent wrapper over
  ``jax.distributed.initialize`` — the JAX-native equivalent of a
  NCCL/MPI process-group init. On a TPU pod slice all arguments
  auto-detect from the TPU metadata; explicit args support CPU/GPU
  multi-process runs.
- ``build_hybrid_mesh``: a 2D (ensemble, data) mesh where the **ensemble
  axis spans DCN** and the data axis stays inside each host's ICI domain.
  That orientation is load-bearing: ensemble members (CV folds, HPO
  trials) are independent — zero cross-member collective traffic on the
  hot path — so the slow DCN links carry nothing per step, while DP's
  per-step gradient psum rides ICI. This is the standard
  fast-axis-inside / slow-axis-outside hybrid layout
  (``mesh_utils.create_hybrid_device_mesh``).

Everything downstream consumes the same ``MeshPlan``; no caller changes.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from multimodal_eeg_fmri_tpu.parallel.mesh import (
    DATA_AXIS, ENSEMBLE_AXIS, MeshPlan, build_mesh)

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Initialize the JAX distributed runtime (idempotent).

    Returns the process count. With no arguments on a TPU pod slice,
    everything auto-detects; a single-process run (the common case in this
    repo) is a no-op returning 1. Call BEFORE any other jax API touches
    devices — jax.distributed.initialize requires an uninitialized backend.
    """
    global _initialized
    if _initialized:
        return jax.process_count()
    if coordinator_address is None and num_processes in (None, 1):
        # Single-process: nothing to set up; jax.process_count() == 1.
        _initialized = True
        return 1
    try:
        # CPU multi-process needs a cross-process collectives backend;
        # gloo ships with jaxlib. A no-op for TPU/GPU platforms, where
        # collectives ride ICI/NCCL (examples/multihost_cpu.py runs this
        # path for real with process_count == 2).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jaxlib without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())
    return jax.process_count()


def build_hybrid_mesh(
    ensemble: int = 0,
    data: int = 0,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshPlan:
    """Build a 2D (ensemble, data) mesh that spans hosts over DCN.

    ``ensemble``/``data`` are GLOBAL axis sizes (0 = infer, same rules as
    ``build_mesh``). The ensemble axis is assigned the DCN (cross-host)
    dimension and the data axis the ICI (intra-host) dimension, so
    per-step DP collectives never cross a host boundary. Requires the data
    axis to fit inside one host's device count; falls back to the flat
    single-granule mesh when only one process is present.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    # DCN granule: TPU multi-slice exposes slice_index (ICI spans a whole
    # slice, even multi-host); otherwise the process is the granule.
    if getattr(devices[0], "slice_index", None) is not None:
        granules = {int(d.slice_index) for d in devices}
        process_is_granule = False
    else:
        granules = {int(getattr(d, "process_index", 0)) for d in devices}
        process_is_granule = True
    n_proc = len(granules)
    per_proc = n // n_proc

    if ensemble <= 0 and data <= 0:
        ensemble, data = n, 1
    elif ensemble <= 0:
        ensemble = n // data
    elif data <= 0:
        data = n // ensemble
    if ensemble * data != n:
        raise ValueError(f"mesh {ensemble}x{data} != {n} devices")

    if n_proc == 1:
        return build_mesh(devices, ensemble=ensemble, data=data)

    if data > per_proc or per_proc % data:
        raise ValueError(
            f"data axis ({data}) must divide one granule's device count "
            f"({per_proc}) so DP collectives stay on ICI")
    if ensemble % n_proc:
        raise ValueError(
            f"ensemble axis ({ensemble}) must be a multiple of the granule "
            f"count ({n_proc}) to span DCN evenly")
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(ensemble // n_proc, data),
        dcn_mesh_shape=(n_proc, 1),
        devices=devices,
        process_is_granule=process_is_granule,
    )
    return MeshPlan(Mesh(np.asarray(arr), (ENSEMBLE_AXIS, DATA_AXIS)))
