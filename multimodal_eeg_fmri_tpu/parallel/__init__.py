"""Device mesh, shardings and collective helpers.

The reference has no distributed execution at all (SURVEY §2.3); this package
is the TPU-native equivalent the rebuild owns explicitly: a single module
constructs the mesh, names the axes, and wraps the collectives, so every
other subsystem is mesh-agnostic.
"""

from multimodal_eeg_fmri_tpu.parallel.mesh import (
    MeshPlan,
    build_mesh,
    batch_sharding,
    ensemble_sharding,
    replicated,
    shard_batch,
)
from multimodal_eeg_fmri_tpu.parallel.collectives import (
    pmean_grads,
    psum,
    all_gather,
)
from multimodal_eeg_fmri_tpu.parallel.input import (
    global_batch_tree,
    global_ensemble_tree,
    process_fold_range,
)
from multimodal_eeg_fmri_tpu.parallel.distributed import (
    build_hybrid_mesh,
    initialize_distributed,
)
from multimodal_eeg_fmri_tpu.parallel.tensor import (
    TPPlan,
    build_tp_mesh,
    shard_params_tp,
    tp_param_constraint,
    tp_param_specs,
)
from multimodal_eeg_fmri_tpu.parallel.fsdp import (
    fsdp_param_constraint,
    fsdp_param_specs,
    shard_params_fsdp,
)
from multimodal_eeg_fmri_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_stage_params,
)
from multimodal_eeg_fmri_tpu.parallel.expert import (
    EPPlan,
    build_ep_mesh,
    ep_param_constraint,
    ep_param_specs,
    shard_params_ep,
)

__all__ = [
    "EPPlan",
    "fsdp_param_constraint",
    "fsdp_param_specs",
    "shard_params_fsdp",
    "build_ep_mesh",
    "ep_param_constraint",
    "ep_param_specs",
    "shard_params_ep",
    "pipeline_apply",
    "shard_stage_params",
    "TPPlan",
    "build_tp_mesh",
    "shard_params_tp",
    "tp_param_constraint",
    "tp_param_specs",
    "MeshPlan",
    "build_mesh",
    "build_hybrid_mesh",
    "initialize_distributed",
    "batch_sharding",
    "ensemble_sharding",
    "replicated",
    "shard_batch",
    "pmean_grads",
    "psum",
    "all_gather",
    "global_batch_tree",
    "global_ensemble_tree",
    "process_fold_range",
]
