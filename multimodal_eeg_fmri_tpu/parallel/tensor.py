"""Tensor (model) parallelism: Megatron-style parameter sharding via GSPMD.

The production models are tiny (0.4-1.3M params, SURVEY §2.3), so TP is OFF
by default — the ensemble and data axes are what scale the reference's
workload. TP exists for the long-context headroom path (flash attention at
T ≥ 8k with wider d_model, `docs/DESIGN.md` flash table), where attention /
FFN weights and activations outgrow a single chip's HBM.

Design: the classic split — attention **heads** and the FFN **hidden** width
shard over a ``model`` mesh axis (column-parallel q/k/v + ffn1, row-parallel
out_proj + ffn2) — but expressed purely as ``NamedSharding`` annotations on
the parameter tree. XLA's SPMD partitioner propagates the layout through the
whole compiled training run and inserts exactly the two all-reduces per
block (after the out-projection's head contraction and after ffn2) that a
hand-written Megatron layer would issue; we never write a collective.
Everything not matched by a rule (conv stacks, norms, heads) is replicated.

The rules key on the framework's canonical module names (models/layers.py):
``q_proj/k_proj/v_proj/out_proj`` inside every ``MultiHeadAttention`` (the
temporal transformers, cross-modal attention, and the bridge net all reuse
it) and ``ffn1/ffn2`` inside ``TransformerBlock``. Reference analogue: none —
the reference (``crossmodal_v4_enhancements.py``) is single-GPU torch; this
subsystem is TPU-native scaling surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (module-name, leaf-name) → builder(ndim) for the PartitionSpec.
# q/k/v kernels are (d_model, heads, head_dim): shard heads.
# out_proj kernel is (heads, head_dim, d_model): shard heads (row-parallel —
# the contraction over the sharded axis is what makes GSPMD emit the psum).
# ffn1 kernel (d_model, ff): shard ff (column); ffn2 (ff, d_model): row.
_RULES = {
    ("q_proj", "kernel"): P(None, MODEL_AXIS, None),
    ("k_proj", "kernel"): P(None, MODEL_AXIS, None),
    ("v_proj", "kernel"): P(None, MODEL_AXIS, None),
    ("q_proj", "bias"): P(MODEL_AXIS, None),
    ("k_proj", "bias"): P(MODEL_AXIS, None),
    ("v_proj", "bias"): P(MODEL_AXIS, None),
    ("out_proj", "kernel"): P(MODEL_AXIS, None, None),
    ("out_proj", "bias"): P(),
    ("ffn1", "kernel"): P(None, MODEL_AXIS),
    ("ffn1", "bias"): P(MODEL_AXIS),
    ("ffn2", "kernel"): P(MODEL_AXIS, None),
    ("ffn2", "bias"): P(),
}


@dataclass(frozen=True)
class TPPlan:
    """A (data, model) mesh for DP × TP training/serving."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]


def build_tp_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = 0,
    model: int = 0,
) -> TPPlan:
    """2D (data, model) mesh. ``model=0`` infers the remainder; with both
    unset, all devices go to the model axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0 and model <= 0:
        data, model = 1, n
    elif data <= 0:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    elif model <= 0:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return TPPlan(Mesh(arr, (DATA_AXIS, MODEL_AXIS)))


def tp_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one param, by (module, leaf) name; replicated when
    no rule matches or the sharded dim does not divide the mesh axis."""
    if len(path) >= 2:
        spec = _RULES.get((path[-2], path[-1]))
        if spec is not None and np.ndim(leaf) == len(spec):
            return spec
    return P()


def _divisible(leaf, spec: P, n_model: int) -> bool:
    for dim, ax in zip(np.shape(leaf), spec):
        if ax == MODEL_AXIS and dim % n_model:
            return False
    return True


def _map_with_specs(params: Any, n_model: int, fn) -> Any:
    """Apply ``fn(leaf, spec)`` over a flax param dict by flattened path
    (PartitionSpec trees are avoided: whether P is a pytree leaf is
    jax-version-dependent)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = tp_spec(path, leaf)
        if not _divisible(leaf, spec, n_model):
            spec = P()  # correct, just not sharded
        out[path] = fn(leaf, spec)
    return traverse_util.unflatten_dict(out)


def tp_param_specs(params: Any, n_model: int) -> Any:
    """Pytree (nested dict) of PartitionSpec matching ``params``.

    Params whose head/FFN dim doesn't divide the model axis fall back to
    replicated (correct, just not sharded) rather than failing.
    """
    return _map_with_specs(params, n_model, lambda leaf, spec: spec)


def shard_params_tp(params: Any, plan: TPPlan) -> Any:
    """Device-put a host/replicated param tree with the TP layout."""
    return _map_with_specs(
        params, plan.n_model,
        lambda x, s: jax.device_put(x, NamedSharding(plan.mesh, s)),
    )


def tp_param_constraint(plan):
    """A ``params → params`` hook (``make_fit_fn(param_sharding=...)``)
    that pins the TP layout inside the compiled run via
    ``with_sharding_constraint``; GSPMD propagates it through the scan
    carry, the grads, and the optimizer state.

    Accepts a ``TPPlan`` or any ``Mesh`` with a ``model`` axis — including
    a 3D (ensemble, data, model) mesh, where the same hook composes with
    fold-vmapped fits: ``vmap`` batches the constraint, so folds shard
    over ``ensemble`` while each fold's params shard over ``model``.
    """
    mesh = plan.mesh if isinstance(plan, TPPlan) else plan
    n_model = mesh.shape[MODEL_AXIS]

    def constrain(params):
        return _map_with_specs(
            params, n_model,
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)
            ),
        )

    return constrain
