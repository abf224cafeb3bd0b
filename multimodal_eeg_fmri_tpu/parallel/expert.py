"""Expert parallelism: MoE expert weights + activations over a mesh axis.

Companion to ``ops/moe.py``. Like ``parallel/tensor.py`` (Megatron TP),
expert parallelism is expressed purely as GSPMD layout: the stacked expert
parameters ``w1 (E, d, ff) / b1 (E, ff) / w2 (E, ff, d) / b2 (E, d)`` shard
on their leading expert dimension, and the module's internal
``with_sharding_constraint`` on the dispatched ``(E, capacity, d)``
activations makes XLA insert the token all-to-alls over ICI. We never write
a collective.

Reference analogue: none — the reference has no parallelism (SURVEY §2.3);
this completes the framework's six-axis matrix
(ensemble/data/model/sequence/pipeline/expert).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"

# (module-name, leaf-name) → PartitionSpec; keys on ops/moe.MoEFFN's
# canonical param names. The router stays replicated (every token scores
# every expert).
_RULES = {
    ("moe", "w1"): P(EXPERT_AXIS, None, None),
    ("moe", "b1"): P(EXPERT_AXIS, None),
    ("moe", "w2"): P(EXPERT_AXIS, None, None),
    ("moe", "b2"): P(EXPERT_AXIS, None),
}


@dataclass(frozen=True)
class EPPlan:
    """A (data, expert) mesh for DP × EP training/serving."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_expert(self) -> int:
        return self.mesh.shape[EXPERT_AXIS]


def build_ep_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = 0,
    expert: int = 0,
) -> EPPlan:
    """2D (data, expert) mesh. ``expert=0`` infers the remainder; with both
    unset, all devices go to the expert axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0 and expert <= 0:
        data, expert = 1, n
    elif data <= 0:
        if n % expert:
            raise ValueError(f"{n} devices not divisible by expert={expert}")
        data = n // expert
    elif expert <= 0:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        expert = n // data
    if data * expert != n:
        raise ValueError(f"mesh {data}x{expert} != {n} devices")
    arr = np.asarray(devices).reshape(data, expert)
    return EPPlan(Mesh(arr, (DATA_AXIS, EXPERT_AXIS)))


def ep_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one param by (module, leaf) name; replicated when
    no rule matches."""
    if len(path) >= 2:
        spec = _RULES.get((path[-2], path[-1]))
        if spec is not None and np.ndim(leaf) == len(spec):
            return spec
    return P()


def _divisible(leaf, spec: P, n_expert: int) -> bool:
    for dim, ax in zip(np.shape(leaf), spec):
        if ax == EXPERT_AXIS and dim % n_expert:
            return False
    return True


def _map_with_specs(params: Any, n_expert: int, fn) -> Any:
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = ep_spec(path, leaf)
        if not _divisible(leaf, spec, n_expert):
            spec = P()  # correct, just not sharded
        out[path] = fn(leaf, spec)
    return traverse_util.unflatten_dict(out)


def ep_param_specs(params: Any, n_expert: int) -> Any:
    """Pytree of PartitionSpec matching ``params`` (expert rules applied,
    everything else replicated)."""
    return _map_with_specs(params, n_expert, lambda leaf, spec: spec)


def shard_params_ep(params: Any, plan: EPPlan) -> Any:
    """Device-put a host/replicated param tree with the EP layout."""
    return _map_with_specs(
        params, plan.n_expert,
        lambda x, s: jax.device_put(x, NamedSharding(plan.mesh, s)),
    )


def ep_param_constraint(plan):
    """``params → params`` hook for ``make_fit_fn(param_sharding=...)``:
    pins the expert layout inside the compiled run; GSPMD propagates it
    through the scan carry, grads, and optimizer state.

    Accepts an ``EPPlan`` or any ``Mesh`` with an ``expert`` axis.
    """
    mesh = plan.mesh if isinstance(plan, EPPlan) else plan
    n_expert = mesh.shape[EXPERT_AXIS]

    def constrain(params):
        return _map_with_specs(
            params, n_expert,
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)
            ),
        )

    return constrain
