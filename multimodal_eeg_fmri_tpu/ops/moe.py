"""Mixture-of-Experts FFN with expert parallelism (GShard/Switch style).

No reference analogue: the reference (``crossmodal_v4_enhancements.py``) is
single-GPU torch with dense FFNs and no parallelism of any kind (SURVEY
§2.3). This module is framework headroom surface — it completes the
parallelism matrix (ensemble / data / model / sequence / pipeline /
**expert**) with the one axis that scales *parameters* sublinearly in
compute: E experts hold E× the FFN weights while each token still pays one
expert's FLOPs.

TPU-first design:
- **Dense dispatch/combine einsums** (the GShard formulation): routing is
  expressed as two einsums against a ``(tokens, experts, capacity)``
  dispatch tensor, so the whole layer is three MXU matmul chains — no
  gather/scatter, no dynamic shapes, nothing data-dependent under ``jit``.
- **Expert parallelism via GSPMD**: the stacked expert weights
  ``(E, d_model, ff)`` shard on the leading expert axis
  (``parallel/expert.py`` param rules), and the dispatched activations
  ``(E, capacity, d_model)`` carry a ``with_sharding_constraint`` on the
  same axis — XLA's partitioner inserts the all-to-alls that move tokens
  to their experts over ICI; we never write a collective.
- **Static capacity**: each expert processes at most
  ``capacity = ceil(tokens/E · capacity_factor)`` tokens; overflow tokens
  are dropped from the MoE branch (their residual passes through — the
  standard Switch behavior) so every shape is compile-time static.
- Router math in float32 (softmax + top-k on bf16 logits loses routing
  determinism); the expert matmuls run at the incoming compute dtype.

Load balancing: the Switch auxiliary loss ``E · Σ_e f_e · p_e`` (f_e =
fraction of tokens whose FIRST choice is expert e, p_e = mean router
probability) is sown into the ``"losses"`` collection, which
``train.fit.make_fit_fn`` collects and adds to the task loss during
training (eval applies are non-mutable, so the sow is a no-op there).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)
_REPLICATION_WARNED: set = set()

# exact (erf) GELU — the framework-wide convention (models/layers.py);
# defined locally so ops/ never module-imports models/
gelu = partial(nn.gelu, approximate=False)


def top_k_routing(
    router_logits: jnp.ndarray,  # (S, E) float32
    k: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k token→expert assignment with a static per-expert capacity.

    Returns ``(dispatch, combine, aux)``:
    - ``dispatch``: (S, E, C) 0/1 — token s occupies slot c of expert e.
      Slots are exclusive (at most one token per (e, c)); tokens beyond an
      expert's capacity are dropped. Earlier-choice assignments get
      priority over later choices (all first choices are placed before any
      second choice), matching GShard.
    - ``combine``: (S, E, C) — dispatch weighted by the token's gate.
      **k = 1 uses the RAW router probability** (Switch Transformer):
      renormalizing a single gate gives the constant 1.0, which cuts the
      router out of the task gradient entirely — argmax routing is
      non-differentiable, so the gate value is the ONLY path through
      which the task loss can teach the router which expert helps (found
      in review; with renormalized top-1 gates only the uniformizing aux
      loss trained the router). k ≥ 2 renormalizes to sum to 1 (GShard);
      the task gradient survives through the ratio, and with identical
      experts the layer reduces exactly to the dense FFN. For k = 1 the
      identical-expert reduction is ``p_top · FFN(x)`` — the Switch
      scaling, tested against that oracle.
    - ``aux``: scalar Switch load-balance loss ``E · Σ_e f_e · p_e``.
    """
    S, E = router_logits.shape
    probs = jax.nn.softmax(router_logits, axis=-1)          # (S, E) f32
    top_p, top_i = jax.lax.top_k(probs, k)                  # (S, k)
    if k == 1:
        gates = top_p                                       # Switch gate
    else:
        gates = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    choice = jax.nn.one_hot(top_i, E, dtype=jnp.float32)    # (S, k, E)
    # position of each (token, choice) within its expert's queue,
    # choice-major so first choices win capacity over second choices
    flat = choice.transpose(1, 0, 2).reshape(k * S, E)
    pos_flat = jnp.cumsum(flat, axis=0) - flat               # (k·S, E)
    pos = (pos_flat.reshape(k, S, E).transpose(1, 0, 2)
           * choice).sum(-1).astype(jnp.int32)               # (S, k)
    keep = (pos < capacity).astype(jnp.float32)              # (S, k)

    slot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # (S, k, C)
    # (S, k, E, C) collapsed over choices → (S, E, C)
    dispatch = jnp.einsum("ske,skc,sk->sec", choice, slot, keep)
    combine = jnp.einsum("ske,skc,sk->sec", choice, slot, keep * gates)

    # Switch aux loss on the PRE-capacity first-choice assignment
    f = jnp.mean(choice[:, 0, :], axis=0)                    # (E,)
    p = jnp.mean(probs, axis=0)                              # (E,)
    aux = E * jnp.sum(f * p)
    return dispatch, combine, aux


class MoEFFN(nn.Module):
    """Drop-in MoE replacement for the transformer FFN (``ffn1``/``ffn2``).

    With ``mesh``/``expert_axis`` set, the expert dimension of both the
    stacked weights and the dispatched activations shards over that mesh
    axis (expert parallelism). With ``mesh=None`` the same module runs
    single-device — the parity tests train both and require equality.
    """

    d_model: int
    num_experts: int
    dim_feedforward: int = 0     # 0 → 4·d_model
    top_k: int = 1
    capacity_factor: float = 2.0
    aux_weight: float = 0.01
    mesh: Optional[Mesh] = None
    expert_axis: Optional[str] = None

    def _constrain(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pin the leading expert axis to the mesh (no-op when unsharded
        or when E doesn't divide the axis — replicated is still correct).
        Skipped while initializing: ``Module.init`` may trace outside jit,
        where with_sharding_constraint has nothing to constrain."""
        if self.mesh is None or self.expert_axis is None:
            return x
        if self.is_initializing():
            return x
        axis_size = self.mesh.shape[self.expert_axis]
        if x.shape[0] % axis_size:
            # Replication is still correct, but the expert parallelism the
            # caller explicitly configured is being dropped — say so once
            # per (E, axis) instead of silently running unsharded at full
            # per-device memory (advisor finding, round 3).
            key = (x.shape[0], self.expert_axis, axis_size)
            if key not in _REPLICATION_WARNED:
                _REPLICATION_WARNED.add(key)
                logger.warning(
                    "MoEFFN: leading expert dim %d does not divide mesh "
                    "axis %r (size %d) — falling back to REPLICATED "
                    "expert weights/activations. Pick num_experts as a "
                    "multiple of the expert-axis size to shard.",
                    x.shape[0], self.expert_axis, axis_size)
            return x
        spec = P(self.expert_axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        B, T, D = x.shape
        E, S = self.num_experts, B * T
        ff = self.dim_feedforward or 4 * D
        k = min(self.top_k, E)
        capacity = max(1, int(-(-S * self.capacity_factor // E)))
        capacity = min(capacity, S)

        xs = x.reshape(S, D)
        router_logits = nn.Dense(E, use_bias=False, name="router")(
            xs.astype(jnp.float32))
        dispatch, combine, aux = top_k_routing(router_logits, k, capacity)
        if train:
            self.sow("losses", "moe_aux",
                     (self.aux_weight * aux).astype(jnp.float32))

        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, ff))
        b1 = self.param("b1", nn.initializers.zeros, (E, ff))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, ff, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))

        dt = x.dtype
        xe = jnp.einsum("sec,sd->ecd", dispatch.astype(dt), xs)  # (E, C, D)
        xe = self._constrain(xe)
        h = gelu(jnp.einsum("ecd,edf->ecf", xe, self._constrain(w1))
                 + self._constrain(b1)[:, None, :])
        ye = (jnp.einsum("ecf,efd->ecd", h, self._constrain(w2))
              + self._constrain(b2)[:, None, :])
        ye = self._constrain(ye)
        y = jnp.einsum("sec,ecd->sd", combine.astype(dt), ye)    # (S, D)
        return y.reshape(B, T, D)
