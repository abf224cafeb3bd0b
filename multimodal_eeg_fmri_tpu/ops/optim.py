"""Fused flat-vector AdamW — an evaluated ALTERNATIVE, not the default.

Hypothesis: optax's per-leaf transform chain (~10 kernels × ~200 param
leaves) dominates the fused train step. Head-to-head on v5e (batch 8,
MultimodalEndToEnd, 100-step scan, best of 4): fwd+bwd 0.83 ms; + optax
AdamW 1.91 ms; + THIS fused version 3.05 ms. The ravel/unravel concat and
slice passes cost MORE than the per-leaf kernels at this parameter count,
so the compiled fit keeps optax (train/fit.py). A third variant — flat-
NATIVE params (unravel once inside the forward, optimizer on the flat
vector) — was also measured: 2.40 ms/step; the unravel's 200 slices in the
forward plus its concat transpose in the backward again outweigh the
per-leaf optimizer kernels. Retained because (a) the trade flips for much
larger leaf counts, and (b) it is an exact, torch-parity-tested AdamW
reference (tests/test_torch_parity.py).

Semantics match ``torch.optim.AdamW`` exactly (decoupled wd applied to all
params, bias-corrected moments, clip on the raw gradient). LR and weight
decay are runtime scalars.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class FusedAdamWState(NamedTuple):
    mu: jnp.ndarray     # (P,) first moment
    nu: jnp.ndarray     # (P,) second moment
    count: jnp.ndarray  # () int32 step


def init_fused_adamw(params: Any) -> FusedAdamWState:
    flat, _ = ravel_pytree(params)
    return FusedAdamWState(
        mu=jnp.zeros_like(flat),
        nu=jnp.zeros_like(flat),
        count=jnp.zeros((), jnp.int32),
    )


def fused_adamw_step(
    params: Any,
    grads: Any,
    state: FusedAdamWState,
    lr,
    weight_decay,
    grad_clip: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Any, FusedAdamWState]:
    """One AdamW step over the flattened parameter vector.
    Returns (new_params, new_state)."""
    flat_p, unravel = ravel_pytree(params)
    flat_g, _ = ravel_pytree(grads)
    flat_g = flat_g.astype(flat_p.dtype)

    if grad_clip and grad_clip > 0:
        gnorm = jnp.sqrt(jnp.sum(flat_g * flat_g))
        flat_g = flat_g * jnp.minimum(1.0, grad_clip / jnp.maximum(
            gnorm, 1e-12))

    count = state.count + 1
    mu = b1 * state.mu + (1.0 - b1) * flat_g
    nu = b2 * state.nu + (1.0 - b2) * flat_g * flat_g
    c = count.astype(flat_p.dtype)
    mu_hat = mu / (1.0 - b1**c)
    nu_hat = nu / (1.0 - b2**c)

    update = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * flat_p
    new_flat = flat_p - lr * update
    return unravel(new_flat), FusedAdamWState(mu=mu, nu=nu, count=count)
