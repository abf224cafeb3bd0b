"""Pipeline parallelism — GPipe-style stage pipelining over a mesh axis.

Completes the parallelism matrix (ensemble / data / model / sequence /
pipeline). Production models here are 2-4 identical transformer layers, so
pipelining is pure headroom like ring attention — but the mechanism is the
general one: a stack of IDENTICAL stages (the homogeneous-pipeline
constraint SPMD requires) shards its stage axis over the mesh; microbatches
flow device→device by `ppermute` neighbor hops (ICI), one `lax.scan` over
``n_micro + n_stages − 1`` ticks executes the whole schedule — bubble
included — and every device runs the same program on its resident stage
params (weights never move; activations do).

No reference analogue (single-GPU torch). Differentiable for free: JAX
transposes the scan and the ppermute, which *is* the backward pipeline
schedule (cotangents flow the reverse ring).

Memory/communication shape: per device, one stage's params + one
microbatch activation; per tick, one (micro_batch, features) ppermute hop.
The bubble fraction is (S−1)/(n_micro+S−1) — pick n_micro ≫ S.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def _pipeline_local(params, x, key, apply_fn, axis_name: str,
                    n_stages: int, n_micro: int, with_key: bool):
    """Per-device body (inside shard_map).

    params: this device's stage params (leading stage-block dim of 1).
    x: the full (n_micro, micro, ...) input, replicated.
    key: replicated base PRNG key (used only when ``with_key``).
    Returns (n_micro, micro, ...) outputs, replicated (psum-collected from
    the last stage).
    """
    params = jax.tree_util.tree_map(lambda p: p[0], params)
    stage_id = jax.lax.axis_index(axis_name)
    is_first = stage_id == 0
    is_last = stage_id == n_stages - 1
    micro_shape = x.shape[1:]

    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        h_recv, y = carry
        # stage 0 ingests microbatch t (zeros once the stream is drained)
        mb = jax.lax.dynamic_index_in_dim(
            x, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False)
        ingest = jnp.logical_and(is_first, t < n_micro)
        h_in = jnp.where(ingest, mb, h_recv)
        if with_key:
            # stage ``s`` processes microbatch ``m = t - s`` at tick t, so
            # fold (stage, microbatch) into the key — the key a sequential
            # run of the same stages over the same microbatches derives
            # (clipped on pipeline-fill/drain ticks, whose outputs are
            # discarded by the emit mask anyway)
            m = jnp.clip(t - stage_id, 0, n_micro - 1)
            k = jax.random.fold_in(jax.random.fold_in(key, stage_id), m)
            h_out = apply_fn(params, h_in, k)
        else:
            h_out = apply_fn(params, h_in)
        # the last stage emits microbatch t-(S-1) once the pipe is full
        out_idx = t - (n_stages - 1)
        emit = jnp.logical_and(is_last, out_idx >= 0)
        y = jax.lax.dynamic_update_index_in_dim(
            y,
            jnp.where(emit, h_out, jax.lax.dynamic_index_in_dim(
                y, jnp.maximum(out_idx, 0), axis=0, keepdims=False)),
            jnp.maximum(out_idx, 0), axis=0)
        # hop to the next stage
        h_recv = jax.lax.ppermute(h_out, axis_name, fwd_perm)
        return (h_recv, y), None

    h0 = jnp.zeros(micro_shape, x.dtype)
    y0 = jnp.zeros((n_micro,) + micro_shape, x.dtype)
    (_, y), _ = jax.lax.scan(
        tick, (h0, y0), jnp.arange(n_micro + n_stages - 1))
    # only the last stage holds real outputs; replicate via masked psum
    y = jnp.where(is_last, y, jnp.zeros_like(y))
    return jax.lax.psum(y, axis_name)


def pipeline_apply(
    stacked_params: Any,
    x: jnp.ndarray,
    apply_fn: Callable[..., jnp.ndarray],
    mesh: Mesh,
    axis: str = STAGE_AXIS,
    n_micro: int = None,
    x_spec: P = None,
    key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run ``x`` through ``n_stages`` identical stages pipelined over
    ``mesh`` axis ``axis``.

    stacked_params: stage params stacked on a leading axis of size
    ``mesh.shape[axis]`` (shard it there with :func:`shard_stage_params`).
    x: ``(batch, ...)`` — split into ``n_micro`` microbatches (batch must
    divide). ``apply_fn(stage_params, h) -> h`` must preserve ``h``'s shape
    (homogeneous stages). Returns ``(batch, ...)`` outputs.

    ``x_spec`` (optional) shards the MICROBATCHED ``(n_micro, micro, ...)``
    input over further mesh axes — e.g. ``P(None, None, "seq", None)`` for
    a (n_micro, micro, T, D) stream whose TIME axis rides a second ``seq``
    mesh axis. ``apply_fn`` then sees the local chunk and may use
    collectives over those axes itself (ring attention via
    ``attn_impl="ring_local"``); stage hops ppermute each (stage, seq)
    shard to its (stage+1, seq) neighbor unchanged. Output follows the
    same spec.

    ``key`` (optional) threads a PRNG key through the schedule: ``apply_fn``
    is then called as ``apply_fn(stage_params, h, k)`` with
    ``k = fold_in(fold_in(key, stage), microbatch)`` — the SAME key a
    sequential pass over the same stages and microbatches would derive, so
    stochastic layers (dropout) match the unpipelined twin exactly.
    """
    n_stages = mesh.shape[axis]
    n_micro = n_micro or n_stages
    batch = x.shape[0]
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by n_micro={n_micro}")
    xm = x.reshape(n_micro, batch // n_micro, *x.shape[1:])

    with_key = key is not None
    if not with_key:
        key = jax.random.key(0)  # placeholder operand, never consumed
    xs = P() if x_spec is None else x_spec
    param_spec = jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (np.ndim(p) - 1))), stacked_params)
    fn = jax.shard_map(
        partial(_pipeline_local, apply_fn=apply_fn, axis_name=axis,
                n_stages=n_stages, n_micro=n_micro, with_key=with_key),
        mesh=mesh,
        in_specs=(param_spec, xs, P()),
        out_specs=xs,
        check_vma=False,
    )
    out = fn(stacked_params, xm, key)
    return out.reshape(batch, *out.shape[2:])


def shard_stage_params(stacked_params: Any, mesh: Mesh,
                       axis: str = STAGE_AXIS) -> Any:
    """Device-put stage-stacked params with the stage axis sharded."""
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(
            p, NamedSharding(mesh, P(axis, *([None] * (np.ndim(p) - 1))))),
        stacked_params)
