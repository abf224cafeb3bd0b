"""Fault-tolerant chunked training: checkpoint every chunk, resume on crash.

The reference's checkpointing is model *selection*, not fault tolerance
(SURVEY §5: best-state deepcopy + per-fold best disk checkpoints; a crash
restarts a fold from scratch). Here training runs in compiled chunks of
``chunk_epochs``; after each chunk the FULL training carry (params, opt
state, best-state tracking, early-stop counters, plateau controller, PRNG
key, epoch counter) is written with orbax. On restart the latest chunk is
restored and training continues bit-exactly where it left off — the cosine
schedule, early stopping and best-model selection all see the same state
they would have in an uninterrupted run.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.train.fit import FitResult, make_fit_fn


def _chunk_dir(ckpt_dir: Path, chunk: int) -> Path:
    return ckpt_dir / f"chunk_{chunk:05d}"


def latest_chunk(ckpt_dir: str | Path) -> Optional[int]:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    chunks = sorted(int(p.name.split("_")[1]) for p in d.glob("chunk_*")
                    if (p / "_COMPLETE").exists())
    return chunks[-1] if chunks else None


def fit_resumable(
    model,
    cfg: TrainConfig,
    rng: jax.Array,
    train_data: Dict[str, Any],
    eval_sets: Dict[str, Dict[str, Any]],
    ckpt_dir: str | Path,
    class_weights=None,
    chunk_epochs: int = 10,
    keep_chunks: int = 2,
    async_save: bool = False,
    param_sharding: Optional[Callable] = None,
) -> FitResult:
    """Train ``cfg.num_epochs`` total in compiled chunks with durable
    checkpoints. Safe to call again after a crash — it resumes from the
    last complete chunk.

    ``param_sharding`` (e.g. ``parallel.fsdp.fsdp_param_constraint(mesh)``
    or ``parallel.tensor.tp_param_constraint(plan)``) pins the sharded
    layout inside every chunk — including on the carry restored after a
    crash, which arrives as unsharded host arrays and is re-pinned by
    ``make_fit_fn`` (fault-tolerant FSDP/TP training).

    ``async_save=True`` overlaps each chunk's checkpoint DISK write with
    the next chunk's compute (orbax ``AsyncCheckpointer``): the state is
    copied to host synchronously (that part is unavoidable and donation-
    safe — the background writer never touches device buffers), the write
    happens on a background thread, and the ``_COMPLETE`` marker is only
    written after ``wait_until_finished`` — so a crash mid-write leaves an
    incomplete chunk that resume correctly ignores."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    total = cfg.num_epochs
    n_chunks = (total + chunk_epochs - 1) // chunk_epochs

    # Donate the resume carry: its pytree structure matches the returned
    # FitResult.carry exactly, so XLA aliases every buffer (params, both
    # optimizer moments, best-params snapshot, batch stats) in place —
    # measured to remove one full training-state copy from peak HBM per
    # chunk (docs/DESIGN.md). Safe here because the previous carry is never
    # touched after the call (only the NEW carry is checkpointed).
    fit_fn = jax.jit(
        make_fit_fn(model, cfg, num_epochs=chunk_epochs,
                    eval_names=tuple(eval_sets.keys()),
                    param_sharding=param_sharding),
        donate_argnums=(5,),
    )

    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    else:
        ckptr = ocp.PyTreeCheckpointer()
    start = 0
    carry = None
    histories = []
    resumed = latest_chunk(ckpt_dir)
    if resumed is not None:
        # orbax needs the pytree STRUCTURE (optax NamedTuples, the _Carry
        # struct) to restore into — derive it for free with eval_shape.
        shape_res = jax.eval_shape(
            make_fit_fn(model, cfg, num_epochs=chunk_epochs,
                        eval_names=tuple(eval_sets.keys())),
            rng, train_data, eval_sets, class_weights, None, None)
        n_hist = resumed + 1
        template = {"carry": shape_res.carry,
                    "histories": [shape_res.history] * n_hist}
        restored = ckptr.restore(_chunk_dir(ckpt_dir, resumed) / "state",
                                 item=template)

        def _uncommit(x):
            # orbax restores ndarray leaves as host numpy (uncommitted),
            # but typed PRNG-key leaves come back as jax arrays COMMITTED
            # to device 0 — which jit rejects alongside mesh-committed
            # training data (sharded resume, e.g. FSDP). Round-trip the
            # key through its raw bits to get an uncommitted key again.
            if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                    x.dtype, jax.dtypes.prng_key):
                return jax.random.wrap_key_data(
                    np.asarray(jax.random.key_data(x)),
                    impl=jax.random.key_impl(x))
            return x

        carry = jax.tree_util.tree_map(_uncommit, restored["carry"])
        histories = [jax.tree_util.tree_map(np.asarray, h)
                     for h in restored["histories"]]
        start = resumed + 1

    def _finalize(cd: Path, chunk: int) -> None:
        (cd / "_COMPLETE").write_text(json.dumps({"chunk": chunk}))
        # prune old chunks
        for old in sorted(ckpt_dir.glob("chunk_*"))[:-keep_chunks]:
            shutil.rmtree(old, ignore_errors=True)

    result = None
    pending = None  # (dir, chunk) whose async write is still in flight
    try:
        for chunk in range(start, n_chunks):
            result = fit_fn(rng, train_data, eval_sets, class_weights,
                            None, carry)
            carry = result.carry
            histories.append(
                jax.tree_util.tree_map(np.asarray, result.history))
            # host copy BEFORE the next fit_fn call: the carry is donated,
            # so the async writer must never hold device buffers
            state = {"carry": jax.device_get(carry),
                     # shallow-copy: the background writer must not see the
                     # next iteration's append
                     "histories": list(histories)}
            if pending is not None:
                ckptr.wait_until_finished()
                _finalize(*pending)
                pending = None
            cd = _chunk_dir(ckpt_dir, chunk)
            if cd.exists():
                shutil.rmtree(cd)
            ckptr.save(cd / "state", state)
            if async_save:
                pending = (cd, chunk)  # overlap write with the next chunk
            else:
                _finalize(cd, chunk)
        if pending is not None:
            ckptr.wait_until_finished()
            _finalize(*pending)
    finally:
        # shut the async writer's thread pool down; on an exception with a
        # write in flight this waits for the write but (correctly) never
        # finalizes it — resume ignores chunks without a _COMPLETE marker
        ckptr.close()

    if result is None:  # fully resumed, nothing left to run
        final = carry
        history = _concat_histories(histories)
        return FitResult(
            params=final.best_params, batch_stats=final.best_batch_stats,
            final_params=final.params, final_batch_stats=final.batch_stats,
            best_metric=final.best_metric, best_epoch=final.best_epoch,
            history=history, carry=final,
        )
    return result._replace(history=_concat_histories(histories))


def _concat_histories(histories):
    if not histories:
        return {}
    keys = histories[0].keys()
    return {k: np.concatenate([np.asarray(h[k]) for h in histories])
            for k in keys}
