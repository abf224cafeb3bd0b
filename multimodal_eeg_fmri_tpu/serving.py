"""Inference/serving path.

The reference has no serving story (research scripts only). For production
deployment this module packages a trained model as a compiled predictor:

- fixed-shape jitted forward with optional fused preprocessing;
- automatic batch padding/truncation to the compiled batch size (serve any
  request size against one executable);
- warmup + latency percentiles (`Predictor.benchmark`);
- construction straight from a checkpoint directory
  (`Predictor.from_checkpoint` — consumes core/checkpoint.py artifacts);
- `EnsemblePredictor`: all K fold models served in ONE vmapped forward with
  the member axis sharded over the mesh's ensemble dimension — the
  TPU-native form of the reference's late fusion (it loads its fold
  checkpoints and averages probabilities sequentially,
  `EEG_CODE/CrossModal_EEG_scr.ipynb §34` `evaluate_late_fusion`).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.train.fit import RESERVED_KEYS


class Predictor:
    """Compiled fixed-batch predictor over a trained model."""

    def __init__(
        self,
        model,
        params,
        batch_stats=None,
        batch_size: int = 8,
        preprocess: Optional[Callable] = None,
        return_probs: bool = True,
        temperature: Optional[float] = None,
    ):
        self.model = model
        self.batch_size = batch_size
        if temperature is not None and temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        # fixed at construction: the value is baked into the traced
        # forward below — mutating the attribute later would silently not
        # change served outputs, so treat it as read-only
        self.temperature = (float(temperature) if temperature is not None
                            else None)
        temp = self.temperature
        self._preprocess = preprocess
        self._return_probs = return_probs
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def _forward(variables, inputs):
            if preprocess is not None:
                inputs = {**inputs, **preprocess(inputs)}
            out = model.apply(variables, **inputs, train=False)
            logits = out.logits.astype(jnp.float32)
            if temp is not None:
                # temperature scaling (report/calibration.fit_temperature)
                # baked into the compiled forward — and therefore into any
                # exported StableHLO artifact
                logits = logits / jnp.float32(temp)
            if return_probs:
                return jax.nn.softmax(logits, axis=-1)
            return logits

        self._variables = variables
        self._forward = jax.jit(_forward)

    @classmethod
    def from_checkpoint(cls, model, checkpoint_path, **kw) -> "Predictor":
        from multimodal_eeg_fmri_tpu.core.checkpoint import load_checkpoint

        restored = load_checkpoint(checkpoint_path)
        return cls(model, restored["params"],
                   restored.get("batch_stats"), **kw)

    @classmethod
    def from_quantized(cls, model, path, **kw) -> "Predictor":
        """Serve from an int8 weight-only payload (core/quantize.py:
        ``save_quantized`` — ~4× smaller than the f32 checkpoint; weights
        dequantize at load, compute stays f32)."""
        from multimodal_eeg_fmri_tpu.core.quantize import load_quantized

        restored = load_quantized(path)
        return cls(model, restored["params"],
                   restored.get("batch_stats"), **kw)

    def calibrated(self, val_inputs: Dict[str, np.ndarray],
                   val_labels: np.ndarray,
                   weights: Optional[np.ndarray] = None) -> "Predictor":
        """Temperature-scale against held-out data (Guo et al. 2017).

        Fits T minimizing validation NLL (report/calibration) on this
        model's raw logits and returns a NEW Predictor whose compiled
        forward — and any artifact it exports — serves ``softmax(z/T)``.
        The reference ships raw softmax confidences
        (`_test_bridge.py` prediction loops); for a clinical classifier the
        calibrated form is the deployable one.
        """
        from multimodal_eeg_fmri_tpu.report.calibration import (
            fit_temperature,
        )

        logits_fn = jax.jit(
            lambda v, i: self.model.apply(v, **i, train=False).logits)
        inputs = {k: v for k, v in val_inputs.items()
                  if k not in RESERVED_KEYS}
        chunks, logits = self._pad(inputs), []
        for chunk, m in chunks:
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            if self._preprocess is not None:
                dev = {**dev, **self._preprocess(dev)}
            logits.append(np.asarray(logits_fn(self._variables, dev))[:m])
        t = float(fit_temperature(
            jnp.asarray(np.concatenate(logits, axis=0)),
            jnp.asarray(np.asarray(val_labels)),
            weights=None if weights is None else jnp.asarray(weights)))
        return Predictor(
            self.model, self._variables["params"],
            self._variables.get("batch_stats"),
            batch_size=self.batch_size, preprocess=self._preprocess,
            return_probs=self._return_probs, temperature=t)

    def _pad(self, inputs: Dict[str, np.ndarray]):
        n = len(next(iter(inputs.values())))
        chunks = []
        for start in range(0, n, self.batch_size):
            chunk = {k: np.asarray(v)[start:start + self.batch_size]
                     for k, v in inputs.items()}
            m = len(next(iter(chunk.values())))
            if m < self.batch_size:
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[:1], self.batch_size - m, axis=0)])
                    for k, v in chunk.items()}
            chunks.append((chunk, m))
        return chunks

    def __call__(self, **inputs) -> np.ndarray:
        """Predict for any number of rows; one compiled executable."""
        inputs = {k: v for k, v in inputs.items() if k not in RESERVED_KEYS}
        outs = []
        for chunk, m in self._pad(inputs):
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            outs.append(np.asarray(self._forward(self._variables, dev))[:m])
        return np.concatenate(outs, axis=0)

    def export_artifact(self, example: Dict[str, np.ndarray], path: str,
                        platforms=("cpu", "tpu")) -> bytes:
        """Serialize the compiled forward (weights baked in) to a
        self-contained StableHLO artifact via ``jax.export``.

        The artifact is the deployment unit: no Python model code, flax, or
        checkpoint plumbing needed at the serving site — just
        ``load_artifact(path)`` and call. Lowered for both CPU and TPU by
        default so the same file serves in dev and prod. Fixed batch
        (``self.batch_size``) — the same contract as the compiled predictor.
        """
        from pathlib import Path

        from jax import export as jax_export

        spec = {
            k: jax.ShapeDtypeStruct(
                (self.batch_size,) + np.shape(v)[1:],
                jnp.asarray(np.asarray(v)[:1]).dtype)
            for k, v in example.items() if k not in RESERVED_KEYS
        }
        fn = jax.jit(lambda inputs: self._forward(self._variables, inputs))
        try:
            exp = jax_export.export(fn, platforms=list(platforms))(spec)
        except Exception as e:  # noqa: BLE001 — deliberately broad: the
            # whole point of this path is "exotic backends / jax versions
            # reject multi-platform lowering with whatever error type they
            # like" (RuntimeError, XlaRuntimeError, …); the ADVICE fix is
            # the loud warning naming the single platform, not a narrow
            # except that turns the fallback into a crash
            single = jax.default_backend()
            logging.getLogger(__name__).warning(
                "multi-platform export for %s failed (%s: %s); artifact is "
                "lowered for %r ONLY and will not load on other platforms",
                platforms, type(e).__name__, e, single)
            exp = jax_export.export(fn)(spec)
        blob = exp.serialize()
        Path(path).write_bytes(blob)
        return blob

    def benchmark(self, example: Dict[str, np.ndarray], warmup: int = 3,
                  iters: int = 30, sync: str = "block") -> Dict[str, float]:
        """Serving-latency percentiles for one compiled batch.

        ``sync="block"`` (default) times via ``block_until_ready`` — correct
        on direct-attached devices. On remote/tunneled backends that is NOT
        a reliable sync and the tunnel memoizes identical executions; use
        ``sync="fetch"``, which perturbs the inputs per request and fetches
        a result scalar (full request→response latency, link included).
        """
        dev = {k: jnp.asarray(np.asarray(v)[: self.batch_size])
               for k, v in example.items() if k not in RESERVED_KEYS}
        for _ in range(warmup):
            jax.block_until_ready(self._forward(self._variables, dev))
        times = []
        for i in range(iters):
            if sync == "fetch":
                req = {k: v + np.float32(1e-3 * (i + 1))
                       if jnp.issubdtype(v.dtype, jnp.floating) else v
                       for k, v in dev.items()}
                t0 = time.perf_counter()
                float(self._forward(self._variables, req).ravel()[0])
            else:
                t0 = time.perf_counter()
                jax.block_until_ready(self._forward(self._variables, dev))
            times.append((time.perf_counter() - t0) * 1000.0)
        a = np.asarray(times)
        return {"p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "mean_ms": float(a.mean()),
                "batch_size": self.batch_size}


def load_artifact(path: str) -> Callable[..., np.ndarray]:
    """Load a ``Predictor.export_artifact`` file into a callable
    ``fn(**inputs) -> probs``. Inputs must match the exported batch size
    and keys; no model code or params needed."""
    from pathlib import Path

    from jax import export as jax_export

    exp = jax_export.deserialize(Path(path).read_bytes())

    def call(**inputs) -> np.ndarray:
        dev = {k: jnp.asarray(v) for k, v in inputs.items()
               if k not in RESERVED_KEYS}
        return np.asarray(exp.call(dev))

    return call


def stack_variable_trees(trees):
    """Stack K per-member variable pytrees on a new leading member axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


class EnsemblePredictor:
    """Serve all K fold/ensemble models in one compiled, sharded forward.

    The reference's serving analogue is late fusion: load the K fold
    checkpoints, run each sequentially, average class probabilities
    (`CrossModal_EEG_scr.ipynb §34` `evaluate_late_fusion`). Here the K
    parameter trees stack on a leading member axis, the forward is
    ``vmap``ped over that axis (inputs broadcast), and — given a
    ``MeshPlan`` — the stacked params shard over the mesh's ``ensemble``
    dimension, so a v5e-8 serves 8 fold models at one model's latency with
    no collective on the hot path (members are independent; the only
    cross-member op is the final probability mean).

    ``reduce="mean_probs"`` returns the late-fusion average ``(n, classes)``;
    ``reduce="vote"`` returns per-class majority-vote fractions
    ``(n, classes)`` (argmax = the reference's LOSO subject-level majority
    vote, `CrossModal_EEG_scr.ipynb §31`); ``reduce="none"`` returns
    per-member probabilities ``(K, n, classes)``.
    """

    def __init__(
        self,
        model,
        stacked_params,
        stacked_batch_stats=None,
        plan=None,
        batch_size: int = 8,
        preprocess: Optional[Callable] = None,
        reduce: str = "mean_probs",
        temperature: Optional[float] = None,
    ):
        if reduce not in ("mean_probs", "vote", "none"):
            raise ValueError(f"unknown reduce={reduce!r}")
        self.model = model
        self.batch_size = batch_size
        self.reduce = reduce
        if temperature is not None and temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        # fixed at construction (baked into the traced member forward)
        self.temperature = (float(temperature) if temperature is not None
                            else None)
        temp = self.temperature
        self._plan = plan
        self._preprocess = preprocess
        variables = {"params": stacked_params}
        if stacked_batch_stats is not None:
            variables["batch_stats"] = stacked_batch_stats
        self.n_members = int(jax.tree_util.tree_leaves(
            stacked_params)[0].shape[0])

        if plan is not None:
            from multimodal_eeg_fmri_tpu.parallel.mesh import (
                ensemble_sharding, replicated)

            if self.n_members % plan.n_ensemble:
                raise ValueError(
                    f"{self.n_members} members not divisible by the mesh's "
                    f"ensemble axis ({plan.n_ensemble})")
            variables = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, ensemble_sharding(plan, np.ndim(x))), variables)
            self._input_sharding = replicated(plan)
        else:
            self._input_sharding = None

        def _member_forward(variables, inputs):
            out = model.apply(variables, **inputs, train=False)
            logits = out.logits.astype(jnp.float32)
            if temp is not None:
                # shared ensemble temperature (fit_temperature_ensemble):
                # scaling must happen INSIDE each member's softmax because
                # the fusion averages probabilities, not logits
                logits = logits / jnp.float32(temp)
            return jax.nn.softmax(logits, axis=-1)

        if plan is not None:
            # member axis as manual SPMD: each ensemble group serves its
            # local members locally (auto-partitioning a vmapped axis
            # whose params are sharded along it is unsafe on current XLA —
            # parallel/mesh.ensemble_vmap docstring / DESIGN.md
            # "Partitioner pin"); only the final probability mean crosses
            # groups, as a plain reduction of a sharded array.
            from multimodal_eeg_fmri_tpu.parallel.mesh import ensemble_vmap

            _members = ensemble_vmap(_member_forward, plan,
                                     in_axes=(0, None))
        else:
            _members = jax.vmap(_member_forward, in_axes=(0, None))

        def _forward(variables, inputs):
            if preprocess is not None:
                inputs = {**inputs, **preprocess(inputs)}
            probs = _members(variables, inputs)
            if reduce == "mean_probs":
                return probs.mean(axis=0)
            if reduce == "vote":
                # per-class vote fractions: argmax of the output is the
                # members' majority vote (rows still sum to 1, so the
                # (n, classes) serving contract is unchanged)
                votes = jax.nn.one_hot(jnp.argmax(probs, axis=-1),
                                       probs.shape[-1], dtype=probs.dtype)
                return votes.mean(axis=0)
            return probs

        self._variables = variables
        self._forward = jax.jit(_forward)

    @classmethod
    def from_checkpoints(cls, model, checkpoint_paths, **kw):
        """Build from K per-fold checkpoint directories (the reference's
        ``best_{model}_fold{k}.pt`` layout, `_test_bridge.py:476-482`)."""
        from multimodal_eeg_fmri_tpu.core.checkpoint import load_checkpoint

        restored = [load_checkpoint(p) for p in checkpoint_paths]
        params = stack_variable_trees([r["params"] for r in restored])
        bs_list = [r.get("batch_stats") for r in restored]
        batch_stats = (stack_variable_trees(bs_list)
                       if all(b is not None for b in bs_list) else None)
        return cls(model, params, batch_stats, **kw)

    @classmethod
    def from_quantized(cls, model, paths, **kw):
        """Build from K int8/int4 weight-only payloads
        (core/quantize.save_quantized). The K-fold ensemble fan-out is
        where the quantized story pays most: the deployment unit shrinks
        ~4× PER MEMBER, and all K dequantized trees still serve in the one
        vmapped forward. Same bounded-drift contract as
        ``Predictor.from_quantized`` (weights dequantize at load, compute
        stays f32)."""
        from multimodal_eeg_fmri_tpu.core.quantize import load_quantized

        restored = [load_quantized(p) for p in paths]
        params = stack_variable_trees([r["params"] for r in restored])
        bs_list = [r.get("batch_stats") for r in restored]
        batch_stats = (stack_variable_trees(bs_list)
                       if all(b is not None for b in bs_list) else None)
        return cls(model, params, batch_stats, **kw)

    # the K-model late-fusion forward serializes the same way as the
    # single-model one: weights baked in, one self-contained file
    export_artifact = Predictor.export_artifact

    def calibrated(self, val_inputs: Dict[str, np.ndarray],
                   val_labels: np.ndarray,
                   weights: Optional[np.ndarray] = None
                   ) -> "EnsemblePredictor":
        """Shared-temperature calibration of the late fusion.

        Fits one T on the stacked member logits
        (report/calibration.fit_temperature_ensemble — the scaling sits
        inside each member's softmax since the fusion averages
        probabilities) and returns a new EnsemblePredictor serving the
        calibrated mean. Member order, argmax of each member, and the
        members' probability RANKING are unchanged; the averaged
        confidence becomes honest.
        """
        from multimodal_eeg_fmri_tpu.report.calibration import (
            fit_temperature_ensemble,
        )

        logits_fn = jax.jit(jax.vmap(
            lambda v, i: self.model.apply(v, **i, train=False).logits,
            in_axes=(0, None)))
        # calibration is a one-time host-side fit: gather the (possibly
        # ensemble-sharded) variables to the default device ONCE — inside
        # the chunk loop this re-uploaded the whole K-stacked tree per
        # chunk (found in review)
        host_vars = jax.tree_util.tree_map(np.asarray, self._variables)
        dev_vars = jax.tree_util.tree_map(jnp.asarray, host_vars)
        inputs = {k: v for k, v in val_inputs.items()
                  if k not in RESERVED_KEYS}
        chunks, logits = Predictor._pad(self, inputs), []
        for chunk, m in chunks:
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            if self._preprocess is not None:
                dev = {**dev, **self._preprocess(dev)}
            logits.append(np.asarray(logits_fn(dev_vars, dev))[:, :m])
        t = float(fit_temperature_ensemble(
            jnp.asarray(np.concatenate(logits, axis=1)),
            jnp.asarray(np.asarray(val_labels)),
            weights=None if weights is None else jnp.asarray(weights)))
        return EnsemblePredictor(
            self.model, host_vars["params"], host_vars.get("batch_stats"),
            plan=self._plan, batch_size=self.batch_size,
            preprocess=self._preprocess, reduce=self.reduce, temperature=t)

    def __call__(self, **inputs) -> np.ndarray:
        inputs = {k: v for k, v in inputs.items() if k not in RESERVED_KEYS}
        n = len(next(iter(inputs.values())))
        outs = []
        for chunk, m in Predictor._pad(self, inputs):
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            if self._input_sharding is not None:
                dev = {k: jax.device_put(v, self._input_sharding)
                       for k, v in dev.items()}
            probs = np.asarray(self._forward(self._variables, dev))
            outs.append(probs[:, :m] if self.reduce == "none" else probs[:m])
        axis = 1 if self.reduce == "none" else 0
        out = np.concatenate(outs, axis=axis)
        assert out.shape[axis] == n
        return out


class QueueFull(RuntimeError):
    """Raised on enqueue when the DynamicBatcher's bounded queue is full.

    Deliberate backpressure: a sustained burst beyond device throughput
    must surface to callers (HTTP 503 / retry-after territory), not grow
    host memory and tail latency without bound."""


class _Request:
    __slots__ = ("inputs", "n", "event", "result", "error")

    def __init__(self, inputs, n):
        import threading

        self.inputs = inputs
        self.n = n
        self.event = threading.Event()
        self.result = None
        self.error = None


class DynamicBatcher:
    """Coalesce concurrent small requests into one compiled device call.

    The clinical serving pattern is one subject per request; issuing each
    as its own device call pays the full dispatch (and, on tunneled
    backends, link round-trip) per row and leaves the compiled batch
    mostly padding. ``DynamicBatcher`` wraps any ``Predictor`` /
    ``EnsemblePredictor`` (or plain ``fn(**inputs) -> array`` whose output
    leads with the batch axis) behind the SAME calling convention, but
    queues rows from concurrent callers and flushes them as one batch when
    either ``max_batch`` rows are waiting or the oldest request has waited
    ``max_delay_ms`` — the TF-Serving/Triton dynamic-batching contract.

    Thread-safe; callers block only for their own result. Requests with
    different input-key sets are flushed as separate calls (never mixed).
    The reference has no serving story at all (SURVEY §1: research scripts
    only); this is deployment surface the rebuild adds.

    Overload behavior: ``max_queue`` bounds the number of PENDING ROWS; an
    enqueue that would exceed it raises :class:`QueueFull` immediately
    (bounded memory, timely rejection). ``timeout_s`` bounds how long any
    caller waits for its result — if the device call wedges (e.g. the
    half-up tunnel mode, CLAUDE.md) callers get ``TimeoutError`` instead of
    blocking every serving thread forever; a request still queued at
    timeout is withdrawn from the queue.
    """

    def __init__(self, predictor: Callable, max_delay_ms: float = 5.0,
                 max_batch: Optional[int] = None,
                 max_queue: Optional[int] = None,
                 timeout_s: Optional[float] = None):
        import threading

        if max_delay_ms < 0:
            raise ValueError(f"max_delay_ms must be >= 0, got {max_delay_ms}")
        if max_queue is not None and max_queue < 1:
            raise ValueError(f"max_queue must be >= 1, got {max_queue}")
        if timeout_s is not None and timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        if getattr(predictor, "reduce", None) == "none":
            raise ValueError(
                "EnsemblePredictor(reduce='none') returns (K, N, C) — the "
                "batch axis is not leading, so per-request slicing would "
                "silently cut the member axis; wrap a reducing ensemble "
                "(reduce='mean_probs') instead")
        self.predictor = predictor  # public: the wrapped callable
        self._delay = max_delay_ms / 1e3
        self._max = int(max_batch
                        or getattr(predictor, "batch_size", None) or 8)
        self._max_queue = None if max_queue is None else int(max_queue)
        self._timeout = timeout_s
        self.rejected = 0  # observability: QueueFull enqueue rejections
        self._cv = threading.Condition()
        self._queue: list = []  # (enqueue_time, _Request)
        self._closed = False
        # observability: device calls issued vs rows served — the
        # coalescing ratio is rows/batches
        self.batches = 0
        self.rows = 0
        self._worker = threading.Thread(
            target=self._run, name="dynamic-batcher", daemon=True)
        self._worker.start()

    def __call__(self, **inputs) -> np.ndarray:
        """Enqueue one request (any row count) and block for its slice of
        the batched result."""
        inputs = {k: np.asarray(v) for k, v in inputs.items()
                  if k not in RESERVED_KEYS}
        if not inputs:
            raise ValueError("empty request")
        req = _Request(inputs, len(next(iter(inputs.values()))))
        with self._cv:
            if self._closed:
                raise RuntimeError("DynamicBatcher is closed")
            if self._max_queue is not None:
                pending = sum(r.n for _, r in self._queue)
                if pending + req.n > self._max_queue:
                    self.rejected += 1
                    raise QueueFull(
                        f"DynamicBatcher queue full: {pending} rows pending "
                        f"(max_queue={self._max_queue}); request of {req.n} "
                        f"row(s) rejected — retry later or raise max_queue")
            self._queue.append((time.monotonic(), req))
            self._cv.notify_all()
        if not req.event.wait(self._timeout):
            # withdraw if still queued (bounds memory under a wedge); if
            # already mid-flight the result is simply abandoned
            with self._cv:
                self._queue = [(t, r) for t, r in self._queue if r is not req]
            raise TimeoutError(
                f"DynamicBatcher request timed out after {self._timeout}s "
                f"(device call wedged or overloaded)")
        if req.error is not None:
            raise req.error
        return req.result

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if not self._queue and self._closed:
                    return
                deadline = self._queue[0][0] + self._delay
                while (sum(r.n for _, r in self._queue) < self._max
                       and not self._closed):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                batch, self._queue = self._queue, []
            # group by key set — heterogeneous requests never mix
            groups: Dict[frozenset, list] = {}
            for _, r in batch:
                groups.setdefault(frozenset(r.inputs), []).append(r)
            for reqs in groups.values():
                try:
                    joined = {
                        k: (np.concatenate([r.inputs[k] for r in reqs])
                            if len(reqs) > 1 else reqs[0].inputs[k])
                        for k in reqs[0].inputs
                    }
                    out = np.asarray(self.predictor(**joined))
                    self.batches += 1
                    self.rows += sum(r.n for r in reqs)
                    off = 0
                    for r in reqs:
                        r.result = out[off:off + r.n]
                        off += r.n
                except Exception as e:  # deliver, don't kill the worker
                    for r in reqs:
                        r.error = e
                finally:
                    for r in reqs:
                        r.event.set()

    def close(self):
        """Drain the queue and stop the worker (idempotent)."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
