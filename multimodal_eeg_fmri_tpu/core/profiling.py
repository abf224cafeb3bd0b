"""Profiling & tracing.

The reference has no profiling at all (SURVEY §5: only tqdm bars and
wall-clock filename timestamps). Here step time is a first-class metric:

- ``trace()``        — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (XLA ops, fusion, HBM traffic).
- ``StepTimer``      — blocking step timer with warmup discard and
  mean/p50/p95 stats; used by bench.py-style measurements.
- ``timed_fn``       — wraps a jitted callable, recording per-call device
  time (block_until_ready) into a MetricsLogger.
- ``annotate``       — ``jax.named_scope`` alias so model code can label
  regions in traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax

annotate = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str | Path = "./profile",
          host_tracer_level: int = 2):
    """Capture a device+host profile for the enclosed block."""
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timing with device sync; discards warmup."""

    warmup: int = 2
    times_ms: List[float] = field(default_factory=list)
    _seen: int = 0

    @contextlib.contextmanager
    def step(self, result_to_block: Any = None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self._record(time.perf_counter() - t0)

    def time_call(self, fn: Callable, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._record(time.perf_counter() - t0)
        return out

    def _record(self, dt: float):
        self._seen += 1
        if self._seen > self.warmup:
            self.times_ms.append(dt * 1000.0)

    def stats(self) -> Dict[str, float]:
        import numpy as np

        if not self.times_ms:
            return {}
        a = np.asarray(self.times_ms)
        return {
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p95_ms": float(np.percentile(a, 95)),
            "min_ms": float(a.min()),
            "n": len(a),
        }


def timed_fn(fn: Callable, metrics=None, tag: str = "step") -> Callable:
    """Wrap a (jitted) fn: every call blocks on the result and logs its
    duration to ``metrics`` (core.logging.MetricsLogger) under ``tag``."""
    counter = {"step": 0}

    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt_ms = (time.perf_counter() - t0) * 1000.0
        if metrics is not None:
            metrics.log(counter["step"], **{f"{tag}_ms": dt_ms})
        counter["step"] += 1
        return out

    return wrapper


def compiled_memory_stats(fn_jitted, *args) -> Optional[Dict[str, int]]:
    """Compiled-executable memory analysis (HBM footprint) when the backend
    exposes it — the observability handle for 'does this fit'."""
    try:
        lowered = fn_jitted.lower(*args)
        compiled = lowered.compile()
        analysis = compiled.memory_analysis()
        if analysis is None:
            return None
        return {
            "argument_bytes": int(getattr(analysis, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(analysis, "output_size_in_bytes", 0)),
            "temp_bytes": int(getattr(analysis, "temp_size_in_bytes", 0)),
            "generated_code_bytes": int(
                getattr(analysis, "generated_code_size_in_bytes", 0)),
        }
    except (AttributeError, NotImplementedError, jax.errors.JaxRuntimeError):
        return None
