"""Inference/serving path.

The reference has no serving story (research scripts only). For production
deployment this module packages a trained model as a compiled predictor:

- fixed-shape jitted forward with optional fused preprocessing;
- automatic batch padding/truncation to the compiled batch size (serve any
  request size against one executable);
- warmup + latency percentiles (`Predictor.benchmark`);
- construction straight from a checkpoint directory
  (`Predictor.from_checkpoint` — consumes core/checkpoint.py artifacts).
"""

from __future__ import annotations

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
    ):
        self.model = model
        self.batch_size = batch_size
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def _forward(variables, inputs):
            if preprocess is not None:
                inputs = {**inputs, **preprocess(inputs)}
            out = model.apply(variables, **inputs, train=False)
            logits = out.logits
            if return_probs:
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return logits

        self._variables = variables
        self._forward = jax.jit(_forward)

    @classmethod
    def from_checkpoint(cls, model, checkpoint_path, **kw) -> "Predictor":
        from multimodal_eeg_fmri_tpu.core.checkpoint import load_checkpoint

        restored = load_checkpoint(checkpoint_path)
        return cls(model, restored["params"],
                   restored.get("batch_stats"), **kw)

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

    def benchmark(self, example: Dict[str, np.ndarray], warmup: int = 3,
                  iters: int = 30) -> Dict[str, float]:
        """Serving-latency percentiles for one compiled batch."""
        dev = {k: jnp.asarray(np.asarray(v)[: self.batch_size])
               for k, v in example.items() if k not in RESERVED_KEYS}
        for _ in range(warmup):
            jax.block_until_ready(self._forward(self._variables, dev))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(self._forward(self._variables, dev))
            times.append((time.perf_counter() - t0) * 1000.0)
        a = np.asarray(times)
        return {"p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "mean_ms": float(a.mean()),
                "batch_size": self.batch_size}
