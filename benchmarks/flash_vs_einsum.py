"""Flash (Pallas) vs einsum attention, forward and backward, over T.

Reproduces docs/DESIGN.md's "Flash attention" table. Timing follows the
tunnel rules (benchmarks/README.md): host scalar fetch as the sync, inputs
perturbed ≥1e-3 per rep so the tunnel cannot memoize; the reported number
still includes the ~25 ms round-trip floor — subtract it for kernel time.

Usage: python benchmarks/flash_vs_einsum.py [T ...]   (default 512 2048 8192)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.ops.attention import (  # noqa: E402
    flash_attention, reference_attention)

B, H, D = 4, 8, 64


def _time(fn, x, reps=4):
    """Best-of-reps ms; x is perturbed per rep to defeat tunnel memoization."""
    best = float("inf")
    for i in range(1, reps + 1):
        xi = x + 1e-3 * i
        t0 = time.perf_counter()
        float(fn(xi))  # host scalar fetch = the only reliable sync here
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return best


def bench_T(T: int, block: int = 512):
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, H, T, D), jnp.float32)

    def make(fn):
        fwd = jax.jit(lambda x: jnp.sum(fn(x, x, x)))
        bwd = jax.jit(jax.grad(lambda x: jnp.sum(fn(x, x, x))))
        return fwd, lambda x: jnp.sum(bwd(x))

    row = {}
    for name, fn in (
        ("einsum", reference_attention),
        (f"flash[{block}]",
         lambda q_, k_, v_: flash_attention(q_, k_, v_, block, block)),
    ):
        fwd, bwd = make(fn)
        try:
            float(fwd(q))  # compile
            row[f"{name} fwd"] = round(_time(fwd, q), 2)
        except Exception as e:
            row[f"{name} fwd"] = f"OOM/err: {type(e).__name__}"
            continue
        try:
            float(bwd(q))  # compile
            row[f"{name} bwd"] = round(_time(bwd, q), 2)
        except Exception as e:
            row[f"{name} bwd"] = f"OOM/err: {type(e).__name__}"
    return row


def main():
    Ts = [int(a) for a in sys.argv[1:]] or [512, 2048, 8192]
    table = {}
    for T in Ts:
        table[T] = bench_T(T)
        print(f"T={T}: {table[T]}", flush=True)
    print(json.dumps({"metric": "attention_ms_incl_fetch_floor",
                      "shape": [B, H, "T", D], "rows": table}))


if __name__ == "__main__":
    main()
