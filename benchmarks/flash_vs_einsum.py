"""Flash (Pallas) vs einsum attention, forward and backward, over T.

Reproduces docs/DESIGN.md's "Flash attention" table. Timing is
scan-amortized per the tunnel rules (benchmarks/README.md): each device
call runs the op ITERS times inside one ``lax.scan`` whose carry perturbs
the input every iteration (so nothing hoists and the tunnel cannot
memoize), synced by a host scalar fetch; two scan lengths are differenced
to cancel the ~25 ms fetch floor and any per-call fixed overhead. The
reported number is ms per single op execution.

Variants: einsum oracle, flash at block 512 and 1024, each in f32 and
bf16 MXU compute (``compute_dtype`` — f32 accumulation either way).

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

from multimodal_eeg_fmri_tpu.ops.attention import (  # noqa: E402
    flash_attention, reference_attention)

B, H, D = 4, 8, 64
ITERS_LO, ITERS_HI = 2, 10


def _scan_runner(op, iters):
    """jit(scan(op)) with a carry-perturbed input; returns a host scalar."""

    @jax.jit
    def run(x):
        def body(c, _):
            c = c + 1e-3
            return c, op(c)
        _, ys = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(ys)

    return run


def _time_op(op, x, reps=3):
    """ms per op execution: difference of two scan lengths, best of reps."""
    lo = _scan_runner(op, ITERS_LO)
    hi = _scan_runner(op, ITERS_HI)
    float(lo(x)), float(hi(x))  # compile both
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(lo(x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(hi(x))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (ITERS_HI - ITERS_LO))
    return best * 1000.0


def bench_T(T: int):
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, H, T, D), jnp.float32)
    float(jnp.sum(q))  # force the operand onto the device before timing

    variants = [("einsum", reference_attention)]
    for block in (512, 1024):
        for dt_name, dt in (("", jnp.float32), ("/bf16", jnp.bfloat16)):
            variants.append((
                f"flash[{block}]{dt_name}",
                lambda q_, k_, v_, b=block, d=dt: flash_attention(
                    q_, k_, v_, b, b, compute_dtype=d)))

    row = {}
    for name, fn in variants:
        fwd_op = lambda x: jnp.sum(fn(x, x, x))
        bwd_op = lambda x: jnp.sum(jax.grad(
            lambda y: jnp.sum(fn(y, y, y)))(x))
        try:
            row[f"{name} fwd"] = round(_time_op(fwd_op, q), 2)
        except Exception as e:
            row[f"{name} fwd"] = f"OOM/err: {type(e).__name__}"
            continue
        try:
            row[f"{name} bwd"] = round(_time_op(bwd_op, q), 2)
        except Exception as e:
            row[f"{name} bwd"] = f"OOM/err: {type(e).__name__}"
    return row


def main():
    Ts = [int(a) for a in sys.argv[1:]] or [512, 2048, 8192]
    table = {}
    for T in Ts:
        table[T] = bench_T(T)
        print(f"T={T}: {table[T]}", flush=True)
    print(json.dumps({"metric": "attention_ms_per_op_scan_amortized",
                      "shape": [B, H, "T", D], "rows": table}))


if __name__ == "__main__":
    main()
