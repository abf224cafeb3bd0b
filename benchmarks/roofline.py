"""Roofline placement of the framework's hot paths on the real chip.

Speed-of-light claims need floors, not vibes. This script:

1. Measures the chip's *achievable* ceilings (not datasheet numbers):
   - matmul TFLOP/s, f32 and bf16, via chained 4096² matmuls in one
     ``lax.scan`` dispatch (carry dependency defeats hoisting);
   - HBM streaming GB/s via a large elementwise update (read + write).
2. Pulls the *exact* per-step FLOPs and HBM traffic of the headline fused
   EEG+fMRI train step (bench.build_step — the deployed shape) from XLA's
   own ``compiled.cost_analysis()``.
3. Derives compute/memory floors and places the measured step time against
   them — quantifying how far the production step is from any roofline
   (it is latency/dispatch-bound at batch 8: docs/DESIGN.md), and where
   the long-context flash-attention path sits at T=8192 where the MXU
   actually has work to do.

Timing uses the tunnel-safe protocol (CLAUDE.md): one scan dispatch per
measurement, operands staged on DEVICE with completion forced before t0
(a 64-256 MB host→device transfer through the tunnel otherwise lands in
the timed region and the "ceiling" measures the ~30 MB/s LINK), inputs
perturbed on-device per rep (0.01·i — survives bf16 rounding), host
scalar fetch as sync, measured link floor subtracted.

Run: ``python benchmarks/roofline.py`` (real v5e; CPU works but the
ceilings are then host numbers).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fetch_floor():
    """Measured link round-trip floor (host fetch of one device scalar)."""
    import jax.numpy as jnp

    x = jnp.float32(1.0)
    float(x)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(x + np.float32(np.random.rand()))
        best = min(best, time.perf_counter() - t0)
    return best


def _put(x, dtype=None):
    """Host → device ONCE, completion forced by a scalar fetch.

    Through the tunnel a host→device transfer of a 64-256 MB operand runs
    at link speed (~30 MB/s observed); letting it land inside the timed
    region makes every "ceiling" a LINK measurement (first r05 run:
    3 TFLOP/s "matmul peak", 4 GB/s "HBM", and the headline step 0.6×
    ABOVE its own floor — impossible, which is how this was caught)."""
    import jax.numpy as jnp

    a = jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype=dtype)
    float(a.ravel()[0])
    return a


def _timed_scan(base_args, run, reps=4):
    """Best wall time of one scan dispatch over DEVICE-resident operands,
    fetch-synced, floor-subtracted. Per rep each operand is perturbed ON
    DEVICE (distinct eps per rep — the tunnel memoizes repeated identical
    executions) and re-materialized with a scalar fetch BEFORE t0, so the
    timed region is dispatch + chain + one scalar fetch only. eps=0.01·i:
    large enough to survive bfloat16 rounding (1e-3 on an N(0,1) operand
    rounds away below bf16's ~2^-8 relative step and the loop would get
    memoized)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def perturb(a, eps):
        return a + eps.astype(a.dtype)

    run(*base_args)  # compile + warm
    floor = _fetch_floor()
    best = float("inf")
    for i in range(1, reps + 1):
        args = tuple(perturb(a, jnp.float32(0.01 * i)) for a in base_args)
        for a in args:
            float(a.ravel()[0])  # force on-device materialization
        t0 = time.perf_counter()
        run(*args)
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, 1e-9)


def measure_matmul_peak(dtype, n=4096, k_steps=48):
    import jax
    import jax.numpy as jnp

    r = np.random.default_rng(0)
    a0 = r.standard_normal((n, n)).astype(np.float32)
    # scale so the chained carry keeps operator norm ~1 (a Gaussian's is
    # ~2√n): no overflow/underflow even across 48 bf16 matmuls
    b0 = r.standard_normal((n, n)).astype(np.float32) / (2.0 * np.sqrt(n))

    @jax.jit
    def chain(a, b):
        def step(c, _):
            return jnp.dot(c, b, preferred_element_type=c.dtype), None

        c, _ = jax.lax.scan(step, a, None, length=k_steps)
        return c.ravel()[0]

    t = _timed_scan((_put(a0, dtype), _put(b0, dtype)),
                    lambda a, b: float(chain(a, b)))
    flops = 2.0 * n * n * n * k_steps
    return flops / t / 1e12  # TFLOP/s


def measure_hbm_bw(mb=256, k_steps=48):
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 4
    x0 = np.random.default_rng(1).standard_normal(n).astype(np.float32)

    @jax.jit
    def stream(x):
        def step(c, _):
            return c * np.float32(0.999) + np.float32(1e-6), None

        c, _ = jax.lax.scan(step, x, None, length=k_steps)
        return c[0]

    t = _timed_scan((_put(x0),), lambda x: float(stream(x)))
    gb = 2.0 * n * 4 * k_steps / 1e9  # read + write per step
    return gb / t  # GB/s


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(
        ca.get("bytes accessed", ca.get("bytes_accessed", 0.0)))


def analyze_train_step():
    """Exact per-step cost of the headline fused step + measured time."""
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    run_steps, (params, bs, opt) = bench.build_step()
    from multimodal_eeg_fmri_tpu.core.rng import training_key

    rngs = jax.random.split(training_key(0), 100)
    try:
        flops, bytes_ = _cost(
            run_steps.lower(params, bs, opt, rngs).compile())
    except Exception as e:  # cost_analysis availability varies by backend
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        flops = bytes_ = float("nan")
    ms = bench.bench_train_step()
    return flops / 100, bytes_ / 100, ms


def analyze_flash(t_len=8192, b=1, h=8, d=64, block=1024, k_steps=8):
    import jax
    import jax.numpy as jnp

    from multimodal_eeg_fmri_tpu.ops.attention import flash_attention

    r = np.random.default_rng(2)
    q0 = r.standard_normal((b, h, t_len, d)).astype(np.float32)

    @jax.jit
    def chain(q, k, v):
        # k_steps chained calls in ONE dispatch (CLAUDE.md measurement
        # rule: per-call dispatch adds 3-16 ms — comparable to the ~17 ms
        # kernel itself at T=8192). The carry (attention output, a convex
        # combination of V rows) stays bounded, so the chain is stable.
        def step(qc, _):
            return flash_attention(qc, k, v, block_q=block,
                                   block_k=block), None

        out, _ = jax.lax.scan(step, q, None, length=k_steps)
        return out.ravel()[0]

    q_dev = _put(q0)
    t = _timed_scan((q_dev, q_dev, q_dev),
                    lambda *a: float(chain(*a))) / k_steps
    # forward attention FLOPs: QK^T (2*T^2*D) + PV (2*T^2*D) per head
    flops = 4.0 * b * h * t_len * t_len * d
    return flops, t


def main():
    import jax

    out = {"backend": jax.default_backend()}
    out["matmul_f32_tflops"] = round(measure_matmul_peak("float32"), 1)
    out["matmul_bf16_tflops"] = round(measure_matmul_peak("bfloat16"), 1)
    out["hbm_stream_gbps"] = round(measure_hbm_bw(), 0)

    step_flops, step_bytes, step_ms = analyze_train_step()
    out["step_flops"] = round(step_flops / 1e6, 1)  # MFLOP
    out["step_hbm_mb"] = round(step_bytes / 1e6, 1)
    out["step_measured_ms"] = round(step_ms, 3)
    compute_floor_us = step_flops / (out["matmul_f32_tflops"] * 1e12) * 1e6
    memory_floor_us = step_bytes / (out["hbm_stream_gbps"] * 1e9) * 1e6
    out["step_compute_floor_us"] = round(compute_floor_us, 1)
    out["step_memory_floor_us"] = round(memory_floor_us, 1)
    out["step_x_above_floor"] = round(
        step_ms * 1000 / max(compute_floor_us, memory_floor_us), 1)

    fl_flops, fl_t = analyze_flash()
    out["flash8k_measured_ms"] = round(fl_t * 1e3, 2)
    out["flash8k_tflops"] = round(fl_flops / fl_t / 1e12, 1)
    out["flash8k_pct_of_f32_peak"] = round(
        100 * (fl_flops / fl_t / 1e12) / out["matmul_f32_tflops"], 1)

    print(json.dumps({"metric": "roofline", **out}))


if __name__ == "__main__":
    main()
