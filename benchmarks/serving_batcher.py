"""DynamicBatcher under concurrent load: throughput + coalescing ratio.

The serving claim (docs/DESIGN.md "Dynamic request batching") is that
concurrent single-row requests amortize the per-call cost — dispatch
locally, the ~25-30 ms link round trip through the tunnel — across every
row in a flush window. This script measures it: C client threads each
issue R sequential single-row requests against

  (a) the naked ``Predictor`` (one device call per request), and
  (b) ``DynamicBatcher(max_delay_ms=d)`` for several d,

reporting rows/s, mean per-request latency, and device calls issued
(rows/calls = the coalescing ratio). On CPU the effect is dispatch-bound;
through the tunnel each naked call pays the full link floor and the
batched path pays it once per window.

Usage: python benchmarks/serving_batcher.py [clients] [reqs_per_client]
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.serving import DynamicBatcher, Predictor

B, T = 8, 250


def build_predictor():
    model = TriModalFusionNetV4Lite()
    rng = np.random.default_rng(0)
    example = {
        "erp": rng.standard_normal((B, T, 18)).astype(np.float32),
        "pw": rng.standard_normal((B, T, 75)).astype(np.float32),
        "conn": rng.standard_normal((B, 459)).astype(np.float32),
    }
    variables = model.init({"params": jax.random.key(0)}, **example,
                           train=False)
    p = Predictor(model, variables["params"],
                  variables.get("batch_stats"), batch_size=B)
    p(**example)  # compile before timing
    return p, example


def drive(call, example, clients: int, reqs: int):
    """C threads x R sequential single-row requests; returns wall s and
    per-request latencies. Inputs are perturbed per request so a
    memoizing link cannot cache (CLAUDE.md benchmarking gotcha)."""
    lat = [[] for _ in range(clients)]

    def client(c):
        for r in range(reqs):
            eps = np.float32(1e-3 * (c * reqs + r + 1))
            req = {k: v[:1] + eps for k, v in example.items()}
            t0 = time.perf_counter()
            out = call(**req)
            assert out.shape[0] == 1
            lat[c].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    flat = [x for l in lat for x in l]
    return wall, flat


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reqs = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    pred, example = build_predictor()
    platform = jax.devices()[0].platform
    total = clients * reqs
    out = {"metric": "serving_batcher", "platform": platform,
           "clients": clients, "reqs_per_client": reqs}

    wall, lat = drive(pred, example, clients, reqs)
    out["naked"] = {
        "rows_per_s": round(total / wall, 1),
        "mean_latency_ms": round(1e3 * float(np.mean(lat)), 2),
        "device_calls": total,
    }

    for delay in (2.0, 5.0, 10.0):
        with DynamicBatcher(pred, max_delay_ms=delay) as b:
            wall, lat = drive(b, example, clients, reqs)
            out[f"batched_{delay:g}ms"] = {
                "rows_per_s": round(total / wall, 1),
                "mean_latency_ms": round(1e3 * float(np.mean(lat)), 2),
                "device_calls": b.batches,
                "coalescing": round(b.rows / max(b.batches, 1), 2),
            }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
