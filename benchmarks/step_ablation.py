"""Cost attribution of the fused EEG+fMRI train step.

Reproduces docs/DESIGN.md's "Fused-step cost structure" table: each variant
rebuilds the step with one knob changed, runs K steps per device call in a
`lax.scan` (amortizing the tunnel round trip), and reports best-of-3 ms/step.

Usage: python benchmarks/step_ablation.py            # real TPU
       BENCH_BF16=1 python benchmarks/step_ablation.py  # add the bf16 row
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_train_step  # noqa: E402

VARIANTS = [
    ("baseline (rbg dropout keys)", {}),
    ("forward only (no bwd/optimizer)", {"forward_only": True}),
    ("dropout off", {"dropout": 0.0}),
    ("augmentation off", {"augment": False}),
    ("1 transformer layer (of 2)", {"num_transformer_layers": 1}),
    ("threefry dropout keys", {"rng_impl": "threefry"}),
]


def main():
    rows = {}
    base = None
    for name, kw in VARIANTS:
        ms = bench_train_step(**kw)
        rows[name] = round(ms, 4)
        if base is None:
            base = ms
        print(f"{name:40s} {ms:8.3f} ms/step  "
              f"(delta {ms - base:+.3f})", flush=True)
    print(json.dumps({"metric": "step_ablation_ms", "value": rows[
        "baseline (rbg dropout keys)"], "unit": "ms/step", "rows": rows}))


if __name__ == "__main__":
    main()
