"""Flash-attention block-size sweep at long T (finds the default block).

Same scan-amortized timing as flash_vs_einsum.py. Sweeps (block_q,
block_k) at T=8192 (B=4, H=8, D=64) in f32, fwd and fwd+bwd.

Usage: python benchmarks/flash_block_sweep.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from benchmarks.flash_vs_einsum import _time_op, B, H, D  # noqa: E402
from multimodal_eeg_fmri_tpu.ops.attention import (  # noqa: E402
    flash_attention)

T = 8192
BLOCKS = [(512, 512), (1024, 1024), (2048, 1024), (1024, 2048),
          (2048, 2048), (512, 2048), (2048, 512)]


def main():
    q = jax.random.normal(jax.random.key(0), (B, H, T, D), jnp.float32)
    float(jnp.sum(q))  # stage on device
    rows = {}
    for bq, bk in BLOCKS:
        fn = lambda x, b=bq, c=bk: flash_attention(x, x, x, b, c)
        fwd_op = lambda x, f=fn: jnp.sum(f(x))
        bwd_op = lambda x, f=fn: jnp.sum(jax.grad(
            lambda y: jnp.sum(f(y)))(x))
        name = f"{bq}x{bk}"
        try:
            rows[name] = {"fwd": round(_time_op(fwd_op, q), 2),
                          "bwd": round(_time_op(bwd_op, q), 2)}
        except Exception as e:
            rows[name] = f"err: {type(e).__name__}"
        print(f"{name}: {rows[name]}", flush=True)
    print(json.dumps({"metric": "flash_block_sweep_ms", "T": T,
                      "shape": [B, H, T, D], "rows": rows}))


if __name__ == "__main__":
    main()
