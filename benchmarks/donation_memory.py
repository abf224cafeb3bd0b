"""Carry-donation memory effect — AOT `memory_analysis()` of the resumable
chunk step (train/resilient.py) with vs without `donate_argnums=(5,)`.

Reproduces docs/DESIGN.md's "Buffer donation (measured)" numbers: the resume
carry pytree matches FitResult.carry exactly, so XLA aliases every buffer
in place and one full training-state copy disappears from peak HBM.

Usage: python benchmarks/donation_memory.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig  # noqa: E402
from multimodal_eeg_fmri_tpu.data import (  # noqa: E402
    pad_rows, synthetic_eeg_trimodal)
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4  # noqa: E402
from multimodal_eeg_fmri_tpu.train.fit import make_fit_fn  # noqa: E402

MB = 1024 * 1024


def analyze(donate: bool):
    cfg = TrainConfig(batch_size=8, num_epochs=10, selection="train_loss")
    model = TriModalFusionNetV4()
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=250, seed=0)
    data.pop("subject")
    data = pad_rows(data, 32)
    data = jax.tree_util.tree_map(jnp.asarray, data)

    fit = make_fit_fn(model, cfg, num_epochs=10, eval_names=())
    jit_kw = {"donate_argnums": (5,)} if donate else {}
    # first call builds the carry structure to resume from
    carry = jax.eval_shape(fit, jax.random.key(0), data, {}, None, None,
                           None).carry
    carry = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), carry)
    lowered = jax.jit(fit, **jit_kw).lower(
        jax.random.key(0), data, {}, None, None, carry)
    m = lowered.compile().memory_analysis()
    return {
        "argument_mb": round(m.argument_size_in_bytes / MB, 1),
        "output_mb": round(m.output_size_in_bytes / MB, 1),
        "alias_mb": round(m.alias_size_in_bytes / MB, 1),
        "temp_mb": round(m.temp_size_in_bytes / MB, 1),
        "peak_mb": round((m.argument_size_in_bytes
                          + m.output_size_in_bytes
                          + m.temp_size_in_bytes
                          - m.alias_size_in_bytes) / MB, 1),
    }


def main():
    rows = {}
    for donate in (False, True):
        rows["donated" if donate else "undonated"] = analyze(donate)
        print(f"donate={donate}: {rows['donated' if donate else 'undonated']}",
              flush=True)
    saved = rows["undonated"]["peak_mb"] - rows["donated"]["peak_mb"]
    print(json.dumps({"metric": "carry_donation_peak_saving_mb",
                      "value": round(saved, 1), "rows": rows}))


if __name__ == "__main__":
    main()
