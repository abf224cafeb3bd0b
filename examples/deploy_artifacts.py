"""Deployment artifacts end-to-end: train → export → serve with NOTHING
but the artifact files.

Three artifact kinds (docs/DEPLOY.md "Serving"):
1. single-model StableHLO (`Predictor.export_artifact`) — weights baked in;
2. K-model late-fusion ensemble, same one-file form;
3. an AOT training bundle (`core/aot.py`) — the compiled training program
   itself, weights as arguments (also the warm-start cache format).

The "serving site" section below deliberately uses only `load_artifact` /
`load_bundle` + arrays — no model classes, no checkpoints.

`python examples/deploy_artifacts.py` (CPU-friendly, ~2 min)
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from multimodal_eeg_fmri_tpu.core import export_jitted, load_bundle
from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.data import pad_rows, subset, synthetic_eeg_trimodal
from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
from multimodal_eeg_fmri_tpu.serving import (
    EnsemblePredictor, Predictor, load_artifact, stack_variable_trees)
from multimodal_eeg_fmri_tpu.train import make_fit_fn


def main():
    out = Path(tempfile.mkdtemp(prefix="mm_artifacts_"))
    data = synthetic_eeg_trimodal(n_subjects=32, time_steps=32,
                                  separation=1.5, seed=0)
    data.pop("subject")
    train = pad_rows(subset(data, np.arange(24)), 24)
    test = pad_rows(subset(data, np.arange(24, 32)), 8)
    dev = lambda t: {k: jnp.asarray(v) for k, v in t.items()}
    cfg = TrainConfig(batch_size=8, num_epochs=6, learning_rate=2e-3,
                      schedule="constant", selection="val", patience=100)
    model = TriModalFusionNetV4Lite(hidden_dim=16)
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=("val",)))

    # --- build side: train 3 "folds", export everything ---
    results = [fit(jax.random.key(i), dev(train), {"val": dev(test)}, None)
               for i in range(3)]
    example = {k: np.asarray(v)[:8] for k, v in test.items()}

    p = Predictor(model, results[0].params, results[0].batch_stats,
                  batch_size=8)
    p.export_artifact(example, out / "model.stablehlo")

    ens = EnsemblePredictor(
        model, stack_variable_trees([r.params for r in results]),
        stack_variable_trees([r.batch_stats for r in results]), batch_size=8)
    ens.export_artifact(example, out / "ensemble.stablehlo")

    args = (jax.random.key(0), dev(train), {"val": dev(test)}, None)
    export_jitted(fit, args, out / "training_program.shlo")
    print("exported:", sorted(f.name for f in out.iterdir()))

    # --- serving site: artifacts + arrays only ---
    inputs = {k: jnp.asarray(v) for k, v in example.items()
              if k in ("erp", "pw", "conn")}
    single = load_artifact(out / "model.stablehlo")(**inputs)
    fused = load_artifact(out / "ensemble.stablehlo")(**inputs)
    print("single-model probs[0]:", np.round(np.asarray(single[0]), 3))
    print("3-fold fused probs[0]:", np.round(np.asarray(fused[0]), 3))

    retrained = load_bundle(out / "training_program.shlo")(*args)
    print("re-run training from the bundle: best F1 =",
          float(retrained.best_metric))


if __name__ == "__main__":
    main()
