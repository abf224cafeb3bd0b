"""Quickstart: train K CV folds, export per-fold checkpoints, and serve all
of them as ONE compiled late-fusion ensemble sharded over the device mesh.

This is the deployment form of the reference's `evaluate_late_fusion`
(`EEG_CODE/CrossModal_EEG_scr.ipynb §34`), which loads its fold checkpoints
and averages probabilities sequentially on the host. Here the K parameter
trees stack on a member axis, one vmapped forward serves every model, and
on a multi-chip mesh the member axis shards over `ensemble` — K models at
one model's latency.

Runs in ~2-3 min on CPU (`python examples/serve_ensemble.py --cpu`); with 8
virtual devices (the default below) the ensemble really executes sharded.
"""

import argparse
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--folds", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8"
                                   ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from multimodal_eeg_fmri_tpu.core.checkpoint import save_checkpoint
    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data import (
        balanced_class_weights, pad_rows, subset, synthetic_eeg_trimodal)
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.parallel import build_mesh
    from multimodal_eeg_fmri_tpu.serving import EnsemblePredictor
    from multimodal_eeg_fmri_tpu.train import make_fit_fn

    data = synthetic_eeg_trimodal(n_subjects=48, time_steps=64,
                                  separation=1.2, seed=3)
    data.pop("subject")
    n_train, n_test = 40, 8
    test = subset(data, np.arange(n_train, n_train + n_test))

    cfg = TrainConfig(batch_size=8, num_epochs=args.epochs,
                      learning_rate=2e-3, schedule="warmup_cosine",
                      loss="label_smoothing", selection="train_loss")
    model = TriModalFusionNetV4Lite()
    fit = jax.jit(make_fit_fn(model, cfg, eval_names=()))

    # Stage 1: train K folds (each on a rotated train subset) and export
    # per-fold checkpoints — the reference's best_*_fold{k}.pt layout.
    tmp = Path(tempfile.mkdtemp(prefix="ensemble_ckpts_"))
    paths = []
    for k in range(args.folds):
        idx = np.roll(np.arange(n_train), 10 * k)[: n_train - 8]
        tr = pad_rows(subset(data, idx), n_train - 8)
        res = fit(jax.random.key(k), jax.tree.map(jnp.asarray, tr), {},
                  jnp.asarray(balanced_class_weights(tr["label"],
                                                     weights=tr["weight"])))
        save_checkpoint(tmp / f"fold{k}", res.params, res.batch_stats)
        paths.append(tmp / f"fold{k}")
        print(f"fold {k}: final train loss "
              f"{float(np.asarray(res.history['train_loss'])[-1]):.3f}")

    # Stage 2: serve them all at once, sharded over the mesh ensemble axis.
    n_dev = len(jax.devices())
    plan = (build_mesh(ensemble=args.folds, data=n_dev // args.folds)
            if n_dev % args.folds == 0 and n_dev >= args.folds else None)
    print(f"devices={n_dev}, mesh="
          f"{dict(plan.mesh.shape) if plan else 'single-device (no shard)'}")
    ens = EnsemblePredictor.from_checkpoints(model, paths, plan=plan,
                                             batch_size=8)
    probs = ens(erp=test["erp"], pw=test["pw"], conn=test["conn"])
    pred = probs.argmax(-1)
    acc = float((pred == test["label"]).mean())
    print(f"late-fusion ensemble ({args.folds} folds): "
          f"test acc {acc:.3f}, probs[0]={np.round(probs[0], 3)}")


if __name__ == "__main__":
    main()
