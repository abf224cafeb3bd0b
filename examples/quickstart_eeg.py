"""Quickstart: tri-modal EEG training + evaluation + XAI on synthetic data.

Runs in ~2-4 min on CPU (`python examples/quickstart_eeg.py --cpu`) or on a
TPU chip as-is. Swap `synthetic_eeg_trimodal` for `data.loaders` +
`data.handler.build_trimodal_arrays` when a real data root is available.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="./results_quickstart")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multimodal_eeg_fmri_tpu.core.config import TrainConfig
    from multimodal_eeg_fmri_tpu.data.synthetic import synthetic_eeg_trimodal
    from multimodal_eeg_fmri_tpu.models import TriModalFusionNetV4Lite
    from multimodal_eeg_fmri_tpu.ops.augment import make_eeg_augment
    from multimodal_eeg_fmri_tpu.report.export import export_cv_results, write_analysis_report
    from multimodal_eeg_fmri_tpu.report.plots import (
        plot_channel_importance,
        plot_fold_metrics,
        plot_region_radar,
        plot_topomap,
    )
    from multimodal_eeg_fmri_tpu.train.cv import eeg_kfold_splits, run_cv
    from multimodal_eeg_fmri_tpu.xai.analysis import channel_importance_from_attribution
    from multimodal_eeg_fmri_tpu.xai.attribution import integrated_gradients, make_apply_fn

    # 1) data (66 synthetic subjects at the reference's shapes)
    data = synthetic_eeg_trimodal(n_subjects=66, separation=1.0, seed=0)

    # 2) fold-parallel 5-fold training
    cfg = TrainConfig(batch_size=8, num_epochs=args.epochs,
                      learning_rate=1e-3, schedule="warmup_cosine",
                      loss="label_smoothing", selection="val", patience=15)
    splits = eeg_kfold_splits(data, cfg, n_splits=5)
    result = run_cv(TriModalFusionNetV4Lite(), cfg, data, splits,
                    normalize_keys=("erp", "pw", "conn"),
                    augment=make_eeg_augment())
    print("5-fold summary:",
          {k: f"{m:.3f}±{s:.3f}" for k, (m, s) in result.summary.items()})

    out = Path(args.out)
    export_cv_results({"trimodal_lite": result}, out, timestamp=False)
    plot_fold_metrics(result, path=out / "folds.png")

    # 3) XAI on fold 0's best model — integrated gradients over the test set
    import jax.numpy as jnp

    fold0 = jax.tree_util.tree_map(lambda x: x[0], result.params)
    bs0 = jax.tree_util.tree_map(lambda x: x[0], result.batch_stats)
    apply_fn = make_apply_fn(TriModalFusionNetV4Lite(), fold0, bs0)
    test_idx = splits[0].test
    inputs = {k: jnp.asarray(data[k][test_idx])
              for k in ("erp", "pw", "conn")}
    ig = integrated_gradients(apply_fn, inputs, n_steps=50)
    ci = channel_importance_from_attribution(np.asarray(ig["erp"]))
    print("top ERP channels:", ci.top_k(5))
    plot_channel_importance(ci, out / "channels.png")
    plot_topomap(ci, out / "topomap.png")
    plot_region_radar(ci, out / "regions.png")
    write_analysis_report(out / "xai_report.txt", ci,
                          metrics={k: v[0] for k, v in result.summary.items()})
    print("wrote results to", out)


if __name__ == "__main__":
    main()
