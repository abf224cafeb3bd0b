"""High-level dataset explainer — the ``EEGExplainer`` API surface.

Reference: ``EEGExplainer`` (``eeg_xai_analysis.py:498-693``) wraps a model
and runs per-sample predict → saliency → gradient×input → IG → channel/
region importance, then ``create_analysis_report`` writes plots + a text
report. The reference loops samples on host; here one call explains the
whole dataset batched (all attributions are single compiled programs) and
produces the same artifact set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

from multimodal_eeg_fmri_tpu.xai.analysis import (
    ChannelImportance,
    channel_importance_from_attribution,
    connectivity_pair_importance,
)
from multimodal_eeg_fmri_tpu.xai.attribution import (
    gradient_saliency,
    gradient_x_input,
    integrated_gradients,
    make_apply_fn,
)


@dataclass
class ExplanationResult:
    predictions: np.ndarray                  # (N,)
    probs: np.ndarray                        # (N, C)
    saliency: Dict[str, np.ndarray]
    grad_x_input: Dict[str, np.ndarray]
    integrated_gradients: Dict[str, np.ndarray]
    channel_importance: Dict[str, ChannelImportance]
    pair_importance: Optional[dict] = None
    region_importance: Dict[str, Dict[str, float]] = field(
        default_factory=dict)


class Explainer:
    """Batched whole-dataset explainer for any model in the zoo."""

    def __init__(self, model, params, batch_stats=None,
                 temporal_keys: Sequence[str] = ("erp", "pw"),
                 conn_key: Optional[str] = "conn",
                 channel_names: Optional[Sequence[str]] = None,
                 ig_steps: int = 50):
        self.model = model
        self.apply_fn = make_apply_fn(model, params, batch_stats)
        self.temporal_keys = tuple(temporal_keys)
        self.conn_key = conn_key
        self.channel_names = channel_names
        self.ig_steps = ig_steps

    def explain(self, inputs: Dict[str, Any],
                target_class=None) -> ExplanationResult:
        import jax
        import jax.numpy as jnp

        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        logits = self.apply_fn(inputs)
        probs = np.asarray(jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1))
        preds = probs.argmax(-1)

        sal = jax.device_get(gradient_saliency(
            self.apply_fn, inputs, target_class))
        gxi = jax.device_get(gradient_x_input(
            self.apply_fn, inputs, target_class))
        ig = jax.device_get(integrated_gradients(
            self.apply_fn, inputs, target_class, n_steps=self.ig_steps))

        ci = {}
        regions = {}
        for k in self.temporal_keys:
            if k in ig:
                ci[k] = channel_importance_from_attribution(
                    np.asarray(ig[k]),
                    channel_names=(self.channel_names
                                   if k == "erp" else None))
                regions[k] = ci[k].region_values
        pairs = None
        if self.conn_key and self.conn_key in ig:
            arr = np.asarray(ig[self.conn_key])
            if arr.ndim == 2 and arr.shape[1] % 3 == 0:
                pairs = connectivity_pair_importance(
                    arr, channel_names=self.channel_names)

        return ExplanationResult(
            predictions=preds, probs=probs,
            saliency={k: np.asarray(v) for k, v in sal.items()},
            grad_x_input={k: np.asarray(v) for k, v in gxi.items()},
            integrated_gradients={k: np.asarray(v) for k, v in ig.items()},
            channel_importance=ci, pair_importance=pairs,
            region_importance=regions,
        )

    def analyze_dataset(self, inputs: Dict[str, Any],
                        output_dir: str | Path,
                        metrics: Optional[Dict[str, float]] = None,
                        target_class=None) -> ExplanationResult:
        """Explain + write the reference's artifact set (channel bars,
        topomap, region radar, text report, NPZ arrays)."""
        from multimodal_eeg_fmri_tpu.report.export import (
            export_xai_arrays,
            write_analysis_report,
        )
        from multimodal_eeg_fmri_tpu.report.plots import (
            plot_channel_importance,
            plot_region_radar,
            plot_topomap,
        )

        res = self.explain(inputs, target_class)
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        if "erp" in res.channel_importance:
            ci = res.channel_importance["erp"]
            plot_channel_importance(ci, out / "channel_importance.png")
            plot_topomap(ci, out / "topomap.png")
            plot_region_radar(ci, out / "region_radar.png")
            write_analysis_report(out / "xai_report.txt", ci,
                                  metrics=metrics)
        export_xai_arrays(
            {f"ig_{k}": v for k, v in res.integrated_gradients.items()}
            | {f"saliency_{k}": v for k, v in res.saliency.items()},
            out, prefix="xai_arrays", timestamp=False)
        return res
