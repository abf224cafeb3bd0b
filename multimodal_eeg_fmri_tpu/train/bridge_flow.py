"""Two-stage bridge pipeline: train → freeze → extract → bridge LOOCV.

Reference call stack (SURVEY §3.3, ``_test_bridge.py``):
1. load frozen stage-1 models from fold checkpoints, ``requires_grad_(False)``;
2. ``extract_eeg_features``: forward every EEG sample of a subject through
   the frozen tri-modal net, take the 128-d fused embedding, mean over the
   subject's samples; same for fMRI (64-d);
3. align embeddings by int-coerced subject id (``BridgeFeatureDataset``);
4. LOOCV: per held-out subject train a fresh bridge net (≤50 epochs, early
   stop on train loss), evaluate the held-out subject, run saliency + IG +
   attention extraction per fold.

TPU-native: extraction is one batched forward + a segment-mean over the
subject ids (no per-subject loop); the 32 LOOCV folds train simultaneously
via the fold-vmapped CV driver; per-fold XAI batches over all held-out
subjects at once using each fold's best params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_eeg_fmri_tpu.core.config import TrainConfig
from multimodal_eeg_fmri_tpu.models import BridgeFusionNet
from multimodal_eeg_fmri_tpu.train.cv import CVResult, loocv_splits, run_cv
from multimodal_eeg_fmri_tpu.train.fit import split_batch


def extract_fused_features(
    model,
    params,
    batch_stats,
    data: Dict[str, np.ndarray],
    subject_key: str = "subject",
) -> Tuple[np.ndarray, np.ndarray]:
    """Frozen-encoder feature extraction.

    Runs ONE batched forward over all samples and mean-pools the ``fused``
    embeddings per subject with a segment mean. Returns
    (unique_subjects (S,), embeddings (S, D)).
    """
    subjects = np.asarray(data[subject_key]).astype(np.int64)
    inputs = split_batch({k: jnp.asarray(v) for k, v in data.items()})

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out = jax.jit(lambda v, inp: model.apply(v, **inp, train=False))(
        variables, inputs
    )
    fused = np.asarray(out.fused)

    uniq, inv = np.unique(subjects, return_inverse=True)
    sums = np.zeros((len(uniq), fused.shape[1]), np.float64)
    np.add.at(sums, inv, fused)
    counts = np.bincount(inv, minlength=len(uniq))[:, None]
    return uniq, (sums / counts).astype(np.float32)


def align_bridge_dataset(
    eeg_subjects: np.ndarray,
    eeg_features: np.ndarray,
    fmri_subjects: np.ndarray,
    fmri_features: np.ndarray,
    labels: Dict[int, int],
) -> Dict[str, np.ndarray]:
    """Int-coerced subject alignment (reference ``BridgeFeatureDataset``,
    ``bridge_utils.py:120-152``: '001' != 1 fix). Raises if nothing aligns."""
    eeg_map = {int(s): f for s, f in zip(eeg_subjects, eeg_features)}
    fmri_map = {int(s): f for s, f in zip(fmri_subjects, fmri_features)}
    label_map = {int(k): v for k, v in labels.items()}
    common = sorted(set(eeg_map) & set(fmri_map) & set(label_map))
    if not common:
        raise ValueError(
            "no subjects aligned across EEG/fMRI/labels — check subject ids"
        )
    return {
        "eeg": np.stack([eeg_map[s] for s in common]).astype(np.float32),
        "fmri": np.stack([fmri_map[s] for s in common]).astype(np.float32),
        "label": np.asarray([label_map[s] for s in common], np.int32),
        "subject": np.asarray(common, np.int32),
    }


@dataclass
class BridgeResult:
    cv: CVResult
    loocv_metrics: Dict[str, float]      # pooled over held-out subjects
    per_subject: list                    # per-subject record dicts
    xai: Dict[str, np.ndarray]           # pooled saliency/IG per modality
    clinical: Dict[str, float] = None    # pooled clinical report (LOO conformal)


def run_bridge_loocv(
    bridge_data: Dict[str, np.ndarray],
    cfg: Optional[TrainConfig] = None,
    bridge_dim: int = 128,
    num_heads: int = 4,
    dropout: float = 0.3,
    with_xai: bool = True,
    ig_steps: int = 50,
) -> BridgeResult:
    """LOOCV over subjects with per-fold XAI — the reference's outer hot
    loop (``_test_bridge.py:826-989``), here one vmapped program."""
    from multimodal_eeg_fmri_tpu.report.metrics import (
        binary_classification_metrics,
    )
    from multimodal_eeg_fmri_tpu.xai.attribution import (
        gradient_saliency,
        integrated_gradients,
        make_apply_fn,
    )

    if cfg is None:
        # Derive from the shared TrainConfig defaults instead of re-hardcoding
        # the whole tree; only the bridge-specific stage-2 knobs differ
        # (reference ``_test_bridge.py:52-86``: lr 1e-4, wd 1e-4, selection
        # on train loss because LOOCV has no val split).
        import dataclasses

        cfg = dataclasses.replace(
            TrainConfig(), learning_rate=1e-4, weight_decay=1e-4,
            selection="train_loss",
        )
    model = BridgeFusionNet(
        eeg_dim=bridge_data["eeg"].shape[1],
        fmri_dim=bridge_data["fmri"].shape[1],
        bridge_dim=bridge_dim, num_heads=num_heads, dropout=dropout,
    )
    splits = loocv_splits(bridge_data)
    cv = run_cv(model, cfg, bridge_data, splits, normalize="none")

    # pooled LOOCV metrics over all held-out subjects (reference aggregates
    # exactly this way: one prediction per subject)
    probs, labels = [], []
    for f in range(cv.n_folds):
        w = cv.test_weight[f] > 0
        probs.append(cv.test_probs[f][w])
        labels.append(cv.test_labels[f][w])
    probs = np.concatenate(probs)
    labels = np.concatenate(labels)
    logits = np.log(np.maximum(probs, 1e-9))
    pooled = {
        k: float(v) for k, v in binary_classification_metrics(
            jnp.asarray(logits), jnp.asarray(labels)).items()
    }

    per_subject, xai = [], {}
    if with_xai:
        # per-fold XAI on the held-out subject, batched: fold axis via vmap
        def fold_xai(params, batch_stats, test):
            apply_fn = make_apply_fn(model, params, batch_stats)
            inputs = {"eeg": test["eeg"], "fmri": test["fmri"]}
            sal = gradient_saliency(apply_fn, inputs)
            ig = integrated_gradients(apply_fn, inputs, n_steps=ig_steps)
            out = model.apply(
                {"params": params, **({"batch_stats": batch_stats}
                                      if batch_stats else {})},
                **inputs, train=False)
            return sal, ig, out.fusion_weights, out.attn_weights

        test_stack = {
            "eeg": jnp.asarray(np.stack([bridge_data["eeg"][s.test]
                                         for s in splits])),
            "fmri": jnp.asarray(np.stack([bridge_data["fmri"][s.test]
                                          for s in splits])),
        }
        sal, ig, fw, aw = jax.jit(jax.vmap(fold_xai))(
            cv.params, cv.batch_stats, test_stack
        )
        xai = {
            "saliency_eeg": np.asarray(sal["eeg"])[:, 0],
            "saliency_fmri": np.asarray(sal["fmri"])[:, 0],
            "ig_eeg": np.asarray(ig["eeg"])[:, 0],
            "ig_fmri": np.asarray(ig["fmri"])[:, 0],
        }
        fw, aw = np.asarray(fw), np.asarray(aw)
        for f, sp in enumerate(splits):
            subj = int(bridge_data["subject"][sp.test[0]])
            w = cv.test_weight[f] > 0
            per_subject.append({
                "subject": subj,
                "label": int(bridge_data["label"][sp.test[0]]),
                "prediction": int(np.argmax(cv.test_probs[f][w][0])),
                "prob_class1": float(cv.test_probs[f][w][0][1]),
                "fusion_weights": fw[f, 0],
                "attn_weights": np.squeeze(aw[f, 0]),
            })

    from multimodal_eeg_fmri_tpu.report.clinical import (
        pooled_clinical_report,
    )

    clinical = pooled_clinical_report(probs, labels)
    return BridgeResult(cv=cv, loocv_metrics=pooled,
                        per_subject=per_subject, xai=xai,
                        clinical=clinical)
