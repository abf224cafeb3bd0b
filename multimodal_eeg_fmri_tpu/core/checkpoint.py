"""Checkpointing: train-state save/restore + frozen-encoder artifacts.

Reference patterns (SURVEY §5): best-state deepcopy in RAM, and disk
checkpoints ``{epoch, model_state_dict, optimizer_state_dict,
scheduler_state_dict, metrics}`` written to ``checkpoints/best_{model}_fold{k}.pt``
(``FlexibleTrainer.save_checkpoint``). The bridge pipeline depends on these
as its stage-1 → stage-2 hand-off (``_test_bridge.py:476-554``).

Here checkpoints are orbax-backed pytrees; the *frozen-encoder artifact* is
an explicit first-class export: params + batch_stats + a metadata dict
(model name/config/metrics), which the bridge stage loads without knowing
anything about the optimizer. ``find_best_checkpoint`` reproduces the
reference's glob-for-best discovery.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    path: str | Path,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    step: int = 0,
    metrics: Optional[Dict[str, float]] = None,
    metadata: Optional[Dict[str, Any]] = None,
    extra: Any = None,
) -> Path:
    """Write a full train-state checkpoint (the reference's epoch/model/
    optimizer/scheduler/metrics bundle) as an orbax pytree + metadata json.
    ``extra`` is an arbitrary additional array pytree stored alongside
    (e.g. the trainer's live state for exact resume)."""
    path = Path(path).absolute()
    tree = {"params": params, "step": np.asarray(step)}
    if batch_stats is not None:
        tree["batch_stats"] = batch_stats
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if extra is not None:
        tree["extra"] = extra
    ckptr = _ocp().PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    meta = {"step": int(step), "metrics": metrics or {},
            **(metadata or {})}
    (path / "metadata.json").write_text(json.dumps(meta, indent=2))
    return path


def load_checkpoint(path: str | Path, template: Any = None) -> Dict[str, Any]:
    """Restore a checkpoint pytree (+ metadata if present). ``template``
    restores with matching dtypes/shapes when provided."""
    path = Path(path).absolute()
    ckptr = _ocp().PyTreeCheckpointer()
    if template is not None:
        tree = ckptr.restore(path, item=template)
    else:
        tree = ckptr.restore(path)
    meta_file = path / "metadata.json"
    if meta_file.exists():
        tree["metadata"] = json.loads(meta_file.read_text())
    return tree


def export_frozen_encoder(
    path: str | Path,
    model_name: str,
    params: Any,
    batch_stats: Any = None,
    config: Optional[Dict[str, Any]] = None,
    metrics: Optional[Dict[str, float]] = None,
) -> Path:
    """Stage-1 → stage-2 artifact: enough to rebuild the frozen encoder
    (params + batch_stats + model identity/config), nothing else."""
    return save_checkpoint(
        path, params, batch_stats=batch_stats, metrics=metrics,
        metadata={"model_name": model_name, "config": config or {},
                  "artifact": "frozen_encoder"},
    )


def find_best_checkpoint(
    checkpoint_dir: str | Path,
    pattern: str = "best_trimodal_fold*",
    metric: str = "f1",
) -> Optional[Path]:
    """Reference ``find_best_checkpoint`` (``_test_bridge.py:476-482``):
    glob fold checkpoints and pick the one with the highest stored metric
    (falls back to the latest by fold number if metrics are absent)."""
    d = Path(checkpoint_dir)
    candidates = sorted(d.glob(pattern))
    if not candidates:
        return None
    best, best_score = None, -np.inf
    for c in candidates:
        meta = c / "metadata.json"
        score = -np.inf
        if meta.exists():
            try:
                score = json.loads(meta.read_text()).get("metrics", {}).get(
                    metric, -np.inf)
            except (json.JSONDecodeError, OSError):
                pass
        if score > best_score or best is None:
            if score > best_score:
                best_score = score
                best = c
            elif best is None:
                best = c
    if best_score == -np.inf:
        # fall back: highest fold index
        def fold_num(p):
            m = re.search(r"(\d+)$", p.name)
            return int(m.group(1)) if m else -1
        best = max(candidates, key=fold_num)
    return best
