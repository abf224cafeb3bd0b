"""Int8 weight-only quantization for deployment artifacts.

No reference analogue (the reference ships raw ``torch.save`` state dicts,
``CrossModal_EEG_scr.ipynb §23``); this is deployment surface for the
framework's own checkpoint/serving story: the reference workload writes
4 models × 5 folds + 66 LOSO folds of checkpoints per experiment, and the
bridge stage ships frozen stage-1 encoders to a second process — weight-only
int8 cuts every one of those payloads ~4× with a measured, bounded effect
on served predictions.

Design (TPU-honest):
- **Symmetric per-output-channel int8** for floating matmul weights
  (ndim ≥ 2): ``q = round(w / s)``, ``s = max|w| / 127`` per LAST-axis
  channel (flax kernels are ``(in..., out)``). Per-channel scales cost
  ``out`` floats and keep the quantization error of every output feature
  independent of the dynamic range of its siblings.
- **Small/1-D leaves stay f32** (biases, norm scales/means/vars, the MoE
  router bias-free kernel is 2-D and quantizes): they are a rounding-error
  fraction of the bytes and quantizing BatchNorm statistics is all risk,
  no size win.
- **Dequantize at load, compute in f32/bf16**: at this model scale serving
  is latency-bound, not bandwidth-bound (docs/DESIGN.md: bf16 is ~5%
  SLOWER than f32 at these shapes), so int8 *compute* would be dishonest
  complexity — the win is storage/transfer, and the accuracy cost is
  bounded by tests (logit drift, prediction flips).

The quantized payload is a plain ``.npz`` (int8 tensors + f32 scales +
a JSON tree manifest) — no orbax dependency at the serving site, matching
``serving.load_artifact``'s "no Python model code" philosophy.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

_SEP = "/"  # flattened-path key separator inside the npz


def _flatten(tree: Any) -> Dict[Tuple[str, ...], Any]:
    """flax's flatten_dict (already a dependency via parallel/expert.py) —
    no point maintaining a third tree flattener in this repo."""
    from flax import traverse_util

    if not isinstance(tree, dict):
        return {(): tree}
    return traverse_util.flatten_dict(tree)


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Any:
    from flax import traverse_util

    return traverse_util.unflatten_dict(flat)


def quantize_leaf(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-last-axis-channel int8. Returns (q, scales) with
    ``q.shape == w.shape`` (int8) and ``scales.shape == (w.shape[-1],)``."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return q, scales


def dequantize_leaf(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scales


def quantize_leaf_int4(
    w: np.ndarray, group_size: int = 64
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """Symmetric GROUPED int4: the input axes flatten to rows, rows chunk
    into groups of ``group_size``, and each (group, out-channel) cell gets
    its own scale ``max|w| / 7`` — the finer scale granularity is what
    makes 4 bits usable. Nibbles pack two-per-byte (row-major down the
    flattened axis). Returns (packed uint8, scales (G, out), orig shape).
    """
    w = np.asarray(w, np.float32)
    out_ch = w.shape[-1]
    rows = w.reshape(-1, out_ch)
    n = rows.shape[0]
    n_groups = -(-n // group_size)
    pad = n_groups * group_size - n
    if pad:
        rows = np.concatenate([rows, np.zeros((pad, out_ch), np.float32)])
    g = rows.reshape(n_groups, group_size, out_ch)
    amax = np.max(np.abs(g), axis=1)                       # (G, out)
    scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(g / scales[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(n_groups * group_size, out_ch)
    nib = (q + 8).astype(np.uint8)                         # 1..15
    if nib.shape[0] % 2:
        nib = np.concatenate([nib, np.zeros((1, out_ch), np.uint8)])
    packed = (nib[0::2] << 4) | nib[1::2]
    return packed, scales, w.shape


def dequantize_leaf_int4(packed: np.ndarray, scales: np.ndarray,
                         shape: Tuple[int, ...],
                         group_size: int = 64) -> np.ndarray:
    out_ch = packed.shape[-1]
    hi = (packed >> 4).astype(np.int8) - 8
    lo = (packed & 0x0F).astype(np.int8) - 8
    nib = np.empty((packed.shape[0] * 2, out_ch), np.int8)
    nib[0::2], nib[1::2] = hi, lo
    n = int(np.prod(shape[:-1]))
    n_groups = scales.shape[0]
    q = nib[: n_groups * group_size].reshape(n_groups, group_size, out_ch)
    w = (q.astype(np.float32) * scales[:, None, :]).reshape(-1, out_ch)
    return w[:n].reshape(shape)


# leaf names that are BIASES despite being ≥2-D: DenseGeneral projections
# store (num_heads, head_dim) biases and the MoE experts stack theirs as
# b1 (E, ff) / b2 (E, D). The module policy ("biases stay f32 — all risk,
# no size win") is name-aware, not just rank-aware (found in review:
# rank-only quantized every attention projection bias).
_BIAS_NAMES = frozenset({"bias", "b1", "b2"})


def _quantizable(leaf, name: str | None = None) -> bool:
    a = np.asarray(leaf)
    if name is not None and name in _BIAS_NAMES:
        return False
    return a.ndim >= 2 and np.issubdtype(a.dtype, np.floating)


def quantize_tree(params: Any) -> Tuple[Any, Any]:
    """(params) → (quantized tree, scales tree). Leaves that don't qualify
    (1-D biases/norm stats, integer leaves) pass through with scale None."""
    flat = _flatten(params)
    qt, st = {}, {}
    for path, leaf in flat.items():
        if _quantizable(leaf, path[-1]):
            q, s = quantize_leaf(np.asarray(leaf))
            qt[path], st[path] = q, s
        else:
            qt[path], st[path] = np.asarray(leaf), None
    return _unflatten(qt), _unflatten(st)


def dequantize_tree(qtree: Any, stree: Any) -> Any:
    qf, sf = _flatten(qtree), _flatten(stree)
    out = {}
    for path, q in qf.items():
        s = sf[path]
        out[path] = dequantize_leaf(q, s) if s is not None else q
    return _unflatten(out)


def save_quantized(path: str | Path, variables: Dict[str, Any],
                   bits: int = 8, group_size: int = 64) -> Path:
    """Quantize ``variables['params']`` (weight-only) and write one ``.npz``
    with all other collections (batch_stats, …) stored f32 as-is.

    ``bits=8``: per-output-channel int8 (~4× smaller, near-lossless).
    ``bits=4``: grouped int4 two-nibbles-per-byte (~8× smaller; the
    per-(group, channel) scales bound the error at ``group amax / 14`` —
    measured drift on the trained flagship stays decision-safe, tests).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {"collections": sorted(variables),
                                "bits": bits, "group_size": group_size,
                                "shapes": {}}
    for col, tree in variables.items():
        flat = _flatten(tree)
        for p, leaf in flat.items():
            key = _SEP.join((col,) + p)
            leaf = np.asarray(leaf)
            if col == "params" and _quantizable(leaf, p[-1]):
                if bits == 8:
                    q, s = quantize_leaf(leaf)
                    arrays["q" + _SEP + key] = q
                else:
                    q, s, shape = quantize_leaf_int4(leaf, group_size)
                    arrays["p" + _SEP + key] = q
                    manifest["shapes"][key] = list(shape)
                arrays["s" + _SEP + key] = s
            else:
                arrays["f" + _SEP + key] = leaf
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        np.savez_compressed(fh, __manifest__=json.dumps(manifest),
                            **arrays)
    return path


def load_quantized(path: str | Path) -> Dict[str, Any]:
    """Load + dequantize a ``save_quantized`` payload back to f32
    variables, ready for ``model.apply`` / ``serving.Predictor``."""
    with np.load(Path(path), allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        gs = int(manifest.get("group_size", 64))
        shapes = manifest.get("shapes", {})
        flat: Dict[Tuple[str, ...], np.ndarray] = {}
        for name in z.files:
            if name == "__manifest__" or name.startswith("s" + _SEP):
                continue
            kind, key = name.split(_SEP, 1)
            path_t = tuple(key.split(_SEP))
            if kind == "q":
                flat[path_t] = dequantize_leaf(z[name], z["s" + _SEP + key])
            elif kind == "p":  # packed int4
                flat[path_t] = dequantize_leaf_int4(
                    z[name], z["s" + _SEP + key], tuple(shapes[key]), gs)
            else:
                flat[path_t] = z[name]
    tree = _unflatten(flat)
    return {col: tree.get(col, {}) for col in manifest["collections"]}
