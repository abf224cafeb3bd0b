"""Long-context sequence classifier — the trainable sequence-parallel path.

No reference analogue: the reference caps sequences at 5000 steps and
truncates (``CrossModal_EEG_scr.ipynb §41``, SURVEY §5 long-context). This
model is the framework's headroom surface made config-reachable: a raw long
recording ``(B, T, C)`` trains end-to-end under ``train.fit.make_fit_fn``
with the TIME axis sharded over a mesh axis — each transformer block runs
ring attention (``ops/ring_attention.py``: ppermute K/V rotation +
online-softmax merge), optionally composed with tensor-parallel head
sharding via ``head_axis``.

Design notes (TPU-first):
- patchify: non-overlapping ``patch`` frames → one token (a strided
  reshape + Dense — MXU-friendly, shrinks T by ``patch`` before attention).
- LayerNorm everywhere (no BatchNorm): batch stats don't interact with the
  sequence sharding and LOOCV batch=1 serving.
- mean-pool over (sharded) time → psum via GSPMD when sharded — then an
  ordinary classifier head.

``attn_impl``: "ring" (mesh required) for T beyond one chip, "auto" for the
single-device flash/einsum routing — the same config trains both ways, which
the parity test exploits (ring loss history == single-device history).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_eeg_fmri_tpu.models.eeg import ModelOutput
from multimodal_eeg_fmri_tpu.models.layers import (
    ClassifierHead,
    TransformerBlock,
    gelu,
    sinusoidal_position_encoding,
)


class LongContextClassifier(nn.Module):
    """Transformer classifier over one long raw sequence (key ``erp``)."""

    hidden_dim: int = 64
    num_classes: int = 2
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.0
    patch: int = 1              # frames per token (1 = per-frame tokens)
    attn_impl: str = "auto"     # "auto" | "einsum" | "flash" | "ring"
    mesh: Optional[jax.sharding.Mesh] = None
    seq_axis: str = "seq"
    head_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        *,
        erp: jnp.ndarray,   # (B, T, C) raw long recording
        pw: Optional[jnp.ndarray] = None,    # accepted & ignored
        conn: Optional[jnp.ndarray] = None,  # (uniform model API)
        train: bool = False,
    ) -> ModelOutput:
        B, T, C = erp.shape
        if T % self.patch:
            raise ValueError(f"T={T} not divisible by patch={self.patch}")
        x = erp.reshape(B, T // self.patch, self.patch * C)
        x = nn.Dense(self.hidden_dim, name="embed")(x)
        x = x + sinusoidal_position_encoding(
            x.shape[1], self.hidden_dim, x.dtype)[None]
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.hidden_dim, self.num_heads, dropout=self.dropout,
                attn_impl=self.attn_impl, mesh=self.mesh,
                seq_axis=self.seq_axis, head_axis=self.head_axis,
                name=f"block_{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
        pooled = jnp.mean(x, axis=1)  # sharded-T mean → GSPMD partial-sums
        feat = gelu(nn.Dense(self.hidden_dim, name="pool_proj")(pooled))
        logits = ClassifierHead(
            (self.hidden_dim // 2,), self.num_classes, self.dropout,
            norm="layer", name="classifier",
        )(feat, train=train)
        return ModelOutput(logits, feat, None, None)
