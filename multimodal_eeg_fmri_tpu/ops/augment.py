"""On-device train-time augmentation.

Reference ``EEGTransforms`` (``CrossModal_EEG_scr.ipynb §14``): with p=0.3
add gaussian noise at 5% of the sample std; with p=0.3 zero out 10% of
channels. The reference applies this per-sample on host in
``Dataset.__getitem__``; here it is a pure keyed function applied to the
whole batch inside the jitted train step — it fuses with the forward pass,
costs ~nothing, and keeps the host out of the loop.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def augment_temporal(
    rng: jax.Array,
    x: jnp.ndarray,  # (B, T, C)
    noise_std: float = 0.05,
    channel_dropout: float = 0.1,
    prob: float = 0.3,
) -> jnp.ndarray:
    """Gaussian noise + channel dropout, each gated per-sample with ``prob``."""
    k_gate_n, k_noise, k_gate_c, k_chan = jax.random.split(rng, 4)
    B, T, C = x.shape

    std = jnp.std(x, axis=(1, 2), keepdims=True)
    noise = jax.random.normal(k_noise, x.shape, x.dtype) * (noise_std * std)
    apply_noise = jax.random.bernoulli(k_gate_n, prob, (B, 1, 1))
    x = jnp.where(apply_noise, x + noise, x)

    keep = jax.random.bernoulli(k_chan, 1.0 - channel_dropout, (B, 1, C))
    apply_drop = jax.random.bernoulli(k_gate_c, prob, (B, 1, 1))
    x = jnp.where(apply_drop, x * keep.astype(x.dtype), x)
    return x


def make_eeg_augment(
    keys: Sequence[str] = ("erp", "pw"),
    noise_std: float = 0.05,
    channel_dropout: float = 0.1,
    prob: float = 0.3,
):
    """Batch-level augment hook for ``make_fit_fn(augment=...)``: applies
    temporal augmentation to the named modality keys, leaves the rest."""

    def augment(rng: jax.Array, batch: Dict[str, jnp.ndarray]):
        out = dict(batch)
        for i, k in enumerate(keys):
            if k in batch and batch[k].ndim == 3:
                out[k] = augment_temporal(
                    jax.random.fold_in(rng, i), batch[k],
                    noise_std, channel_dropout, prob,
                )
        return out

    # stable identity for the AOT bundle cache (closure reprs carry
    # addresses, not parameters)
    augment._aot_tag = (f"eeg_augment(keys={tuple(keys)},noise={noise_std},"
                        f"cd={channel_dropout},p={prob})")
    return augment
