"""Persistent XLA compilation cache.

The framework's compiled-whole-run design trades Python-loop overhead for
XLA compiles; at the reference's scale the compiles dominate cold-start wall
clock (measured: the full EEG experiment is ~997 s, most of it compilation).
A persistent on-disk cache makes every repeat run — same shapes, different
data/seeds — skip compilation entirely.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable JAX's persistent compilation cache."""
    global _ENABLED
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "multimodal_eeg_fmri_tpu" / "xla"),
    )
    if not _ENABLED:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache EVERY entry, however fast its compile: under the axon
        # remote-compile tunnel each small dispatch pays a ~0.4 s round
        # trip, and a cold start executes ~500 of them during model init /
        # data prep (measured: 514 sub-threshold compiles totaling 218 s —
        # the dominant cold-start cost, vs 19 s for the big run_steps
        # graph). With the default 1.0 s threshold none were persisted, so
        # "warm" runs re-paid all 218 s; threshold 0 makes them cache hits.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    return cache_dir
