"""Test configuration: force the CPU backend with 8 virtual devices so the
mesh/DP/fold-parallel paths are exercised without TPU hardware
(SURVEY §4 implication (3)).

Note: this environment's sitecustomize registers an 'axon' TPU backend and
overrides JAX_PLATFORMS during import, so the env var alone is not enough —
we must update jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (~60 min, mostly XLA CPU compiles of the
# mesh/scan graphs). Persist compiles ≥1 s (jax's default threshold — the
# cheap ones aren't worth the disk round trip on CPU) so repeat runs skip
# them. Opt out with MMEF_NO_TEST_CACHE=1.
if os.environ.get("MMEF_NO_TEST_CACHE") != "1":
    _cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
