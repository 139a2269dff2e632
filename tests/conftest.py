"""Test harness config.

All tests run on a virtual 8-device CPU platform
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the standard JAX
pattern for exercising pjit/shard_map sharding without TPU hardware
(SURVEY.md §4.3). Pallas kernels run in interpret mode on CPU; the
compiled TPU path is exercised by bench.py on real hardware.

Env vars must be set before the first jax import, hence module top.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin is registered by a sitecustomize at interpreter startup
# with JAX_PLATFORMS=axon already in the env, so the env-var route is
# ineffective here; the config update below is applied before any backend
# initialization and forces the virtual 8-device CPU platform.
#
# TPU hardware tier (VERDICT round-1 item 9): LIPVQ_TPU_TESTS=1 leaves the
# real backend in place — run `LIPVQ_TPU_TESTS=1 pytest -m tpu tests/` on
# a TPU machine to exercise the compiled on-device path (Mosaic layouts,
# bf16 MXU numerics) that CPU-interpret tests cannot see.
import jax  # noqa: E402

_TPU_TIER = os.environ.get("LIPVQ_TPU_TESTS", "0") == "1"
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (tiny models,
# many distinct jit programs), so caching XLA executables across runs cuts
# repeat-suite wall time substantially. Safe on the spoofed CPU platform.
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
