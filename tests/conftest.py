"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware, per the
framework's test strategy (SURVEY.md §4): the flags below must be set before
jax initializes its backends, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the fused episodic programs dominate suite
# wall time on this 1-CPU box; caching them makes re-runs minutes faster.
# Set via env (before jax import) so the dryrun subprocess inherits it too.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# A sitecustomize hook may force an accelerator platform after env vars are
# read; pin the CPU backend explicitly so tests are hermetic.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2021)
