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

import jax

# A sitecustomize hook may force an accelerator platform after env vars are
# read; pin the CPU backend explicitly so tests are hermetic.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2021)
