"""Test config: run everything on a virtual 8-device CPU mesh.

pjit/shard_map programs execute identically on the forced host platform,
so multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).
Must run before anything initializes jax backends. Note: this
environment pins JAX_PLATFORMS=axon (the TPU tunnel), so the env-var
route is overridden — use jax.config instead, which wins as long as no
devices have been created yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
