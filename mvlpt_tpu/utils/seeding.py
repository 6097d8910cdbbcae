"""Deterministic seeding across host RNGs and JAX PRNG keys.

Equivalent of Dassl's ``set_random_seed`` used at
/root/reference/train.py:196-198; on TPU the device-side story is
simpler because JAX PRNG keys are explicit and deterministic by
construction.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def set_random_seed(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
