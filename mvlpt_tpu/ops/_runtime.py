"""Shared Pallas runtime predicates for the ops kernels.

One definition of "can this host compile Pallas TPU programs" and
"should kernels run in interpret mode", imported by both the attention
and fused-block modules so the platform whitelist ('tpu' and the axon
tunnel backend) cannot drift between them.
"""

from __future__ import annotations

import jax

try:  # pltpu is only importable on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_TPU_PLATFORMS = ("tpu", "axon")


def interpret() -> bool:
    """Compile on TPU; interpret elsewhere (CPU tests, multichip dryrun)."""
    try:
        return jax.devices()[0].platform not in _TPU_PLATFORMS
    except RuntimeError:
        return True


def available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.devices()[0].platform in _TPU_PLATFORMS
    except RuntimeError:
        return False
