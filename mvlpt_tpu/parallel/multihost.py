"""Multi-host (multi-slice) initialization helpers.

The reference has no multi-host story (its only parallelism is
single-process nn.DataParallel, SURVEY.md §2.9). On TPU pods the same
jitted SPMD step scales across hosts: each host runs this program,
`jax.distributed.initialize` wires the DCN coordination layer, and
`jax.devices()` becomes the global device set — the ("data","model")
mesh and the XLA collectives need no code changes. Each host feeds the
batch rows for its addressable shard of the "data" axis.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Reads the standard env vars (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES
    / PROCESS_ID, or cloud-TPU auto-detection when none are set but
    MVLPT_TPU_MULTIHOST=1 is). Returns True if initialization ran."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
        return True
    if os.environ.get("MVLPT_TPU_MULTIHOST"):
        jax.distributed.initialize()  # cloud-TPU auto-detection
        return True
    return False


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's row range in the global batch."""
    import jax

    per_host = global_batch // jax.process_count()
    return jax.process_index() * per_host, per_host
