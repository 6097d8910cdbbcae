"""Multi-host (multi-slice) execution helpers.

The reference has no multi-host story (its only parallelism is
single-process nn.DataParallel, SURVEY.md §2.9). On TPU pods the same
jitted SPMD step scales across hosts: each host runs this program,
`jax.distributed.initialize` wires the DCN coordination layer, and
`jax.devices()` becomes the global device set — the ("data","model")
mesh and the XLA collectives need no code changes.

Data contract under ``jax.process_count() > 1``:

* **Train**: every host computes the SAME deterministic batch order
  (seeded shuffles, identical config), but decodes only its
  ``local_batch_slice`` rows of each global batch
  (``DataLoader(host_shard=...)``).  ``global_batch_arrays`` then
  assembles per-host rows into global ``jax.Array``s with
  ``jax.make_array_from_process_local_data`` — no host ever
  materializes the full global batch.
* **Eval**: replicated. Every host runs the full split through the
  same deterministic loader, so metrics are bitwise-identical across
  hosts and need no gather. (Eval is a tiny fraction of step time for
  prompt tuning; sharded eval would buy little and cost a metric
  merge.)
* **Frozen backbone / consts**: every host holds the full pytree;
  ``put_tree_on_mesh`` places it with ``jax.make_array_from_callback``,
  which is correct whether or not the mesh spans non-addressable
  devices.
"""

from __future__ import annotations

import os

import numpy as np


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

    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} must divide evenly across "
            f"{n_proc} processes; adjust DATALOADER.*.BATCH_SIZE")
    per_host = global_batch // n_proc
    return jax.process_index() * per_host, per_host


def global_batch_arrays(local_arrays: dict, specs: dict, mesh,
                        global_batch: int) -> dict:
    """Assemble per-host batch rows into global jax.Arrays.

    ``local_arrays`` holds this process's rows only (all processes
    together cover ``global_batch`` rows, in process_index order —
    exactly what ``DataLoader(host_shard=local_batch_slice(...))``
    yields). Works single-process too (local == global), so the same
    code path runs under tests and the multichip dryrun."""
    import jax
    from jax.sharding import NamedSharding

    def put(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        if spec and spec[0] is not None:  # batch-sharded leading axis
            gshape = (global_batch,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sharding, x, gshape)
        return jax.make_array_from_callback(  # replicated scalar/aux
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(
        put, local_arrays, specs,
        is_leaf=lambda v: isinstance(v, (np.ndarray, list)))


def put_tree_on_mesh(tree, specs, mesh):
    """Place a pytree (fully held on every host) onto the mesh.

    Unlike plain ``device_put``, this is correct when the mesh includes
    devices from other processes: each host materializes only its
    addressable shards via the index callback."""
    import jax
    from jax.sharding import NamedSharding

    if jax.process_count() == 1:
        from mvlpt_tpu.parallel.mesh import shard_tree

        return shard_tree(tree, specs, mesh)

    def put(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, specs)


def allgather_tree(tree):
    """Gather a host-local pytree from every process (stacked on a new
    leading axis). Thin wrapper over multihost_utils.process_allgather;
    identity when single-process."""
    import jax

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
