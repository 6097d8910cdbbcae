"""Device mesh + sharding rules.

TPU-native replacement for the reference's parallelism (§2.9 of
SURVEY.md): the only parallelism the reference actually uses is
``nn.DataParallel`` (mvlpt.py:877-880). Here one jitted train step runs
SPMD over a 2-D ("data", "model") mesh:

  * "data"  — batch axis (DP). Gradient all-reduce is inserted by XLA
              and rides ICI; the dormant NCCL helpers of the reference
              (vision_benchmark/utils/comm.py) have no equivalent
              because collectives live inside the compiled program.
  * "model" — tensor-parallel axis for the towers: attention QKV /
              MLP-in are column-sharded, attention-out / MLP-out are
              row-sharded (Megatron layout); the token embedding is
              vocab-sharded. Defaults to size 1 (the ~150M-param CLIP
              model does not need TP; the axis exists so ViT-L/14@336
              or bigger backbones can turn it on without code changes).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def shard_map(f, mesh, in_specs, out_specs, check_rep: bool = True):
    """Version-portable shard_map (jax.experimental.shard_map was
    deprecated in jax 0.8.0 in favor of jax.shard_map, which renamed
    check_rep -> check_vma)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
    from jax.experimental.shard_map import shard_map as _shard_map

    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_rep=check_rep)


def create_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model == n, (
        f"mesh {n_data}x{n_model} != {n} devices")
    arr = mesh_utils.create_device_mesh((n_data, n_model), devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def backbone_partition_specs(backbone: dict) -> dict:
    """PartitionSpec pytree for the frozen CLIP backbone."""

    def spec_for(path, leaf) -> P:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = keys[-1] if keys else ""
        if name in ("qkv_w", "fc_w"):
            return P(None, None, MODEL_AXIS)  # column-parallel
        if name in ("qkv_b", "fc_b"):
            return P(None, MODEL_AXIS)
        if name in ("out_w", "proj_w"):
            return P(None, MODEL_AXIS, None)  # row-parallel
        if name == "token_embedding":
            return P(MODEL_AXIS, None)  # vocab-sharded (largest tensor)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, backbone)


def replicated_specs(tree) -> dict:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def batch_specs(batch) -> dict:
    """Shard every batch array along its leading (batch) dimension."""
    return jax.tree_util.tree_map(
        lambda x: P(DATA_AXIS) if np.ndim(x) >= 1 else P(), batch)


def shard_tree(tree, specs, mesh: Mesh):
    """Place a host pytree onto the mesh with the given specs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def named_shardings(specs, mesh: Mesh):
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))
