"""Multi-host data-path tests (single-process composition).

These tests verify the pieces whose composition is the multi-host
contract (parallel/multihost.py docstring) — the REAL 2-process
``jax.distributed`` run lives in tests/test_multihost_smoke.py, which
launches two coordinator-connected CPU processes over loopback:

  1. the per-host loader shard (``DataLoader(host_shard=...)``) —
     concatenating every host's rows reproduces the single-host batch
     bit-for-bit, augmentation included (rng keys on the GLOBAL index);
  2. ``local_batch_slice`` tiles the global batch across processes;
  3. ``global_batch_arrays`` / ``put_tree_on_mesh`` place identical
     values to the plain device_put path on the 8-device mesh, and the
     jitted train step consumes them unchanged.

``scripts/multihost_smoke.py`` is the real-pod counterpart: run one
copy per host on a multi-host TPU slice to validate the distributed
init + assembly end-to-end.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mvlpt_tpu.data.loader import DataLoader
from mvlpt_tpu.parallel import (
    batch_specs, create_mesh, global_batch_arrays, local_batch_slice,
    put_tree_on_mesh, replicated_specs, shard_tree)


class _ArrayDataset:
    """Deterministic synthetic rows with per-call rng 'augmentation'."""

    def __init__(self, n=32, dim=6):
        self.data = np.random.RandomState(7).randn(n, dim).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx, rng=None):
        row = self.data[idx]
        if rng is not None:  # augmentation draw must key on global idx
            row = row + rng.uniform(-1, 1)
        return row, idx % 4, idx % 2


def _epoch(loader):
    return list(loader)


def test_host_shards_reassemble_global_batch():
    bs, n_hosts = 8, 4
    full = _epoch(DataLoader(_ArrayDataset(), batch_size=bs, shuffle=True,
                             num_workers=0, seed=3, drop_last=True,
                             multitask=True))
    per = bs // n_hosts
    shards = [
        _epoch(DataLoader(_ArrayDataset(), batch_size=bs, shuffle=True,
                          num_workers=0, seed=3, drop_last=True,
                          multitask=True, host_shard=(h * per, per)))
        for h in range(n_hosts)
    ]
    assert all(len(s) == len(full) for s in shards)
    for b, gbatch in enumerate(full):
        for key in ("image", "label", "task"):
            merged = np.concatenate([shards[h][b][key] for h in range(n_hosts)])
            np.testing.assert_array_equal(merged, gbatch[key])
        assert all(shards[h][b]["n_valid"] == per for h in range(n_hosts))


def test_host_shard_requires_drop_last():
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(_ArrayDataset(), batch_size=8, shuffle=False,
                   num_workers=0, drop_last=False, host_shard=(0, 4))


def test_local_batch_slice_tiles_batch(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    covered = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        start, size = local_batch_slice(32)
        assert size == 8
        covered.extend(range(start, start + size))
    assert covered == list(range(32))
    with pytest.raises(ValueError, match="divide evenly"):
        local_batch_slice(30)


def test_build_data_loader_sets_host_shard(monkeypatch):
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.data.datum import Datum
    from mvlpt_tpu.data.loader import build_data_loader

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cfg = get_cfg_default()
    items = [Datum(impath="x.jpg", label=0, domain=0)] * 8
    train = build_data_loader(cfg, items, batch_size=8, tfm=lambda im: im,
                              is_train=True)
    assert train.host_shard == (4, 4)
    ev = build_data_loader(cfg, items, batch_size=8, tfm=lambda im: im,
                           is_train=False)
    assert ev.host_shard is None  # eval runs replicated


def test_global_batch_arrays_matches_device_put():
    mesh = create_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(8, 5, 5, 3).astype(np.float32),
        "label": rng.randint(0, 4, 8),
    }
    specs = batch_specs(batch)
    via_assembly = global_batch_arrays(batch, specs, mesh, global_batch=8)
    via_put = shard_tree(
        {k: np.asarray(v) for k, v in batch.items()}, specs, mesh)
    for k in batch:
        np.testing.assert_array_equal(
            np.asarray(via_assembly[k]), np.asarray(via_put[k]))
        assert via_assembly[k].sharding.is_equivalent_to(
            via_put[k].sharding, np.ndim(batch[k]))


def test_put_tree_on_mesh_values_and_specs():
    mesh = create_mesh(n_data=4, n_model=2)
    tree = {"w": np.arange(16, dtype=np.float32).reshape(4, 4),
            "b": np.arange(4, dtype=np.float32)}
    placed = put_tree_on_mesh(tree, replicated_specs(tree), mesh)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(placed[k]), tree[k])
    sharded = put_tree_on_mesh(tree, {"w": P("data"), "b": P()}, mesh)
    np.testing.assert_array_equal(np.asarray(sharded["w"]), tree["w"])


def test_put_tree_on_mesh_multiprocess_codepath(monkeypatch):
    """Force the make_array_from_callback branch (all devices are
    addressable single-process, so the callback path is exact here)."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    mesh = create_mesh(n_data=4, n_model=2)
    tree = {"w": np.arange(32, dtype=np.float32).reshape(8, 4)}
    placed = put_tree_on_mesh(tree, {"w": P("data", None)}, mesh)
    np.testing.assert_array_equal(np.asarray(placed["w"]), tree["w"])


def test_train_step_consumes_assembled_batch():
    """The jitted SPMD step runs on global_batch_arrays output and
    matches the device_put path numerically."""
    import jax.numpy as jnp

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.parallel import backbone_partition_specs
    from mvlpt_tpu.prompts import (
        PromptSpec, build_prompt_consts, init_prompt_params)
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step

    clip_cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    spec = PromptSpec(
        n_cls=4, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=False,
        class_token_position="end", project_method="identity",
        project_dim=None, context_length=8, vision_layers=2,
        vision_width=32, text_width=32, embed_dim=16, vision_patch_size=8)
    prompt_params = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(
        [f"c{i}" for i in range(4)], spec, backbone, jnp.float32)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec, compute_dtype=jnp.float32)
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)
    step = make_train_step(model, tx, donate=False)

    mesh = create_mesh(n_data=4, n_model=2)
    rng = np.random.RandomState(0)
    batch = {"image": rng.randn(8, 16, 16, 3).astype(np.float32),
             "label": rng.randint(0, 4, 8)}
    with mesh:
        bb = put_tree_on_mesh(backbone, backbone_partition_specs(backbone),
                              mesh)
        assembled = global_batch_arrays(batch, batch_specs(batch), mesh, 8)
        s1, m1 = step(init_train_state(prompt_params, tx), bb, consts,
                      assembled, jax.random.PRNGKey(0))
        plain = shard_tree({k: np.asarray(v) for k, v in batch.items()},
                           batch_specs(batch), mesh)
        s2, m2 = step(init_train_state(prompt_params, tx), bb, consts,
                      plain, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_smoke_script_single_process_rehearsal():
    """scripts/multihost_smoke.py must stay runnable: execute its exact
    command sequence single-process (MVLPT_TPU_SMOKE_SINGLE=1, 8 virtual
    CPU devices, no jax.distributed) as a subprocess. On a real pod the
    same script runs one copy per host without the env var — this keeps
    it from rotting until such hardware exists (VERDICT r2 #8)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["MVLPT_TPU_SMOKE_SINGLE"] = "1"
    env.pop("XLA_FLAGS", None)  # script sets its own device count
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/multihost_smoke.py"],
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK loss=" in proc.stdout, proc.stdout[-2000:]


def test_stage_window_shardings(monkeypatch):
    """trainer._stage_window: (K, B, ...) windows shard (None, 'data')
    on a mesh, stage uint8 as-is, and assemble per-host rows into the
    global window under multi-process (axis-1 concatenation in
    process_index order)."""
    import types

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mvlpt_tpu.train.trainer import PromptTrainer

    rng = np.random.RandomState(0)
    k, b = 2, 8
    stacked = {
        "image": rng.randint(0, 256, (k, b, 6, 6, 3)).astype(np.uint8),
        "label": rng.randint(0, 4, (k, b)),
    }
    mesh = create_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    self = types.SimpleNamespace(
        mesh=mesh, model=types.SimpleNamespace(compute_dtype=jnp.float32))

    out = PromptTrainer._stage_window(self, dict(stacked))
    assert out["image"].dtype == jnp.uint8  # staged raw
    assert out["image"].sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, "data")), 5)
    np.testing.assert_array_equal(np.asarray(out["image"]), stacked["image"])

    # float windows stage in the compute dtype (host-side cast)
    fl = {"image": rng.randn(k, b, 6, 6, 3).astype(np.float32),
          "label": stacked["label"]}
    out_f = PromptTrainer._stage_window(self, dict(fl))
    assert out_f["image"].dtype == jnp.float32

    # no mesh: plain device arrays
    self1 = types.SimpleNamespace(
        mesh=None, model=types.SimpleNamespace(compute_dtype=jnp.float32))
    out1 = PromptTrainer._stage_window(self1, dict(stacked))
    assert out1["image"].dtype == jnp.uint8

    # multi-process: the global window must be assembled with
    # make_array_from_process_local_data and a (K, B*n_proc) global
    # shape (the real call needs >1 process in THIS process, so record
    # the arguments instead; the true 2-process path runs in
    # tests/test_multihost_smoke.py)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    calls = []

    def fake_assemble(sharding, local, gshape):
        calls.append((sharding, local.shape, gshape))
        return jnp.asarray(local)

    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        fake_assemble)
    PromptTrainer._stage_window(self, dict(stacked))
    assert calls[0][2] == (k, b * 2, 6, 6, 3)
    assert calls[0][0].is_equivalent_to(NamedSharding(mesh, P(None, "data")), 5)
