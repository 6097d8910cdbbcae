"""Tensor-parallel fused-block kernels (ops/block.py TP section).

The reference has no tensor parallelism at all (its only parallelism is
single-process nn.DataParallel, mvlpt.py:877-880); these tests pin the
TPU-native Megatron sharding of the fused residual-block kernels: each
"model"-axis device runs the SAME fused kernel on its H/tp heads (resp.
4W/tp MLP hidden units), emits an fp32 partial, and one psum + bias +
residual finishes the block. Everything runs on the virtual 8-device
CPU mesh with the kernels in interpret mode — the same vehicle the
data-parallel shard_map path is validated with.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlpt_tpu.core import layers as L
from mvlpt_tpu.ops import block as B
from mvlpt_tpu.parallel.mesh import create_mesh

S, W, HEADS = 16, 64, 4



pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

def _params(rng, dtype=jnp.float32):
    f = lambda *sh: jnp.asarray(
        rng.randn(*sh).astype(np.float32) * 0.05).astype(dtype)
    return {
        "ln_1": {"scale": f(W) + 1, "bias": f(W)},
        "ln_2": {"scale": f(W) + 1, "bias": f(W)},
        "attn": {"qkv_w": f(W, 3 * W), "qkv_b": f(3 * W),
                 "out_w": f(W, W), "out_b": f(W)},
        "mlp": {"fc_w": f(W, 4 * W), "fc_b": f(4 * W),
                "proj_w": f(4 * W, W), "proj_b": f(W)},
    }


@pytest.fixture(scope="module")
def setup(rng):
    p = _params(rng)
    x = jnp.asarray(rng.randn(8, S, W).astype(np.float32))
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), 1)
    return p, x, mask


@pytest.mark.parametrize("nd,nm", [(2, 4), (4, 2), (8, 1)])
def test_sharded_block_matches_xla_all_meshes(setup, nd, nm):
    """Forward parity of fused_residual_block_sharded vs the XLA block
    on dp x tp meshes, masked and unmasked."""
    p, x, mask = setup
    mesh = create_mesh(n_data=nd, n_model=nm, devices=jax.devices())
    for m in (None, mask):
        ref = L.residual_block(x, p, HEADS, m)
        with mesh:
            out = B.fused_residual_block_sharded(x, p, HEADS, m, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("nd,nm", [(2, 4), (4, 2)])
def test_sharded_block_grad_matches_xla(setup, nd, nm):
    """Input-cotangent parity through the hand-built TP backward (psummed
    partial dxh + out-of-kernel LN backward)."""
    p, x, mask = setup
    mesh = create_mesh(n_data=nd, n_model=nm, devices=jax.devices())

    def loss_ref(xx):
        return jnp.sum(jnp.sin(L.residual_block(xx, p, HEADS, mask)))

    def loss_tp(xx):
        with mesh:
            y = B.fused_residual_block_sharded(xx, p, HEADS, mask, mesh)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref)(x)
    g_tp = jax.grad(loss_tp)(x)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               atol=5e-6, rtol=1e-4)


def test_tp_indivisible_heads_falls_back(setup):
    """HEADS=4 on tp=8 cannot be Megatron-sharded; the wrapper must fall
    back to the XLA block (exactly — it IS the XLA block)."""
    p, x, mask = setup
    mesh = create_mesh(n_data=1, n_model=8, devices=jax.devices())
    ref = L.residual_block(x, p, HEADS, mask)
    with mesh:
        out = B.fused_residual_block_sharded(x, p, HEADS, mask, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tp_row_padding(setup):
    """Batch rows that don't divide the data axis are zero-padded and
    sliced back, on a TP mesh."""
    p, x, _ = setup
    x6 = x[:6]
    mesh = create_mesh(n_data=4, n_model=2, devices=jax.devices())
    ref = L.residual_block(x6, p, HEADS, None)
    with mesh:
        out = B.fused_residual_block_sharded(x6, p, HEADS, None, mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_tp_bf16(setup, rng):
    """bf16 activations/weights keep dtype and track the XLA bf16 block
    within bf16 tolerance under tp=2."""
    p, x, _ = setup
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    xb = x[:4].astype(jnp.bfloat16)
    mesh = create_mesh(n_data=4, n_model=2, devices=jax.devices())
    ref = L.residual_block(xb, pb, HEADS, None)
    with mesh:
        out = B.fused_residual_block_sharded(xb, pb, HEADS, None, mesh)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2)


def test_prepared_tp_layout_matches_inline(setup):
    """prepare_blocks(tp=...) pre-materializes the per-shard qkv row
    permutation (qkv_wT_tp) the windowed scan consumes; results must be
    identical to the inline-permutation fallback."""
    p, x, mask = setup
    stacked = jax.tree_util.tree_map(lambda a: a[None], p)
    prepped = B.prepare_blocks(stacked, fused=True, tp=2)[0]
    assert "qkv_wT_tp" in prepped["attn"]
    assert prepped["attn"]["qkv_wT_tp"].shape == (3 * W, W)
    mesh = create_mesh(n_data=4, n_model=2, devices=jax.devices())
    with mesh:
        want = B.fused_residual_block_sharded(x, p, HEADS, mask, mesh)
        got = B.fused_residual_block_sharded(x, prepped, HEADS, mask, mesh)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_select_attn_fn_tp_mesh_routing(monkeypatch):
    """Forced 'block' engages the Megatron-sharded kernels on a TP mesh;
    'auto' stays on the XLA path there (measured-wins-only — the TP
    variants have no hardware throughput datapoint yet) but still picks
    the shard_map kernels on dp-only meshes."""
    from mvlpt_tpu.ops import block as block_ops
    from mvlpt_tpu.ops.attention import select_attn_fn

    tp_mesh = create_mesh(n_data=4, n_model=2, devices=jax.devices())
    fn = select_attn_fn("block", mesh=tp_mesh)
    assert getattr(fn, "fused_block", False)
    assert fn.mesh is tp_mesh and not fn.auto_selected

    monkeypatch.setattr(block_ops, "available", lambda: True)
    assert select_attn_fn("auto", mesh=tp_mesh) is None
    dp_mesh = create_mesh(n_data=8, n_model=1, devices=jax.devices())
    fn = select_attn_fn("auto", mesh=dp_mesh)
    assert getattr(fn, "fused_block", False)
    assert fn.mesh is dp_mesh and fn.auto_selected


def test_windowed_step_tp_kernels():
    """The windowed multi-step scan (the production dispatch path) with
    TP kernels on a dp=4 x tp=2 mesh: per-step losses must match the
    windowed XLA-path run."""
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.ops.attention import select_attn_fn
    from mvlpt_tpu.parallel import backbone_partition_specs, shard_tree
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import (
        init_train_state, make_train_step_multi)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.test_train_step import tiny_setup

    backbone, spec, pp, consts, model = tiny_setup()
    mesh = create_mesh(n_data=4, n_model=2)
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)

    rng = np.random.RandomState(3)
    k, b = 2, 8
    window = {
        "image": jnp.asarray(rng.randn(k, b, 16, 16, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 4, (k, b))),
    }

    losses = {}
    for name, attn_fn in [("xla", None),
                          ("tp", select_attn_fn("block", mesh=mesh))]:
        m = MVLPTModel(clip_cfg=model.clip_cfg, spec=spec,
                       compute_dtype=jnp.float32, attn_fn=attn_fn)
        step_w = make_train_step_multi(m, tx, donate=False)
        with mesh:
            backbone_s = shard_tree(
                backbone, backbone_partition_specs(backbone), mesh)
            window_s = {
                key: jax.device_put(v, NamedSharding(
                    mesh, P(None, "data") if np.ndim(v) >= 2 else P(None)))
                for key, v in window.items()}
            _, mstack = step_w(init_train_state(pp, tx), backbone_s,
                               consts, window_s, jax.random.PRNGKey(0))
        losses[name] = np.asarray(mstack["loss"])
        assert np.all(np.isfinite(losses[name]))
    np.testing.assert_allclose(losses["tp"], losses["xla"], rtol=1e-5)


def test_full_train_step_tp_kernels_match_single_device():
    """The flagship train step with USE_PALLAS kernels on a dp=4 x tp=2
    mesh: loss and updated prompt params match the single-device XLA
    step (the same contract test_spmd_step_on_8_device_mesh pins for
    the XLA path)."""
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.ops.attention import select_attn_fn
    from mvlpt_tpu.parallel import (
        backbone_partition_specs, batch_specs, create_mesh, shard_tree)
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step
    from tests.test_train_step import make_batch, tiny_setup

    backbone, spec, pp, consts, model = tiny_setup()
    mesh = create_mesh(n_data=4, n_model=2)
    model_tp = MVLPTModel(clip_cfg=model.clip_cfg, spec=spec,
                          compute_dtype=jnp.float32,
                          attn_fn=select_attn_fn("block", mesh=mesh))
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)
    state = init_train_state(pp, tx)

    batch = make_batch()
    with mesh:
        backbone_s = shard_tree(
            backbone, backbone_partition_specs(backbone), mesh)
        batch_s = shard_tree(batch, batch_specs(batch), mesh)
        step = make_train_step(model_tp, tx, donate=False)
        state2, m = step(state, backbone_s, consts, batch_s,
                         jax.random.PRNGKey(0))

    step1 = make_train_step(model, tx, donate=False)
    state1, m1 = step1(state, backbone, consts, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state2.prompt_params),
                    jax.tree_util.tree_leaves(state1.prompt_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
