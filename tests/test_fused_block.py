"""Fused residual-block Pallas kernels (ops/block.py) vs the XLA path.

Runs in interpreter mode on CPU — same kernel code the TPU compiles
(minus Mosaic lowering). Checks fwd and hand-derived bwd against
core.layers.residual_block to fp32-reassociation tolerance, with and
without masks, across g-blocking shapes, and through the full model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlpt_tpu.core import layers
from mvlpt_tpu.ops import block as bops


def _params(rng, w):
    def mk(shape):
        return jnp.asarray(rng.randn(*shape) * 0.05, jnp.float32)

    return {
        "ln_1": {"scale": jnp.asarray(1 + 0.1 * rng.randn(w), jnp.float32),
                 "bias": mk((w,))},
        "ln_2": {"scale": jnp.asarray(1 + 0.1 * rng.randn(w), jnp.float32),
                 "bias": mk((w,))},
        "attn": {"qkv_w": mk((w, 3 * w)), "qkv_b": mk((3 * w,)),
                 "out_w": mk((w, w)), "out_b": mk((w,))},
        "mlp": {"fc_w": mk((w, 4 * w)), "fc_b": mk((4 * w,)),
                "proj_w": mk((4 * w, w)), "proj_b": mk((w,))},
    }


@pytest.mark.parametrize("b", [1, 4, 8])  # g-blocking: 1, 4, 4x2 grids
@pytest.mark.parametrize("masked", [False, True])
def test_fused_block_matches_xla(b, masked):
    rng = np.random.RandomState(0)
    s, w, h = 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    mask = layers.causal_mask(s) if masked else None
    ref = layers.residual_block(x, p, h, mask)
    fused = bops.fused_residual_block(x, p, h, mask)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-6)


def test_fused_block_gradients_match_xla():
    rng = np.random.RandomState(1)
    b, s, w, h = 4, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    mask = layers.causal_mask(s)

    def loss(fn, xi):
        return jnp.sum(fn(xi, p, h, mask) ** 2)

    ga = jax.grad(lambda xi: loss(layers.residual_block, xi))(x)
    gb = jax.grad(lambda xi: loss(bops.fused_residual_block, xi))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=5e-6)


def test_fused_prompt_gradients_match_xla():
    """The real use case: grads flow to prompt rows injected into x."""
    rng = np.random.RandomState(2)
    b, s, w, h = 2, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    prompt = jnp.asarray(rng.randn(b, 2, w) * 0.05, jnp.float32)

    def loss(fn, pr):
        xi = x.at[:, 1:3].set(pr)
        return jnp.sum(fn(xi, p, h, None) ** 2)

    ga = jax.grad(lambda pr: loss(layers.residual_block, pr))(prompt)
    gb = jax.grad(lambda pr: loss(bops.fused_residual_block, pr))(prompt)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=5e-6)


def test_attn_rows_grouping_exact():
    """Block-diagonal grouped attention (engages at s < 128, mask-free):
    grouped kernel == per-image kernel, fwd and grad — the -1e9 mask
    zeroes cross-image probabilities EXACTLY (fp32 exp underflow), so
    this is equality math, not approximation. Also pins the picker's
    gr*s <= 128 bound and divisibility gate."""
    assert bops._attn_rows_group(32, 54) == 2    # ViT-B/32: 2*54 <= 128
    assert bops._attn_rows_group(32, 208) == 1   # ViT-B/16: no grouping
    assert bops._attn_rows_group(32, 30) == 4
    assert bops._attn_rows_group(3, 54) == 1     # b % gr != 0

    rng = np.random.RandomState(4)
    b, s, w, h = 4, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    gr = bops._attn_rows_group(b, s)
    assert gr == 4

    def per_image(xi):
        return bops.attn_block(xi, p["ln_1"], p["attn"], None, h)

    def grouped(xi):
        m = bops._block_diag_mask(gr, s)
        y = bops.attn_block(xi.reshape(b // gr, gr * s, w),
                            p["ln_1"], p["attn"], m, h)
        return y.reshape(b, s, w)

    np.testing.assert_allclose(np.asarray(grouped(x)),
                               np.asarray(per_image(x)), atol=2e-6)
    ga = jax.grad(lambda xi: jnp.sum(per_image(xi) ** 2))(x)
    gb = jax.grad(lambda xi: jnp.sum(grouped(xi) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=5e-6)


def test_fused_marker_routes_residual_block():
    rng = np.random.RandomState(3)
    b, s, w, h = 2, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    via_marker = layers.residual_block(x, p, h, None, attn_fn=bops.FUSED)
    direct = bops.fused_residual_block(x, p, h, None)
    np.testing.assert_array_equal(np.asarray(via_marker), np.asarray(direct))


def test_select_attn_fn_block():
    from mvlpt_tpu.ops.attention import select_attn_fn

    assert select_attn_fn("block") is bops.FUSED
    assert getattr(select_attn_fn("block"), "fused_block", False)


@pytest.mark.parametrize("b", [1, 4, 8])
@pytest.mark.parametrize("masked", [False, True])
def test_inference_block_bit_identical(b, masked):
    """The no-grad kernel variants (inference=True: no backward-residual
    HBM writes) run the SAME kernel math — outputs must be bit-identical
    to the training kernels, across g-blocking shapes and masks,
    including the ga>1 row-grouped path (s=9 < 128 engages grouping)."""
    rng = np.random.RandomState(7)
    s, w, h = 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    mask = layers.causal_mask(s) if masked else None
    train = bops.fused_residual_block(x, p, h, mask)
    infer = bops.fused_residual_block(x, p, h, mask, inference=True)
    np.testing.assert_array_equal(np.asarray(infer), np.asarray(train))


def test_inference_block_grad_fails_loudly():
    """Differentiating through the no-grad kernels raises a diagnostic
    NotImplementedError (not an opaque AD error from inside pallas)."""
    rng = np.random.RandomState(11)
    b, s, w, h = 2, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    with pytest.raises(NotImplementedError, match="no-grad eval kernel"):
        jax.grad(lambda x_: bops.fused_residual_block(
            x_, p, h, None, inference=True).sum())(x)


def test_inference_marker_plumbing():
    """select_attn_fn(inference=True) returns an inference-flagged
    marker; residual_block routes it to the no-grad kernels (outputs
    still bit-identical); as_inference preserves auto/mesh fields."""
    from mvlpt_tpu.ops.attention import select_attn_fn

    mk = select_attn_fn("block", inference=True)
    assert getattr(mk, "fused_block", False) and mk.inference
    assert not bops.FUSED.inference
    auto_inf = bops.FUSED_AUTO.as_inference()
    assert auto_inf.auto_selected and auto_inf.inference

    rng = np.random.RandomState(8)
    b, s, w, h = 2, 9, 32, 4
    x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
    p = _params(rng, w)
    via_marker = layers.residual_block(x, p, h, None, attn_fn=mk)
    train = layers.residual_block(x, p, h, None, attn_fn=bops.FUSED)
    np.testing.assert_array_equal(np.asarray(via_marker), np.asarray(train))


def test_inference_model_swap():
    """train_step._inference_model swaps fused markers for their
    inference variants and is a no-op for XLA (None) attn_fns and
    already-inference markers."""
    import dataclasses

    from mvlpt_tpu.core.clip import CLIPConfig
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.prompts import PromptSpec
    from mvlpt_tpu.train.train_step import _inference_model

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
        vision_patch_size=8, transformer_width=24, transformer_heads=2,
        transformer_layers=1, vision_heads_override=2)
    spec = PromptSpec(
        n_cls=2, coop_n_ctx=2, vpt_n_ctx=0, context_length=8,
        vision_layers=1, vision_width=32, text_width=24, embed_dim=16,
        vision_patch_size=8)
    m_xla = MVLPTModel(clip_cfg=cfg, spec=spec)
    assert _inference_model(m_xla) is m_xla
    m_fused = dataclasses.replace(m_xla, attn_fn=bops.FUSED)
    m_inf = _inference_model(m_fused)
    assert m_inf.attn_fn.inference and not m_fused.attn_fn.inference
    assert _inference_model(m_inf) is m_inf


@pytest.mark.slow
def test_full_model_with_fused_blocks():
    """MVLPT forward+grad through the fused path on tiny towers."""
    import dataclasses

    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.prompts import (
        PromptSpec, build_prompt_consts, init_prompt_params)

    clip_cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    spec = PromptSpec(
        n_cls=4, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=True,
        class_token_position="end", project_method="identity",
        project_dim=None, context_length=8, vision_layers=2,
        vision_width=32, text_width=32, embed_dim=16, vision_patch_size=8)
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts([f"c{i}" for i in range(4)], spec,
                                 backbone, jnp.float32)
    images = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    base = MVLPTModel(clip_cfg=clip_cfg, spec=spec,
                      compute_dtype=jnp.float32)
    fused = dataclasses.replace(base, attn_fn=bops.FUSED)
    ref_logits = base(backbone, pp, consts, images)
    fused_logits = fused(backbone, pp, consts, images)
    np.testing.assert_allclose(np.asarray(fused_logits),
                               np.asarray(ref_logits), atol=1e-4)

    def loss(model, p):
        return jnp.sum(model(backbone, p, consts, images) ** 2)

    ga = jax.grad(lambda p: loss(base, p))(pp)
    gb = jax.grad(lambda p: loss(fused, p))(pp)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        la, lb = np.asarray(la), np.asarray(lb)
        # grads scale with exp(logit_scale) ~1e2-1e3; compare relatively
        scale = max(1.0, float(np.max(np.abs(la))))
        np.testing.assert_allclose(lb / scale, la / scale, atol=2e-6)


class TestShardedFusedBlock:
    """fused_residual_block_sharded: shard_map over the 'data' axis on
    an 8-device CPU mesh must match the unsharded kernel bit-for-bit
    (same per-row math, just partitioned), for fwd and grads, for both
    divisible (data-sharded) and non-divisible (replicated) batches."""

    def _mesh(self, n_data=4, n_model=1):
        from mvlpt_tpu.parallel import create_mesh

        return create_mesh(n_data, n_model,
                           devices=jax.devices()[: n_data * n_model])

    @pytest.mark.parametrize("b,masked", [(8, False), (8, True), (6, False)])
    def test_matches_unsharded(self, b, masked):
        rng = np.random.RandomState(1)
        s, w, h = 9, 32, 4
        x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
        p = _params(rng, w)
        mask = layers.causal_mask(s) if masked else None
        mesh = self._mesh()

        ref = bops.fused_residual_block(x, p, h, mask)
        out = jax.jit(
            lambda x_, p_: bops.fused_residual_block_sharded(
                x_, p_, h, mask, mesh))(x, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    @pytest.mark.parametrize("b", [8, 6])
    def test_inference_matches_unsharded(self, b):
        """Sharded inference kernels (dp shard_map, no-grad variants) ==
        the unsharded training kernels, incl. the padded non-divisible
        row path (b=6 on dp=4)."""
        rng = np.random.RandomState(9)
        s, w, h = 9, 32, 4
        x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
        p = _params(rng, w)
        mesh = self._mesh()

        ref = bops.fused_residual_block(x, p, h, None)
        out = jax.jit(
            lambda x_, p_: bops.fused_residual_block_sharded(
                x_, p_, h, None, mesh, inference=True))(x, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_grads_match_unsharded(self):
        rng = np.random.RandomState(2)
        b, s, w, h = 8, 9, 32, 4
        x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
        p = _params(rng, w)
        mesh = self._mesh()

        def loss_plain(x_):
            return jnp.sum(bops.fused_residual_block(x_, p, h, None) ** 2)

        def loss_sharded(x_):
            return jnp.sum(bops.fused_residual_block_sharded(
                x_, p, h, None, mesh) ** 2)

        g_ref = jax.grad(loss_plain)(x)
        g = jax.jit(jax.grad(loss_sharded))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-4, atol=1e-4)

    def test_grads_match_unsharded_non_divisible_rows(self):
        """Rows not divisible by the data axis (6 rows, dp=4): the padded
        sharded path must give the same dx as the plain kernel — the old
        replicated P() fallback summed every device's full-batch dx
        (cotangent scaled by the mesh size) under check_rep=False."""
        rng = np.random.RandomState(5)
        b, s, w, h = 6, 9, 32, 4
        x = jnp.asarray(rng.randn(b, s, w), jnp.float32)
        p = _params(rng, w)
        mesh = self._mesh()

        def loss_plain(x_):
            return jnp.sum(bops.fused_residual_block(x_, p, h, None) ** 2)

        def loss_sharded(x_):
            return jnp.sum(bops.fused_residual_block_sharded(
                x_, p, h, None, mesh) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.jit(loss_sharded)(x)),
            np.asarray(loss_plain(x)), rtol=2e-5)
        g_ref = jax.grad(loss_plain)(x)
        g = jax.jit(jax.grad(loss_sharded))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-4, atol=1e-4)

    def test_select_attn_fn_mesh_routing(self):
        from mvlpt_tpu.ops.attention import select_attn_fn

        mesh = self._mesh(4, 1)
        marker = select_attn_fn("block", mesh=mesh)
        assert getattr(marker, "fused_block", False)
        assert marker.mesh is mesh
        # TP meshes route to the Megatron-sharded kernel variants now
        # (round 3; tests/test_tp_kernels.py) — forced 'block' keeps the
        # sharded marker instead of downgrading to the XLA path.
        tp_mesh = self._mesh(4, 2)
        tp_marker = select_attn_fn("block", mesh=tp_mesh)
        assert getattr(tp_marker, "fused_block", False)
        assert tp_marker.mesh is tp_mesh

    @pytest.mark.slow
    def test_full_train_step_on_mesh_with_sharded_kernels(self):
        """End-to-end: jitted windowed train step over a dp=4 mesh with
        the shard_map-wrapped kernels matches the XLA-path step."""
        from mvlpt_tpu.config import get_cfg_default
        from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
        from mvlpt_tpu.models.custom_clip import MVLPTModel
        from mvlpt_tpu.ops.block import _FusedMarker
        from mvlpt_tpu.parallel import (
            backbone_partition_specs, batch_specs, put_tree_on_mesh)
        from mvlpt_tpu.prompts import (
            PromptSpec, build_prompt_consts, init_prompt_params)
        from mvlpt_tpu.train.optim import build_optimizer
        from mvlpt_tpu.train.train_step import (
            init_train_state, make_train_step_multi)
        import dataclasses

        clip_cfg = CLIPConfig(
            embed_dim=32, image_resolution=32, vision_layers=2,
            vision_width=64, vision_patch_size=8, transformer_width=64,
            transformer_heads=2, transformer_layers=2,
            vision_heads_override=2)
        backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
        classnames = [f"c{i}" for i in range(6)]
        spec = PromptSpec(
            n_cls=6, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=True,
            class_token_position="middle", project_method="transformer",
            project_dim=16, context_length=8, vision_layers=2,
            vision_width=64, text_width=64, embed_dim=32,
            vision_patch_size=8)
        pp = init_prompt_params(jax.random.PRNGKey(1), spec)
        consts = build_prompt_consts(classnames, spec, backbone, jnp.float32)
        mesh = self._mesh(4, 1)

        cfg = get_cfg_default()
        tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=2)
        rng_np = np.random.RandomState(3)
        k, b = 2, 8
        batches_np = {
            "image": rng_np.randn(k, b, 32, 32, 3).astype(np.float32),
            "label": rng_np.randint(0, 6, (k, b)),
        }
        from jax.sharding import NamedSharding, PartitionSpec as P

        batches = {
            kk: jax.device_put(v, NamedSharding(
                mesh, P(None, "data") if np.ndim(v) >= 2 else P(None)))
            for kk, v in batches_np.items()
        }
        backbone_s = put_tree_on_mesh(
            backbone, backbone_partition_specs(backbone), mesh)
        key = jax.random.PRNGKey(4)

        model_xla = MVLPTModel(clip_cfg=clip_cfg, spec=spec,
                               compute_dtype=jnp.float32)
        step_xla = make_train_step_multi(model_xla, tx, donate=False,
                                         pre_embed=True)
        s_xla, m_xla = step_xla(init_train_state(pp, tx), backbone_s,
                                consts, batches, key)

        model_k = dataclasses.replace(
            model_xla, attn_fn=_FusedMarker(mesh=mesh))
        step_k = make_train_step_multi(model_k, tx, donate=False,
                                       pre_embed=True)
        s_k, m_k = step_k(init_train_state(pp, tx), backbone_s,
                          consts, batches, key)

        np.testing.assert_allclose(np.asarray(m_k["loss"]),
                                   np.asarray(m_xla["loss"]), atol=1e-5)
        for a, bb in zip(jax.tree_util.tree_leaves(s_k.prompt_params),
                         jax.tree_util.tree_leaves(s_xla.prompt_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=5e-4, atol=2e-5)
