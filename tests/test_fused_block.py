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
