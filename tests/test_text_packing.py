"""Class-packed text encoding must be numerically identical to the plain
per-class path (block-diagonal attention isolates classes)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
from mvlpt_tpu.core import text as text_mod


def test_packed_matches_plain():
    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)["text"]
    rng = np.random.RandomState(0)
    n_cls, s = 37, 9  # g = 128 // 9 = 14, n_cls not a multiple -> padding
    prompts = jnp.asarray(rng.randn(n_cls, s, 32), jnp.float32)
    eot = jnp.asarray(rng.randint(1, s, n_cls))

    plain = text_mod.encode_text_embeds(params, prompts, eot, n_heads=2)
    packed = text_mod.encode_text_embeds_packed(params, prompts, eot, n_heads=2)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(plain), rtol=2e-5, atol=2e-5)


def test_packed_gradients_match_plain():
    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)["text"]
    rng = np.random.RandomState(1)
    prompts = jnp.asarray(rng.randn(10, 7, 32), jnp.float32)
    eot = jnp.asarray(rng.randint(1, 7, 10))

    def loss(fn, p):
        return jnp.sum(fn(params, p, eot, n_heads=2).astype(jnp.float32) ** 2)

    g1 = jax.grad(lambda p: loss(text_mod.encode_text_embeds, p))(prompts)
    g2 = jax.grad(lambda p: loss(text_mod.encode_text_embeds_packed, p))(prompts)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=5e-5, atol=5e-5)


def test_packed_text_grad_under_lax_map():
    """Regression: the sdpa custom_vjp used to CLOSE OVER the packed
    block-diagonal mask; a traced mask leaked out of lax.map bodies
    (CoCoOp's chunked text tower) with UnexpectedTracerError. The mask
    is now a formal custom_vjp argument."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvlpt_tpu.core import text as text_mod
    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    bb = init_clip_params(jax.random.PRNGKey(0), cfg)
    n_cls, s, w = 40, 8, 32  # packs at g=16 (target 128 tokens)
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(2, n_cls, s, w) * 0.02, jnp.float32)
    eot = jnp.full((n_cls,), s - 1, jnp.int32)

    def loss(e):
        def body(e1):
            return text_mod.encode_text_embeds_packed(
                bb["text"], e1, eot, n_heads=2)
        return jnp.sum(jax.lax.map(body, e) ** 2)

    g = jax.jit(jax.grad(loss))(embeds)
    assert bool(jnp.isfinite(jnp.sum(g)))
