"""Stem-split (pre-embedded window) and uint8 normalize-fold parity.

The windowed trainer/bench runs the frozen ViT stem once per window
(vit.embed_image) and feeds token batches to the scanned step with
``pre_embed=True``; images may stage as raw uint8 with CLIP
normalization folded into the patch-embed matmul. These must match the
plain per-step path bit-for-bit (fp32) / to bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.core import vit as vit_mod
from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
from mvlpt_tpu.data.transforms import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD
from mvlpt_tpu.models.custom_clip import MVLPTModel
from mvlpt_tpu.prompts import (
    PromptSpec, build_prompt_consts, init_prompt_params)
from mvlpt_tpu.train.optim import build_optimizer
from mvlpt_tpu.train.train_step import (
    init_train_state, make_train_step_multi)


def _tiny(n_cls=6, dtype=jnp.float32):
    clip_cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=64, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    if dtype != jnp.float32:
        from mvlpt_tpu.core.clip import cast_backbone
        backbone = cast_backbone(backbone, dtype)
    classnames = [f"c{i}" for i in range(n_cls)]
    spec = PromptSpec(
        n_cls=n_cls, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=True,
        class_token_position="middle", project_method="transformer",
        project_dim=16, context_length=8,
        vision_layers=2, vision_width=64, text_width=64, embed_dim=32,
        vision_patch_size=8)
    prompt_params = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(classnames, spec, backbone, dtype)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec, compute_dtype=dtype)
    return model, backbone, prompt_params, consts


def test_encode_image_pre_embedded_matches_raw():
    model, backbone, pp, consts = _tiny()
    images = jnp.asarray(
        np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    direct = model(backbone, pp, consts, images)
    tokens = model.embed_image(backbone, images)
    via_tokens = model(backbone, pp, consts, tokens, pre_embedded=True)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_tokens),
                               rtol=0, atol=0)


def test_uint8_normalize_fold_matches_host_normalize():
    """Folded (a⊙K, bias) stem == normalize-on-host then plain stem."""
    model, backbone, pp, consts = _tiny()
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    mean = np.asarray(CLIP_PIXEL_MEAN, np.float32)
    std = np.asarray(CLIP_PIXEL_STD, np.float32)
    host_norm = (u8.astype(np.float32) / 255.0 - mean) / std

    tok_folded = vit_mod.embed_image(
        backbone["visual"], jnp.asarray(u8), 8,
        normalize=(CLIP_PIXEL_MEAN, CLIP_PIXEL_STD))
    tok_plain = vit_mod.embed_image(
        backbone["visual"], jnp.asarray(host_norm), 8)
    np.testing.assert_allclose(np.asarray(tok_folded), np.asarray(tok_plain),
                               rtol=0, atol=1e-4)


def test_zeroshot_uint8_fast_path_matches_normalize_path():
    """models/zsclip.py's uint8 infer branch (normalize folded into the
    patch embed + pre-embedded tokens) == device_normalize + plain
    encode_image, the branch float batches take."""
    from mvlpt_tpu.core import clip as clip_core
    from mvlpt_tpu.data.transforms import device_normalize

    model, backbone, _, _ = _tiny()
    cfg = model.clip_cfg
    u8 = jnp.asarray(np.random.RandomState(7).randint(
        0, 256, (4, 32, 32, 3)).astype(np.uint8))
    norm = (CLIP_PIXEL_MEAN, CLIP_PIXEL_STD)

    tokens = vit_mod.embed_image(
        backbone["visual"], u8, cfg.vision_patch_size, normalize=norm)
    fast = clip_core.encode_image(backbone, tokens, cfg, pre_embedded=True)
    plain = clip_core.encode_image(
        backbone, device_normalize(u8, *norm), cfg)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_make_zs_infer_uint8_matches_float_path():
    """models/zsclip.py:make_zs_infer (the builder bench.py measures
    and _ZeroshotBase ships): logits from a uint8 batch (fast path:
    normalize folded into the patch embed) == logits from the same
    batch pre-normalized to float (plain path)."""
    from mvlpt_tpu.data.transforms import device_normalize
    from mvlpt_tpu.models.zsclip import make_zs_infer

    model, backbone, _, _ = _tiny()
    infer = make_zs_infer(model.clip_cfg, CLIP_PIXEL_MEAN, CLIP_PIXEL_STD)
    u8 = jnp.asarray(np.random.RandomState(11).randint(
        0, 256, (4, 32, 32, 3)).astype(np.uint8))
    text = np.random.RandomState(12).randn(6, 32).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    text = jnp.asarray(text)

    fast = infer(backbone, text, u8)
    plain = infer(backbone, text,
                  device_normalize(u8, CLIP_PIXEL_MEAN, CLIP_PIXEL_STD))
    assert fast.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_multi_step_pre_embed_matches_plain_multi():
    """make_train_step_multi(pre_embed=True, normalize=...) from uint8
    == the plain multi-step fed host-normalized fp32 images."""
    model, backbone, pp, consts = _tiny()
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=4)

    k, b = 3, 4
    rng = np.random.RandomState(2)
    u8 = rng.randint(0, 256, (k, b, 32, 32, 3)).astype(np.uint8)
    mean = np.asarray(CLIP_PIXEL_MEAN, np.float32)
    std = np.asarray(CLIP_PIXEL_STD, np.float32)
    labels = rng.randint(0, 6, (k, b))
    key = jax.random.PRNGKey(3)

    plain = make_train_step_multi(model, tx, donate=False)
    state0 = init_train_state(pp, tx)
    batches = {
        "image": jnp.asarray((u8.astype(np.float32) / 255.0 - mean) / std),
        "label": jnp.asarray(labels),
    }
    s_plain, m_plain = plain(state0, backbone, consts, batches, key)

    fused = make_train_step_multi(
        model, tx, donate=False, pre_embed=True,
        normalize=(CLIP_PIXEL_MEAN, CLIP_PIXEL_STD))
    state0 = init_train_state(pp, tx)
    u8_batches = {"image": jnp.asarray(u8), "label": jnp.asarray(labels)}
    s_fold, m_fold = fused(state0, backbone, consts, u8_batches, key)

    np.testing.assert_allclose(
        np.asarray(m_plain["loss"]), np.asarray(m_fold["loss"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m_plain["grad_norm"]), np.asarray(m_fold["grad_norm"]),
        rtol=2e-4)
    leaves_a = jax.tree_util.tree_leaves(s_plain.prompt_params)
    leaves_b = jax.tree_util.tree_leaves(s_fold.prompt_params)
    for a, bb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)


def test_multi_step_metrics_include_grad_norm():
    model, backbone, pp, consts = _tiny()
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=2)
    step = make_train_step_multi(model, tx, donate=False)
    rng = np.random.RandomState(4)
    batches = {
        "image": jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 6, (2, 4))),
    }
    _, m = step(init_train_state(pp, tx), backbone, consts, batches,
                jax.random.PRNGKey(0))
    assert set(m) >= {"loss", "acc", "grad_norm"}
    assert m["grad_norm"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(m["grad_norm"])))


def test_prepared_blocks_match_stacked():
    """prepare_blocks (per-layer pre-sliced weights, the windowed path's
    scan-hoisting) must give identical model output to stacked blocks,
    including deep-VPT injection and remat."""
    from mvlpt_tpu.ops.block import prepare_blocks

    model, backbone, pp, consts = _tiny()
    images = jnp.asarray(
        np.random.RandomState(5).randn(4, 32, 32, 3), jnp.float32)
    ref = model(backbone, pp, consts, images)
    prepared = model.prepare_backbone(backbone)
    # fused=False marker on this model: list form, no qkv_wT
    out = model(prepared, pp, consts, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)

    blocks = prepared["visual"]["blocks"]
    assert isinstance(blocks, list) and len(blocks) == 2

    kernel_form = prepare_blocks(backbone["visual"]["blocks"], fused=True)
    np.testing.assert_allclose(
        np.asarray(kernel_form[1]["attn"]["qkv_wT"]),
        np.asarray(backbone["visual"]["blocks"]["attn"]["qkv_w"][1].T))

    # remat over the list form
    import dataclasses
    model_r = dataclasses.replace(model, remat=True)
    out_r = model_r(prepared, pp, consts, images)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref), atol=1e-5)


def test_multi_step_with_prepared_backbone_matches():
    """The windowed step (which prepares the backbone internally) still
    matches the per-step path's math."""
    from mvlpt_tpu.train.train_step import make_train_step

    model, backbone, pp, consts = _tiny()
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=3)
    rng = np.random.RandomState(6)
    k, b = 3, 4
    imgs = rng.randn(k, b, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 6, (k, b))
    key = jax.random.PRNGKey(7)

    multi = make_train_step_multi(model, tx, donate=False)
    s_m, m_m = multi(init_train_state(pp, tx), backbone, consts,
                     {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)},
                     key)

    single = make_train_step(model, tx, donate=False)
    s_s = init_train_state(pp, tx)
    for i in range(k):
        step_rng = jax.random.fold_in(key, i)
        s_s, m_s = single(s_s, backbone, consts,
                          {"image": jnp.asarray(imgs[i]),
                           "label": jnp.asarray(labels[i])}, step_rng)
    np.testing.assert_allclose(
        float(m_m["loss"][-1]), float(m_s["loss"]), atol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(s_m.prompt_params),
                     jax.tree_util.tree_leaves(s_s.prompt_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=1e-6)
