"""Prompt assembly semantics tests (SURVEY.md §4 item 3).

The middle/front class-token layouts are checked against a direct numpy
transcription of the reference's per-class concat loops
(mvlpt.py:459-510), so the vectorized gather must reproduce ragged
assembly exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
from mvlpt_tpu.prompts import (
    PromptSpec,
    build_prompt_consts,
    coop_assemble,
    init_prompt_params,
    upt_couple,
    vpt_prepare,
)
from mvlpt_tpu.tokenizer import get_tokenizer

CLASSNAMES = ["cat", "golden retriever", "annual crop land", "air conditioner", "x"]


def tiny_clip():
    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=24,
        vision_patch_size=8, transformer_width=20, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2,
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def reference_layout(prefix, ctx, suffix, name_lens, position):
    """Numpy transcription of the reference's ragged per-class loops."""
    n_cls, n_ctx = ctx.shape[0], ctx.shape[1]
    half = n_ctx // 2
    rows = []
    for i in range(n_cls):
        nl = int(name_lens[i])
        name, rest = suffix[i, :nl], suffix[i, nl:]
        if position == "end":
            row = np.concatenate([prefix[i], ctx[i], suffix[i]], axis=0)
        elif position == "middle":
            row = np.concatenate(
                [prefix[i], ctx[i, :half], name, ctx[i, half:], rest], axis=0)
        elif position == "front":
            row = np.concatenate([prefix[i], name, ctx[i], rest], axis=0)
        rows.append(row)
    return np.stack(rows)


@pytest.mark.parametrize("position", ["end", "middle", "front"])
def test_coop_assembly_matches_ragged_reference(position):
    cfg, params = tiny_clip()
    spec = PromptSpec(
        n_cls=len(CLASSNAMES), coop_n_ctx=5, class_token_position=position,
        context_length=20, text_width=cfg.transformer_width,
        vision_layers=cfg.vision_layers, vision_width=cfg.vision_width,
        embed_dim=cfg.embed_dim, vision_patch_size=cfg.vision_patch_size,
    )
    consts = build_prompt_consts(CLASSNAMES, spec, params, jnp.float32)
    ctx = np.random.RandomState(0).randn(spec.n_cls, 5, cfg.transformer_width)
    got = np.asarray(coop_assemble(jnp.asarray(ctx, jnp.float32), consts, spec))

    tok = get_tokenizer()
    name_lens = [len(tok.encode(c)) for c in CLASSNAMES]
    want = reference_layout(
        np.asarray(consts.token_prefix), ctx.astype(np.float32),
        np.asarray(consts.token_suffix), name_lens, position)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eot_position_invariant_under_permutation():
    # EOT feature gather index (argmax of ids) must stay correct for
    # middle/front layouts: only pre-EOT tokens are permuted.
    cfg, params = tiny_clip()
    spec = PromptSpec(
        n_cls=len(CLASSNAMES), coop_n_ctx=4, class_token_position="middle",
        context_length=18, text_width=cfg.transformer_width,
        vision_layers=cfg.vision_layers, vision_width=cfg.vision_width,
        embed_dim=cfg.embed_dim, vision_patch_size=cfg.vision_patch_size,
    )
    consts = build_prompt_consts(CLASSNAMES, spec, params, jnp.float32)
    perm = np.asarray(consts.perm)
    for i, e in enumerate(np.asarray(consts.eot_idx)):
        assert perm[i, e] == e  # EOT slot maps to itself


def test_upt_coupler_shapes_and_fp32():
    cfg, params = tiny_clip()
    spec = PromptSpec(
        n_cls=3, coop_n_ctx=4, vpt_n_ctx=2, vpt_deep=True,
        project_method="transformer", project_dim=8, context_length=16,
        text_width=cfg.transformer_width, vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width, embed_dim=cfg.embed_dim,
        vision_patch_size=cfg.vision_patch_size,
    )
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    assert "mvlpt_proj" in pp and "transformer" in pp["mvlpt_proj"]
    coop_ctx, vpt_sh, vpt_dp = upt_couple(pp, spec)
    assert coop_ctx.shape == (4, cfg.transformer_width)
    assert vpt_sh.shape == (1, 2, cfg.vision_width)
    assert vpt_dp.shape == (cfg.vision_layers - 1, 2, cfg.vision_width)
    assert coop_ctx.dtype == jnp.float32  # fp32 island (mvlpt.py:406)


def test_upt_identity_when_project_method_identity():
    cfg, _ = tiny_clip()
    spec = PromptSpec(
        n_cls=3, coop_n_ctx=4, vpt_n_ctx=2, project_method="identity",
        context_length=16, text_width=cfg.transformer_width,
        vision_layers=cfg.vision_layers, vision_width=cfg.vision_width,
        embed_dim=cfg.embed_dim, vision_patch_size=cfg.vision_patch_size,
    )
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    coop_ctx, vpt_sh, vpt_dp = upt_couple(pp, spec)
    np.testing.assert_array_equal(np.asarray(coop_ctx), np.asarray(pp["coop"]["ctx"]))
    np.testing.assert_array_equal(np.asarray(vpt_sh), np.asarray(pp["vpt"]["embeddings"]))


def test_vpt_project_dim():
    cfg, _ = tiny_clip()
    spec = PromptSpec(
        n_cls=3, vpt_n_ctx=2, vpt_proj_dim=6, vpt_deep=True, context_length=16,
        text_width=cfg.transformer_width, vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width, embed_dim=cfg.embed_dim,
        vision_patch_size=cfg.vision_patch_size,
    )
    pp = init_prompt_params(jax.random.PRNGKey(2), spec)
    assert pp["vpt"]["embeddings"].shape == (1, 2, 6)
    sh, dp = vpt_prepare(pp, spec, None, None)
    assert sh.shape == (1, 2, cfg.vision_width)
    assert dp.shape == (cfg.vision_layers - 1, 2, cfg.vision_width)


def test_ctx_init_from_words():
    cfg, params = tiny_clip()
    spec = PromptSpec(
        n_cls=2, coop_n_ctx=4, context_length=16,
        text_width=cfg.transformer_width, vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width, embed_dim=cfg.embed_dim,
        vision_patch_size=cfg.vision_patch_size,
    )
    pp = init_prompt_params(
        jax.random.PRNGKey(3), spec, clip_params=params,
        coop_ctx_init="a photo of a")
    emb = np.asarray(params["text"]["token_embedding"])
    from mvlpt_tpu.tokenizer import tokenize
    ids = tokenize("a photo of a")[0]
    np.testing.assert_allclose(
        np.asarray(pp["coop"]["ctx"]), emb[ids[1:5]], rtol=1e-6)
