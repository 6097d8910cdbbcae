"""Parity vs the reference implementation's OWN torch code.

Two layers of ground truth, both fully offline (VERDICT.md item 2):

A. Checkpoint-converter parity: a random OpenAI-layout state_dict goes
   through the reference's ``clip.model.build_model``
   (/root/reference/clip/model.py:395-432) — the exact path every real
   released checkpoint takes — and through our
   ``convert_openai_state_dict`` / ``convert_openai_rn_state_dict``;
   tower outputs must agree in fp32. This covers the ViT AND the
   ModifiedResNet converter, which the HF parity tests cannot reach.

B. Full prompt-model parity: the reference's MultitaskVLPromptLearner /
   CustomCLIP (/root/reference/trainers/mvlpt.py:138-583) are
   instantiated on CPU (dassl stubbed, tests/ref_loader.py), their
   freshly-initialized prompt parameters are copied into our pytree, and
   end-to-end logits are compared for every prompt mode: CoOp
   end/middle/front, deep & projected VPT, UPT coupling, CoCoOp, and
   per-task logit masking.
"""

import copy

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_loader import load_reference

from mvlpt_tpu.checkpoint.convert import (
    _stack_openai_blocks,
    convert_openai_rn_state_dict,
    convert_openai_state_dict,
)
from mvlpt_tpu.core import clip as clip_core
from mvlpt_tpu.models.custom_clip import MVLPTModel, TaskClassRanges
from mvlpt_tpu.prompts.learner import (
    build_prompt_consts,
    init_prompt_params,
    spec_from_cfg,
)
from mvlpt_tpu.config import get_cfg_default



pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

@pytest.fixture(scope="module")
def ref():
    clip_model, clip_pkg, mvlpt = load_reference()
    return {"model": clip_model, "clip": clip_pkg, "mvlpt": mvlpt}


def _tiny_vit_clip(ref, seed=0):
    torch.manual_seed(seed)
    return ref["model"].CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )


# ---------------------------------------------------------------------------
# A. build_model converter parity
# ---------------------------------------------------------------------------


def test_openai_vit_converter_parity(ref):
    """Random ViT state_dict -> reference build_model vs our converter."""
    m = _tiny_vit_clip(ref)
    # Released checkpoints store fp16 weights; feed the identical halved
    # dict to both sides so any dtype handling difference shows up.
    sd = {k: v.half() for k, v in m.state_dict().items()}

    tm = ref["model"].build_model(copy.deepcopy(sd)).float().eval()
    params, jcfg = convert_openai_state_dict(sd)
    assert jcfg.vision_heads == 1 and jcfg.transformer_heads == 1

    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want_img = tm.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got_img = np.asarray(clip_core.encode_image(params, jnp.asarray(imgs), jcfg))
    # measured ~5e-7 on this tower; tight so layout slips can't hide
    np.testing.assert_allclose(got_img, want_img, rtol=1e-5, atol=1e-5)

    texts = ["a photo of a cat.", "a diagram of an airplane engine."]
    ids = ref["clip"].tokenize(texts)
    with torch.no_grad():
        want_txt = tm.encode_text(ids).numpy()
    got_txt = np.asarray(
        clip_core.encode_text(params, jnp.asarray(ids.numpy()), jcfg))
    np.testing.assert_allclose(got_txt, want_txt, rtol=1e-5, atol=1e-5)


def test_openai_rn_converter_parity(ref):
    """Random RN50-layout state_dict through both converters (covers the
    ModifiedResNet stem/bottlenecks/attn-pool and inference BatchNorm)."""
    torch.manual_seed(3)
    m = ref["model"].CLIP(
        embed_dim=32, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=77,
        vocab_size=512, transformer_width=64, transformer_heads=1,
        transformer_layers=2,
    )
    # Randomize BN running stats so inference-BN conversion is actually
    # exercised (fresh init is mean 0 / var 1, which hides mistakes).
    gen = torch.Generator().manual_seed(7)
    for name, buf in m.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.2)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    sd = {k: v.half() for k, v in m.state_dict().items()}

    tm = ref["model"].build_model(copy.deepcopy(sd)).float().eval()
    params, rcfg, _text_cfg = convert_openai_rn_state_dict(sd)

    rng = np.random.RandomState(2)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tm.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(clip_core.encode_image(params, jnp.asarray(imgs), rcfg))
    # Tight on purpose: a padding/layout slip in the conv stack measures
    # ~1e-4 here (the random attention pool's spatial mean nearly washes
    # it out) but is catastrophic with trained weights — 5e-4 once let
    # an asymmetric-SAME stem conv through.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# B. Full prompt-model parity (reference CustomCLIP vs MVLPTModel)
# ---------------------------------------------------------------------------

CLASSNAMES = ["golden retriever", "tabby cat", "jet airliner", "oak_tree"]


def _lin(mod):
    return {"kernel": np.asarray(mod.weight.detach().float().numpy()).T,
            "bias": np.asarray(mod.bias.detach().float().numpy())}


def params_from_ref_learner(pl, spec):
    """Copy the reference learner's freshly-initialized trainable tensors
    into our prompt-param pytree layout (prompts/learner.py schema)."""
    t2n = lambda t: np.asarray(t.detach().float().numpy())  # noqa: E731
    p = {}
    if spec.has_vpt:
        vpt = {"embeddings": t2n(pl.vpt_embeddings)}
        if spec.vpt_deep and pl.vpt_embeddings_deep is not None:
            vpt["embeddings_deep"] = t2n(pl.vpt_embeddings_deep)
        if spec.vpt_proj_dim > -1:
            vpt["proj"] = _lin(pl.vpt_proj)
        p["vpt"] = vpt
    if spec.has_coop:
        p["coop"] = {"ctx": t2n(pl.ctx)}
    if spec.has_coupler:
        proj = {}
        if not isinstance(pl.mvlpt_proj_ctx_coop_pre, torch.nn.Identity):
            proj["coop_pre"] = _lin(pl.mvlpt_proj_ctx_coop_pre)
            proj["coop_post"] = _lin(pl.mvlpt_proj_ctx_coop_post)
        if not isinstance(pl.mvlpt_proj_ctx_vpt_pre, torch.nn.Identity):
            proj["vpt_pre"] = _lin(pl.mvlpt_proj_ctx_vpt_pre)
            proj["vpt_post"] = _lin(pl.mvlpt_proj_ctx_vpt_post)
        if spec.project_method in ("transformer", "transformer_seq"):
            sd = {f"t.{k}": v for k, v in pl.mvlpt_proj.state_dict().items()}
            proj["transformer"] = _stack_openai_blocks(sd, "t", 1)
        p["mvlpt_proj"] = proj
    if spec.has_cocoop:
        p["cocoop"] = {
            "ctx": t2n(pl.cocoop_ctx),
            "meta_net": {"linear1": _lin(pl.meta_net.linear1),
                         "linear2": _lin(pl.meta_net.linear2)},
        }
    import jax
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), p)


def _make_cfg(**overrides):
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.CUT_CONTEXTLEN = True
    t = cfg.TRAINER.MVLPT
    t.COOP.N_CTX = 0
    t.VPT.N_CTX = 0
    t.COCOOP.N_CTX = 0
    for key, val in overrides.items():
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = val
    return cfg


MODES = {
    "coop_end": {"TRAINER.MVLPT.COOP.N_CTX": 4},
    "coop_middle": {"TRAINER.MVLPT.COOP.N_CTX": 5,
                    "TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION": "middle"},
    "coop_front": {"TRAINER.MVLPT.COOP.N_CTX": 4,
                   "TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION": "front"},
    "coop_csc": {"TRAINER.MVLPT.COOP.N_CTX": 4, "TRAINER.MVLPT.COOP.CSC": True},
    "coop_ctx_init": {"TRAINER.MVLPT.COOP.N_CTX": 4,
                      "TRAINER.MVLPT.COOP.CTX_INIT": "a_photo_of_a"},
    "vpt_deep": {"TRAINER.MVLPT.VPT.N_CTX": 2, "TRAINER.MVLPT.VPT.DEEP": True},
    "vpt_shallow_proj": {"TRAINER.MVLPT.VPT.N_CTX": 2,
                         "TRAINER.MVLPT.VPT.DEEP": False,
                         "TRAINER.MVLPT.VPT.PROJECT": 8},
    "vpt_full_context": {"TRAINER.MVLPT.VPT.N_CTX": 2,
                         "TRAINER.CUT_CONTEXTLEN": False},
    "upt": {"TRAINER.MVLPT.COOP.N_CTX": 4, "TRAINER.MVLPT.VPT.N_CTX": 2,
            "TRAINER.MVLPT.PROJECT_DIM": 16,
            "TRAINER.MVLPT.PROJECT_METHOD": "transformer",
            "TRAINER.MVLPT.COOP.CLASS_TOKEN_POSITION": "middle"},
    # PREC fp32: the reference halves only the meta-net under fp16
    # (mvlpt.py:289-291), which cannot run against a fp32 CLIP on CPU.
    "cocoop": {"TRAINER.MVLPT.COCOOP.N_CTX": 4,
               "TRAINER.MVLPT.COCOOP.PREC": "fp32"},
}


def _build_both(ref, cfg, classnames=CLASSNAMES, dm=None):
    clip_model = _tiny_vit_clip(ref).float().eval()
    torch.manual_seed(11)
    ref_model = ref["mvlpt"].CustomCLIP(cfg, classnames, clip_model, dm=dm).eval()

    params, jcfg = convert_openai_state_dict(clip_model.state_dict())
    spec = spec_from_cfg(cfg, len(classnames), jcfg, classnames)
    consts = build_prompt_consts(
        classnames, spec, params, compute_dtype=jnp.float32,
        ctx_init=(cfg.TRAINER.MVLPT.COCOOP.CTX_INIT if spec.has_cocoop
                  else cfg.TRAINER.MVLPT.COOP.CTX_INIT))
    prompt_params = params_from_ref_learner(ref_model.prompt_learner, spec)
    model = MVLPTModel(jcfg, spec, compute_dtype=jnp.float32)

    # The realized context length must agree or prompts are laid out
    # differently before any numerics run.
    assert consts.tokenized.shape[1] == ref_model.tokenized_prompts.shape[1]
    np.testing.assert_array_equal(
        consts.tokenized, ref_model.tokenized_prompts.numpy())
    return ref_model, model, params, prompt_params, consts


@pytest.mark.parametrize("mode", sorted(MODES))
def test_prompt_model_parity(ref, mode):
    cfg = _make_cfg(**MODES[mode])
    ref_model, model, params, prompt_params, consts = _build_both(ref, cfg)

    rng = np.random.RandomState(5)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model(params, prompt_params, consts, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_prompt_model_parity_task_masking(ref):
    """Per-task logit masking (mvlpt.py:527-538, 574-581) with a stub dm."""
    classnames = CLASSNAMES + ["red apple", "sports car"]
    dm = type("DM", (), {})()
    dm._task_names = ["t0", "t1"]
    dm._labelmap = {"t0": [0, 1], "t1": [0, 1, 2, 3]}
    dm._num_classes = 6
    cfg = _make_cfg(**{"TRAINER.MVLPT.COOP.N_CTX": 4,
                       "DATASET.MULTITASK_LABEL_PERTASK": True})
    ref_model, model, params, prompt_params, consts = _build_both(
        ref, cfg, classnames=classnames, dm=dm)

    rng = np.random.RandomState(6)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    tasks = np.array([0, 1])
    with torch.no_grad():
        want = ref_model(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                         task=torch.from_numpy(tasks)).numpy()
    ranges = TaskClassRanges(start=jnp.asarray([0, 2]), end=jnp.asarray([2, 6]))
    got = np.asarray(model(params, prompt_params, consts, jnp.asarray(imgs),
                           tasks=jnp.asarray(tasks), task_ranges=ranges))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
