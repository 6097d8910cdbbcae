"""Train-step tests: grad flow, overfit, soft labels, task masking,
and SPMD execution over the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
from mvlpt_tpu.models.custom_clip import MVLPTModel, TaskClassRanges
from mvlpt_tpu.prompts import (
    PromptSpec, build_prompt_consts, init_prompt_params, spec_from_cfg)
from mvlpt_tpu.train.optim import build_optimizer
from mvlpt_tpu.train.train_step import (
    init_train_state, make_eval_step, make_train_step, soft_cross_entropy)

CLASSNAMES = ["cat", "dog", "bird", "fish"]


def tiny_setup(coop=4, vpt=2, cocoop=0, csc=False, position="end"):
    clip_cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=24, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2,
    )
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    spec = PromptSpec(
        n_cls=len(CLASSNAMES), coop_n_ctx=coop, vpt_n_ctx=vpt,
        cocoop_n_ctx=cocoop, coop_csc=csc, class_token_position=position,
        project_method="transformer", project_dim=8, context_length=16,
        vision_layers=clip_cfg.vision_layers, vision_width=clip_cfg.vision_width,
        text_width=clip_cfg.transformer_width, embed_dim=clip_cfg.embed_dim,
        vision_patch_size=clip_cfg.vision_patch_size,
    )
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(CLASSNAMES, spec, backbone, jnp.float32)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec, compute_dtype=jnp.float32)
    return backbone, spec, pp, consts, model


def make_batch(n=8, res=16, n_cls=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.randn(n, res, res, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, n_cls, n)),
    }


def test_overfit_tiny_batch():
    backbone, spec, pp, consts, model = tiny_setup()
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.05
    cfg.OPTIM.MAX_EPOCH = 100
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 0
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)
    state = init_train_state(pp, tx)
    step = make_train_step(model, tx, donate=False)
    batch = make_batch()
    losses = []
    for i in range(60):
        state, m = step(state, backbone, consts, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert float(m["acc"]) >= 0.75


def test_grads_do_not_touch_backbone():
    backbone, spec, pp, consts, model = tiny_setup()

    def loss(pp_, backbone_):
        logits = model(backbone_, pp_, consts, make_batch()["image"])
        return soft_cross_entropy(logits, make_batch()["label"])

    g = jax.grad(loss)(pp, backbone)
    norms = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), g)
    # every prompt leaf receives gradient signal
    flat = jax.tree_util.tree_leaves(norms)
    assert all(np.isfinite(flat))
    assert sum(v > 0 for v in flat) >= len(flat) - 2


def test_soft_label_path():
    backbone, spec, pp, consts, model = tiny_setup()
    batch = make_batch()
    khot = jax.nn.one_hot(batch["label"], 4) + jax.nn.one_hot(
        (batch["label"] + 1) % 4, 4)
    logits = model(backbone, pp, consts, batch["image"])
    loss = soft_cross_entropy(logits, khot)
    assert np.isfinite(float(loss))


def test_task_masking_zeroes_out_of_range():
    backbone, spec, pp, consts, model = tiny_setup()
    ranges = TaskClassRanges(start=jnp.asarray([0, 2]), end=jnp.asarray([2, 4]))
    batch = make_batch()
    tasks = jnp.asarray([0, 1] * 4)
    logits = model(backbone, pp, consts, batch["image"],
                   tasks=tasks, task_ranges=ranges)
    out = np.asarray(logits)
    assert (out[0, 2:] == 0).all() and (out[1, :2] == 0).all()


def test_cached_text_eval_matches_eval_step():
    """make_cached_text_eval (one text-tower pass per split) must produce
    bit-identical logits to make_eval_step, with and without task masks;
    CoCoOp (image-conditioned text) opts out."""
    from mvlpt_tpu.train.train_step import make_cached_text_eval

    backbone, spec, pp, consts, model = tiny_setup()
    ranges = TaskClassRanges(start=jnp.asarray([0, 2]), end=jnp.asarray([2, 4]))
    batch = dict(make_batch(), task=jnp.asarray([0, 1] * 4))

    for tr in (None, ranges):
        eval_step = make_eval_step(model, tr)
        text_fn, cached_step = make_cached_text_eval(model, tr)
        b = batch if tr is not None else {"image": batch["image"]}
        want = np.asarray(eval_step(backbone, pp, consts, b))
        tf = text_fn(backbone, pp, consts)
        got = np.asarray(cached_step(backbone, pp, tf, b))
        np.testing.assert_array_equal(want, got)

    _, _, pp_c, consts_c, model_c = tiny_setup(cocoop=2)
    assert make_cached_text_eval(model_c) == (None, None)


def test_cocoop_forward():
    backbone, spec, pp, consts, model = tiny_setup(coop=0, vpt=0, cocoop=3)
    batch = make_batch(n=4)
    logits = model(backbone, pp, consts, batch["image"])
    assert logits.shape == (4, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_csc_class_specific_context():
    backbone, spec, pp, consts, model = tiny_setup(csc=True, vpt=0)
    assert pp["coop"]["ctx"].shape == (4, 4, 24)
    logits = model(backbone, pp, consts, make_batch()["image"])
    assert logits.shape == (8, 4)


def test_spmd_step_on_8_device_mesh():
    from mvlpt_tpu.parallel import (
        backbone_partition_specs, batch_specs, create_mesh, replicated_specs,
        shard_tree)

    backbone, spec, pp, consts, model = tiny_setup()
    mesh = create_mesh(n_data=4, n_model=2)
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)
    state = init_train_state(pp, tx)
    step = make_train_step(model, tx, donate=False)

    with mesh:
        backbone_s = shard_tree(backbone, backbone_partition_specs(backbone), mesh)
        batch = make_batch()
        batch_s = shard_tree(batch, batch_specs(batch), mesh)
        state2, m = step(state, backbone_s, consts, batch_s, jax.random.PRNGKey(0))
    # same numbers as the single-device step
    step1 = make_train_step(model, tx, donate=False)
    state1, m1 = step1(state, backbone, consts, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state2.prompt_params),
                    jax.tree_util.tree_leaves(state1.prompt_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_vpt_only_windowed_hoists_static_text_exactly():
    """Pure-VPT specs (PromptSpec.text_is_static) hoist the text tower
    out of the windowed scan (make_train_step_multi computes it once
    per dispatch); the math must stay EXACTLY the per-step path's —
    d(text)/d(params) = 0, so hoisting changes no gradient."""
    backbone, spec, pp, consts, model = tiny_setup(coop=0, vpt=2)
    assert spec.text_is_static and not spec.has_coupler
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=4)
    from mvlpt_tpu.train.train_step import make_train_step_multi

    rng_np = np.random.RandomState(3)
    K = 4
    imgs = rng_np.randn(K, 2, 16, 16, 3).astype(np.float32)
    labels = rng_np.randint(0, 4, (K, 2))
    key = jax.random.PRNGKey(5)

    single = make_train_step(model, tx, donate=False)  # full per-step text
    s1 = init_train_state(pp, tx)
    for i in range(K):
        s1, _ = single(s1, backbone, consts,
                       {"image": jnp.asarray(imgs[i]),
                        "label": jnp.asarray(labels[i])},
                       jax.random.fold_in(key, i))

    multi = make_train_step_multi(model, tx, donate=False)  # hoisted text
    s2 = init_train_state(jax.tree_util.tree_map(jnp.array, pp), tx)
    s2, mstack = multi(s2, backbone, consts,
                       {"image": jnp.asarray(imgs),
                        "label": jnp.asarray(labels)}, key)
    assert mstack["loss"].shape == (K,)
    for a, b in zip(jax.tree_util.tree_leaves(s1.prompt_params),
                    jax.tree_util.tree_leaves(s2.prompt_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_windowed_epoch_matches_single_dispatch_math():
    """TRAIN.STEPS_PER_DISPATCH > 1 stages loader batches through ONE
    jitted scan; optimizer math must match the per-batch path (the
    dropout rng stream differs by design — these specs use none)."""
    import numpy as np

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.prompts import (
        PromptSpec, build_prompt_consts, init_prompt_params)
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import (
        init_train_state, make_train_step, make_train_step_multi)

    clip_cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    spec = PromptSpec(
        n_cls=4, coop_n_ctx=2, vpt_n_ctx=0, vpt_deep=False,
        class_token_position="end", project_method="identity",
        project_dim=None, context_length=8, vision_layers=2,
        vision_width=32, text_width=32, embed_dim=16, vision_patch_size=8)
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(
        [f"c{i}" for i in range(4)], spec, backbone, jnp.float32)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec,
                       compute_dtype=jnp.float32)
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=4)
    rng_np = np.random.RandomState(0)
    K = 4
    imgs = rng_np.randn(K, 2, 16, 16, 3).astype(np.float32)
    labels = rng_np.randint(0, 4, (K, 2))
    key = jax.random.PRNGKey(7)

    single = make_train_step(model, tx, donate=False)
    s1 = init_train_state(pp, tx)
    for i in range(K):
        s1, _ = single(s1, backbone, consts,
                       {"image": jnp.asarray(imgs[i]),
                        "label": jnp.asarray(labels[i])},
                       jax.random.fold_in(key, i))

    multi = make_train_step_multi(model, tx, donate=False)
    s2 = init_train_state(jax.tree_util.tree_map(jnp.array, pp), tx)
    s2, mstack = multi(s2, backbone, consts,
                       {"image": jnp.asarray(imgs),
                        "label": jnp.asarray(labels)}, key)
    assert int(s2.step) == int(s1.step) == K
    assert mstack["loss"].shape == (K,)
    for a, b in zip(jax.tree_util.tree_leaves(s1.prompt_params),
                    jax.tree_util.tree_leaves(s2.prompt_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_cocoop_remat_chunk_tower_grads():
    """CoCoOp's chunked text tower remats past 8k conditioned rows (or
    when model.remat is set): at 1000 classes the un-rematted lax.map
    stored ~19 GB of residuals (HBM OOM). Exercise the checkpointed
    path via remat=True on tiny towers."""
    import dataclasses

    import numpy as np

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
        n_cls=4, cocoop_n_ctx=2, context_length=8, vision_layers=2,
        vision_width=32, text_width=32, embed_dim=16, vision_patch_size=8)
    pp = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(
        [f"c{i}" for i in range(4)], spec, backbone, jnp.float32)
    images = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    plain = MVLPTModel(clip_cfg=clip_cfg, spec=spec,
                       compute_dtype=jnp.float32)
    # remat=False here only affects the towers; CoCoOp's chunk remat
    # triggers via the model.remat flag
    remat = dataclasses.replace(plain, remat=True)

    def loss(model, p):
        return jnp.sum(model(backbone, p, consts, images) ** 2)

    la = float(loss(plain, pp))
    lb = float(loss(remat, pp))
    np.testing.assert_allclose(lb, la, rtol=1e-5)
    ga = jax.grad(lambda p: loss(plain, p))(pp)
    gb = jax.grad(lambda p: loss(remat, p))(pp)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-5)
