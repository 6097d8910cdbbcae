"""The MVLPT model forward: frozen CLIP + prompt params -> logits.

Functional equivalent of CustomCLIP (mvlpt.py:517-583). One pure
function computes: UPT coupling -> image tower with VPT injection ->
CoOp prompt assembly -> text tower -> normalized cosine logits ->
optional per-task logit masking.

Everything is a jittable function of
(backbone_params, prompt_params, consts, batch); gradients are taken
w.r.t. ``prompt_params`` only, which replaces the reference's
requires_grad freezing (mvlpt.py:855-860).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import clip as clip_core
from mvlpt_tpu.core import text as text_mod
from mvlpt_tpu.core import vit as vit_mod
from mvlpt_tpu.core.clip import CLIPConfig
from mvlpt_tpu.prompts import (
    PromptConsts,
    PromptSpec,
    cocoop_condition,
    coop_assemble,
    upt_couple,
    vpt_prepare,
)


@dataclasses.dataclass(frozen=True)
class TaskClassRanges:
    """Per-task class index ranges for multitask logit masking
    (mvlpt.py:527-538). Arrays indexed by task id."""

    start: jax.Array  # (n_tasks,)
    end: jax.Array    # (n_tasks,)


def _auto_chunk(batch: int, n_cls: int, target_rows: int = 4096) -> int:
    """Largest divisor of ``batch`` keeping chunk*n_cls near target_rows.

    All shapes are static under jit, so this runs at trace time."""
    best = 1
    for c in range(1, batch + 1):
        if batch % c == 0 and c * n_cls <= target_rows:
            best = c
    return best


@dataclasses.dataclass(frozen=True)
class MVLPTModel:
    """Static bundle: architecture + prompt spec + frozen options."""

    clip_cfg: CLIPConfig
    spec: PromptSpec
    remat: bool = False
    attn_fn: Callable | None = None
    compute_dtype: jnp.dtype = jnp.bfloat16
    # CoCoOp: how many instances' class grids go through the text tower
    # per call (None = auto: target ~4k rows/call, divisor of the batch).
    cocoop_chunk: int | None = None

    def prepare_backbone(self, backbone):
        """Pre-slice the stacked tower weights into per-layer trees
        (+ the fused kernels' transposed qkv layout) —
        ops.block.prepare_blocks. Call OUTSIDE a multi-step scan so the
        per-step program carries no loop-invariant weight slicing; the
        towers consume the list form transparently
        (core/layers.py:transformer)."""
        from mvlpt_tpu.ops.block import prepare_blocks

        fused = bool(getattr(self.attn_fn, "fused_block", False))
        tp = 1
        mesh = getattr(self.attn_fn, "mesh", None)
        if fused and mesh is not None:
            tp = dict(zip(mesh.axis_names,
                          mesh.devices.shape)).get("model", 1)
        out = dict(backbone)
        for tower in ("visual", "text"):
            t = dict(out[tower])
            t["blocks"] = prepare_blocks(t["blocks"], fused=fused, tp=tp)
            out[tower] = t
        return out

    def embed_image(self, backbone, images, normalize=None):
        """Frozen ViT stem only (vit.embed_image): (B,H,W,3) ->
        (B, 1+N, width) tokens. Lets windowed callers batch the stem
        across K staged batches outside the per-step scan.
        ``normalize=(mean,std)`` folds uint8→CLIP normalization into
        the patch-embed matmul."""
        return vit_mod.embed_image(
            backbone["visual"], images,
            patch_size=self.clip_cfg.vision_patch_size,
            normalize=normalize)

    def encode_image(self, backbone, prompt_params, images, rng=None,
                     vpt_shallow=None, vpt_deep=None, pre_embedded=False):
        vpt_shallow, vpt_deep = vpt_prepare(
            prompt_params, self.spec, vpt_shallow, vpt_deep, rng)
        if vpt_shallow is not None:
            vpt_shallow = vpt_shallow.astype(self.compute_dtype)
        if vpt_deep is not None:
            vpt_deep = vpt_deep.astype(self.compute_dtype)
        return vit_mod.encode_image(
            backbone["visual"],
            images,
            patch_size=self.clip_cfg.vision_patch_size,
            n_heads=self.clip_cfg.vision_heads,
            vpt_shallow=vpt_shallow,
            vpt_deep=vpt_deep,
            remat=self.remat,
            attn_fn=self.attn_fn,
            pre_embedded=pre_embedded,
        )

    def encode_text_prompts(self, backbone, prompts, eot_idx):
        # The fused-block marker passes through; the packed text encoder
        # decides per-shape whether the kernels pay off (core/text.py).
        return text_mod.encode_text_embeds_packed(
            backbone["text"],
            prompts.astype(self.compute_dtype),
            eot_idx,
            n_heads=self.clip_cfg.transformer_heads,
            remat=self.remat,
            attn_fn=self.attn_fn,
        )

    def compute_text_features(self, backbone: dict, prompt_params: dict,
                              consts: PromptConsts) -> jax.Array:
        """(n_cls, embed_dim) text features for the current prompts.

        Only valid for non-CoCoOp specs (CoCoOp conditions prompts on
        the image). During evaluation the prompt parameters are frozen,
        so these are constant across every eval batch — trainer.test()
        computes them once per call instead of re-running the 12-layer
        text tower per batch (the reference recomputes per batch,
        mvlpt.py:540-582; caching is free parity: identical values)."""
        if self.spec.has_cocoop:
            raise ValueError("CoCoOp text features are image-conditioned")
        coop_ctx, _, _ = upt_couple(prompt_params, self.spec)
        prompts = coop_assemble(coop_ctx, consts, self.spec)
        return self.encode_text_prompts(backbone, prompts, consts.eot_idx)

    def forward_with_text(
        self,
        backbone: dict,
        prompt_params: dict,
        images: jax.Array,
        text_features: jax.Array,
        tasks: jax.Array | None = None,
        task_ranges: TaskClassRanges | None = None,
        pre_embedded: bool = False,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        """Forward with precomputed text features.

        Two callers: the eval fast path (rng=None), and the TRAINING
        fast path for text-static specs (pure VPT: no CoOp ctx, no
        CoCoOp, no coupler — the text tower output does not depend on
        any trained parameter, so the train step hoists it out of the
        windowed scan; ``rng`` keeps VPT dropout live there)."""
        _, vpt_sh, vpt_dp = upt_couple(prompt_params, self.spec)
        image_features = self.encode_image(
            backbone, prompt_params, images, rng, vpt_sh, vpt_dp,
            pre_embedded=pre_embedded)
        logits = clip_core.clip_logits(
            image_features, text_features, backbone["logit_scale"])
        return _apply_task_mask(logits, tasks, task_ranges)

    def __call__(
        self,
        backbone: dict,
        prompt_params: dict,
        consts: PromptConsts,
        images: jax.Array,
        tasks: jax.Array | None = None,
        task_ranges: TaskClassRanges | None = None,
        rng: jax.Array | None = None,
        pre_embedded: bool = False,
    ) -> jax.Array:
        """Full forward -> (B, n_cls) fp32 logits (mvlpt.py:540-582).

        ``pre_embedded``: ``images`` is the (B, 1+N, width) output of
        :meth:`embed_image` rather than raw NHWC pixels."""
        spec = self.spec
        coop_ctx, vpt_sh, vpt_dp = upt_couple(prompt_params, spec)

        image_features = self.encode_image(
            backbone, prompt_params, images, rng, vpt_sh, vpt_dp,
            pre_embedded=pre_embedded)

        if not spec.has_cocoop:
            prompts = coop_assemble(coop_ctx, consts, spec)
            text_features = self.encode_text_prompts(
                backbone, prompts, consts.eot_idx)
            logits = clip_core.clip_logits(
                image_features, text_features, backbone["logit_scale"])
        else:
            # CoCoOp: instance-conditioned prompts. The reference loops
            # over the batch, one full text tower per image
            # (mvlpt.py:563-570). TPU-first shape: pack `chunk` instances'
            # (n_cls, S) prompt grids into ONE (chunk*n_cls, S) text-tower
            # call so the MXU sees large batched matmuls, and lax.scan
            # over the B/chunk chunks to bound live activation memory.
            img32 = image_features.astype(jnp.float32)
            img_n = img32 / jnp.linalg.norm(img32, axis=-1, keepdims=True)
            ctx_shifted = cocoop_condition(prompt_params, spec, img_n)  # (B,n,Wt)
            b, n_cls = ctx_shifted.shape[0], spec.n_cls
            chunk = self.cocoop_chunk or _auto_chunk(b, n_cls)

            def per_chunk(ctx_c):  # (chunk, n_ctx, Wt)
                prompts = jax.vmap(
                    lambda c: coop_assemble(c, consts, spec))(ctx_c)
                prompts = prompts.reshape(chunk * n_cls, *prompts.shape[2:])
                eot = jnp.tile(consts.eot_idx, chunk)
                tf = self.encode_text_prompts(backbone, prompts, eot)
                tf = tf.astype(jnp.float32)
                tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
                return tf.reshape(chunk, n_cls, -1)

            # lax.map + autodiff stores EVERY chunk's tower residuals:
            # ~(B*n_cls * S * 4W * L) bytes — 19 GB at B=32, 1000
            # classes (HBM OOM; ~1.9 GB at 100 classes). Past ~8k
            # conditioned rows remat the chunk tower: the backward
            # recomputes it instead of storing activations (classic
            # memory/FLOPs trade; reference analogue:
            # checkpoint_sequential, mvlpt.py:119).
            if b * n_cls > 8192 or self.remat:
                per_chunk = jax.checkpoint(per_chunk, prevent_cse=False)

            text_features = jax.lax.map(
                per_chunk, ctx_shifted.reshape(b // chunk, chunk,
                                               *ctx_shifted.shape[1:]))
            text_features = text_features.reshape(b, n_cls, -1)
            scale = jnp.exp(backbone["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.einsum("be,bce->bc", img_n, text_features)

        return _apply_task_mask(logits, tasks, task_ranges)


def _apply_task_mask(logits, tasks, task_ranges):
    """Zero logits outside each row's task class range
    (multiply, as mvlpt.py:579-581)."""
    if tasks is None or task_ranges is None:
        return logits
    cls_idx = jnp.arange(logits.shape[-1])[None, :]
    lo = task_ranges.start[tasks][:, None]
    hi = task_ranges.end[tasks][:, None]
    select = ((cls_idx >= lo) & (cls_idx < hi)).astype(logits.dtype)
    return logits * select
