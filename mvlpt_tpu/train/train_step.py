"""Jitted SPMD train / eval steps.

One compiled program per run replaces the reference's per-batch Python
(forward_backward, mvlpt.py:910-951): forward both towers, soft-label
cross-entropy, backward through the prompt params ONLY (the backbone is
a non-differentiated argument), optimizer update — with the gradient
all-reduce over the "data" mesh axis inserted by XLA.

Matching details:
  * multi-label targets are normalized to distributions
    (mvlpt.py:914-916); CE over logits in fp32.
  * accuracy reported against argmax of (possibly soft) labels
    (mvlpt.py:936-938).
  * donated prompt/optimizer buffers keep HBM flat.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from mvlpt_tpu.models.custom_clip import MVLPTModel, TaskClassRanges
from mvlpt_tpu.parallel import mesh as pmesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    prompt_params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(prompt_params, tx) -> TrainState:
    return TrainState(
        prompt_params=prompt_params,
        opt_state=tx.init(prompt_params),
        step=jnp.zeros((), jnp.int32),
    )


def soft_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE with int labels (B,) or multi-label k-hot / soft labels (B, C)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == 1:
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    else:
        soft = labels.astype(jnp.float32)
        soft = soft / jnp.clip(soft.sum(-1, keepdims=True), 1e-8)
        nll = -(soft * logp).sum(-1)
    return nll.mean()


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    want = labels if labels.ndim == 1 else jnp.argmax(labels, axis=-1)
    return (pred == want).astype(jnp.float32).mean()


def _prep_images(model, backbone, images, normalize):
    """(images_or_tokens, pre_embedded): uint8 batches are embedded
    through the frozen stem with CLIP normalization folded into the
    patch-embed matmul (vit.embed_image); float batches pass through."""
    if normalize is not None and images.dtype == jnp.uint8:
        return model.embed_image(backbone, images, normalize=normalize), True
    return images, False


def make_train_step(
    model: MVLPTModel,
    tx: optax.GradientTransformation,
    task_ranges: TaskClassRanges | None = None,
    donate: bool = True,
    normalize: tuple | None = None,
) -> Callable:
    """Build the jitted train step.

    step(state, backbone, consts, batch, rng) -> (state, metrics)
    batch = {"image": (B,H,W,3) fp32 (or uint8 with ``normalize``),
    "label": (B,) int or (B,C), and optionally "task": (B,) int}.
    """

    def loss_fn(prompt_params, backbone, consts, batch, rng):
        imgs, pre = _prep_images(model, backbone, batch["image"], normalize)
        logits = model(
            backbone, prompt_params, consts, imgs,
            tasks=batch.get("task"), task_ranges=task_ranges, rng=rng,
            pre_embedded=pre)
        loss = soft_cross_entropy(logits, batch["label"])
        return loss, (logits,)

    def step_fn(state: TrainState, backbone, consts, batch, rng):
        (loss, (logits,)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.prompt_params, backbone, consts, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.prompt_params)
        prompt_params = optax.apply_updates(state.prompt_params, updates)
        new_state = TrainState(prompt_params, opt_state, state.step + 1)
        metrics = {
            "loss": loss,
            "acc": accuracy(logits, batch["label"]),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    # Sharding note: under a mesh the step needs no explicit
    # in_shardings — callers place the backbone/batch with
    # parallel.shard_tree and GSPMD propagates from the inputs
    # (validated by tests/test_train_step.py::test_spmd_step_on_8_device_mesh).
    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_train_step_multi(
    model: MVLPTModel,
    tx: optax.GradientTransformation,
    task_ranges: TaskClassRanges | None = None,
    donate: bool = True,
    pre_embed: bool = False,
    normalize: tuple | None = None,
) -> Callable:
    """Multi-step-per-dispatch train step: one compiled program runs a
    ``lax.scan`` over K pre-staged batches (leading axis K on every
    batch array).

    step(state, backbone, consts, batches, rng) ->
        (state, metrics stacked over K).

    Amortizes this environment's fixed per-execution dispatch overhead
    (~1.4 ms on the tunneled v5e) over K steps; feed it from input
    pipelines that stage batches ahead (the trainer's windowed mode).

    ``pre_embed``: run the frozen ViT stem for ALL K batches in one
    batched call BEFORE the scan (one (K*B, N, P²C) patch-embed matmul
    instead of K smaller ones inside the scan body — and XLA can no
    longer be tricked into re-running stem work per step). No gradient
    flows through the stem (frozen backbone), so training math is
    unchanged.

    ``normalize=(mean, std)``: batches carry RAW uint8 pixels; CLIP
    normalization happens on device. With ``pre_embed`` it is folded
    algebraically into the patch-embed matmul (vit.embed_image) — uint8
    staging halves H2D bytes vs bf16 and the normalize costs nothing.
    """

    def loss_fn(prompt_params, backbone, consts, batch, rng,
                text_features=None):
        if text_features is not None:
            logits = model.forward_with_text(
                backbone, prompt_params, batch["image"], text_features,
                tasks=batch.get("task"), task_ranges=task_ranges,
                pre_embedded=pre_embed, rng=rng)
        else:
            logits = model(
                backbone, prompt_params, consts, batch["image"],
                tasks=batch.get("task"), task_ranges=task_ranges, rng=rng,
                pre_embedded=pre_embed)
        return soft_cross_entropy(logits, batch["label"]), logits

    def multi_fn(state: TrainState, backbone, consts, batches, rng):
        # hoist loop-invariant weight prep (layer slicing + kernel
        # transposes) out of the K-step scan — measured ~0.56 ms/step
        # of unhoisted re-slicing otherwise (v5e xplane)
        backbone = model.prepare_backbone(backbone)
        # pure-VPT specs: the text tower output depends on no trained
        # parameter (PromptSpec.text_is_static), so run the 12-layer
        # text tower ONCE per dispatch instead of every scan step —
        # exact math (d text / d params = 0). Measured perf-neutral on
        # v5e (16.37 ms/step either way, MVPT B/16 100-cls): with zero
        # carry dependence XLA's loop-invariant code motion already
        # hoists it (unlike the weight-prep case above, which it does
        # NOT hoist) — kept explicit so the guarantee doesn't ride on
        # LICM, mirroring the eval fast path (make_cached_text_eval).
        text_features = (
            model.compute_text_features(backbone, state.prompt_params, consts)
            if model.spec.text_is_static else None)
        imgs = batches["image"]
        if pre_embed:
            norm = normalize if imgs.dtype == jnp.uint8 else None
            # vmap over the window axis (not reshape K*B): keeps the
            # (None, "data") sharding of staged windows intact under a
            # mesh — XLA still emits one batched stem contraction
            imgs = jax.vmap(
                lambda im: model.embed_image(backbone, im, normalize=norm)
            )(imgs)
        elif normalize is not None and imgs.dtype == jnp.uint8:
            mean, std = (jnp.asarray(v, jnp.float32) for v in normalize)
            imgs = ((imgs.astype(jnp.float32) / 255.0 - mean) / std
                    ).astype(model.compute_dtype)
        batches = dict(batches, image=imgs)

        def body(state, xs):
            batch, i = xs
            step_rng = jax.random.fold_in(rng, i)
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.prompt_params, backbone, consts, batch, step_rng,
                text_features)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.prompt_params)
            prompt_params = optax.apply_updates(state.prompt_params, updates)
            metrics = {
                "loss": loss,
                "acc": accuracy(logits, batch["label"]),
                "grad_norm": optax.global_norm(grads),
            }
            return TrainState(prompt_params, opt_state, state.step + 1), metrics

        k = jax.tree_util.tree_leaves(batches)[0].shape[0]
        return jax.lax.scan(body, state, (batches, jnp.arange(k)))

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_fn, donate_argnums=donate_argnums)


def _inference_model(model: MVLPTModel) -> MVLPTModel:
    """Swap the model's fused-block marker for its inference variant:
    same kernel math, but none of the backward residuals (qkv^T, probs,
    hpre, LN stats — ~3.3 MB/image/layer at B/16) are written to HBM.
    Exact no-op for XLA / standalone-attention / non-marker attn_fns."""
    mk = getattr(model.attn_fn, "as_inference", None)
    if mk is None or getattr(model.attn_fn, "inference", False):
        return model
    return dataclasses.replace(model, attn_fn=mk())


def make_eval_step(model: MVLPTModel, task_ranges: TaskClassRanges | None = None,
                   normalize: tuple | None = None):
    """eval_step(backbone, prompt_params, consts, batch) -> fp32 logits.

    No gradient ever flows at eval, so the fused-block kernels run
    their inference variants (_inference_model): identical values,
    no backward-residual HBM writes."""
    model = _inference_model(model)

    @jax.jit
    def eval_fn(backbone, prompt_params, consts, batch):
        imgs, pre = _prep_images(model, backbone, batch["image"], normalize)
        return model(
            backbone, prompt_params, consts, imgs,
            tasks=batch.get("task"), task_ranges=task_ranges, rng=None,
            pre_embedded=pre)

    return eval_fn


def make_cached_text_eval(model: MVLPTModel,
                          task_ranges: TaskClassRanges | None = None,
                          normalize: tuple | None = None):
    """(text_fn, eval_fn) for the cached-text eval fast path.

    During evaluation the learned prompts are frozen, so the text tower
    output is constant across batches; ``text_fn`` computes it once per
    trainer.test() call and ``eval_fn`` runs only the image tower +
    logits per batch (identical values to make_eval_step — the text
    recompute the reference pays per batch, mvlpt.py:540-582, is pure
    waste at eval). Not applicable to CoCoOp (image-conditioned text):
    returns (None, None) so callers fall back to make_eval_step.

    Both fns run the fused kernels' inference variants
    (_inference_model): no gradient flows at eval, so the backward-
    residual HBM writes are pure waste — skipping them measured
    3783 -> 3817 img/s (~1%, interleaved A/B x3, v5e batch 100; see
    BASELINE.md round-4 eval entry)."""
    if model.spec.has_cocoop:
        return None, None
    model = _inference_model(model)

    @jax.jit
    def text_fn(backbone, prompt_params, consts):
        return model.compute_text_features(backbone, prompt_params, consts)

    @jax.jit
    def eval_fn(backbone, prompt_params, text_features, batch):
        imgs, pre = _prep_images(model, backbone, batch["image"], normalize)
        return model.forward_with_text(
            backbone, prompt_params, imgs, text_features,
            tasks=batch.get("task"), task_ranges=task_ranges,
            pre_embedded=pre)

    return text_fn, eval_fn


def shard_batch(batch, mesh):
    return pmesh.shard_tree(batch, pmesh.batch_specs(batch), mesh)
