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


def make_train_step(
    model: MVLPTModel,
    tx: optax.GradientTransformation,
    task_ranges: TaskClassRanges | None = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    step(state, backbone, consts, batch, rng) -> (state, metrics)
    batch = {"image": (B,H,W,3) fp32, "label": (B,) int or (B,C), and
    optionally "task": (B,) int}.
    """

    def loss_fn(prompt_params, backbone, consts, batch, rng):
        logits = model(
            backbone, prompt_params, consts, batch["image"],
            tasks=batch.get("task"), task_ranges=task_ranges, rng=rng)
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
) -> Callable:
    """Multi-step-per-dispatch train step: one compiled program runs a
    ``lax.scan`` over K pre-staged batches (leading axis K on every
    batch array).

    step(state, backbone, consts, batches, rng) ->
        (state, metrics stacked over K).

    Use when dispatch is the bottleneck (very fast steps, multi-host
    orchestration). Measured on the single v5e here: no gain over the
    single-step path (~1117 vs ~1110 img/s) because dispatches already
    pipeline asynchronously; provided for input pipelines that stage
    batches ahead (e.g. grain/tf.data windows).
    """

    def loss_fn(prompt_params, backbone, consts, batch, rng):
        logits = model(
            backbone, prompt_params, consts, batch["image"],
            tasks=batch.get("task"), task_ranges=task_ranges, rng=rng)
        return soft_cross_entropy(logits, batch["label"]), logits

    def multi_fn(state: TrainState, backbone, consts, batches, rng):
        def body(state, xs):
            batch, i = xs
            step_rng = jax.random.fold_in(rng, i)
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.prompt_params, backbone, consts, batch, step_rng)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.prompt_params)
            prompt_params = optax.apply_updates(state.prompt_params, updates)
            metrics = {"loss": loss, "acc": accuracy(logits, batch["label"])}
            return TrainState(prompt_params, opt_state, state.step + 1), metrics

        k = jax.tree_util.tree_leaves(batches)[0].shape[0]
        return jax.lax.scan(body, state, (batches, jnp.arange(k)))

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_fn, donate_argnums=donate_argnums)


def make_eval_step(model: MVLPTModel, task_ranges: TaskClassRanges | None = None):
    """eval_step(backbone, prompt_params, consts, batch) -> fp32 logits."""

    @jax.jit
    def eval_fn(backbone, prompt_params, consts, batch):
        return model(
            backbone, prompt_params, consts, batch["image"],
            tasks=batch.get("task"), task_ranges=task_ranges, rng=None)

    return eval_fn


def shard_batch(batch, mesh):
    return pmesh.shard_tree(batch, pmesh.batch_specs(batch), mesh)
