"""Optimizer + LR schedule factory (optax).

Reproduces the Dassl optimizer semantics the reference trains with
(configs/trainers/MVLPT/vit_b16.yaml:16-22 and Dassl's
build_optimizer/build_lr_scheduler used at mvlpt.py:869-871):

  * SGD (momentum, coupled weight decay, optional nesterov), plus
    adam/adamw/rmsprop for the ELEVATER finetune surface
    (vision_benchmark/optim/build.py:88-170).
  * Schedules step PER EPOCH (Dassl calls update_lr at the last batch
    of each epoch, mvlpt.py:948-949): cosine annealing over MAX_EPOCH,
    single/multi-step decay, with an optional constant or linear
    warmup for the first WARMUP_EPOCH epochs.
"""

from __future__ import annotations

import math

import optax


def build_lr_schedule(ocfg, steps_per_epoch: int):
    """Return lr(step) implementing Dassl's per-epoch schedule."""
    base_lr = float(ocfg.LR)
    max_epoch = int(ocfg.MAX_EPOCH)
    name = ocfg.LR_SCHEDULER
    warmup_epoch = int(ocfg.WARMUP_EPOCH)
    # Dassl's WARMUP_RECOUNT: the wrapped torch scheduler is not stepped
    # during warmup and (when True, the default) restarts its epoch count
    # at the end of warmup, so epoch e >= W trains at schedule(e - W).
    # With False the count includes the warmup epochs: schedule(e).
    recount = bool(getattr(ocfg, "WARMUP_RECOUNT", True)) and warmup_epoch > 0

    def epoch_lr(epoch: float) -> float:
        if recount:
            epoch = max(0, epoch - warmup_epoch)
        if name == "cosine":
            return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max_epoch))
        if name == "single_step":
            step_size = ocfg.STEPSIZE[0] if ocfg.STEPSIZE[0] > 0 else max_epoch
            return base_lr * (ocfg.GAMMA ** (epoch // step_size))
        if name == "multi_step":
            n = sum(1 for s in ocfg.STEPSIZE if epoch >= s)
            return base_lr * (ocfg.GAMMA ** n)
        if name == "constant":
            return base_lr
        raise ValueError(f"unknown LR_SCHEDULER {name!r}")

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // steps_per_epoch
        # Table of per-epoch lrs, looked up on device (static length).
        lrs = []
        for e in range(max_epoch + 1):
            if e < warmup_epoch:
                if ocfg.WARMUP_TYPE == "constant":
                    lrs.append(float(ocfg.WARMUP_CONS_LR))
                else:  # linear
                    lo = float(ocfg.WARMUP_MIN_LR)
                    lrs.append(lo + (base_lr - lo) * e / max(1, warmup_epoch))
            else:
                lrs.append(epoch_lr(e))
        table = jnp.asarray(lrs)
        return table[jnp.clip(epoch, 0, max_epoch)]

    return schedule


def _trace_with_dampening(momentum: float, damp: float):
    """torch SGD momentum with dampening: buf_0 = g_0 (torch skips
    dampening on the very first accumulation), then
    buf_t = momentum * buf_{t-1} + (1 - damp) * g_t; update = buf."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"count": jnp.zeros([], jnp.int32),
                "trace": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        first = state["count"] == 0
        scale = jnp.where(first, 1.0, 1.0 - damp)

        def f(g, t):
            return momentum * t + scale.astype(g.dtype) * g

        new_trace = jax.tree_util.tree_map(f, updates, state["trace"])
        return new_trace, {"count": state["count"] + 1, "trace": new_trace}

    return optax.GradientTransformation(init, update)


def build_optimizer(ocfg, steps_per_epoch: int):
    """(optax.GradientTransformation, schedule) from an OPTIM config."""
    schedule = build_lr_schedule(ocfg, steps_per_epoch)
    name = ocfg.NAME.lower()
    wd = float(ocfg.WEIGHT_DECAY)

    if name == "sgd":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        damp = float(getattr(ocfg, "SGD_DAMPNING", 0.0))
        if damp:
            if bool(ocfg.SGD_NESTEROV):
                raise ValueError(
                    "SGD_DAMPNING > 0 with nesterov is invalid (torch "
                    "raises too)")
            parts.append(_trace_with_dampening(float(ocfg.MOMENTUM), damp))
        else:
            parts.append(optax.trace(
                decay=float(ocfg.MOMENTUM), nesterov=bool(ocfg.SGD_NESTEROV)))
        parts.append(optax.scale_by_learning_rate(schedule))
        tx = optax.chain(*parts)
    elif name == "adam":
        tx = optax.chain(
            optax.scale_by_adam(b1=ocfg.ADAM_BETA1, b2=ocfg.ADAM_BETA2),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    elif name == "adamw":
        tx = optax.adamw(
            schedule, b1=ocfg.ADAM_BETA1, b2=ocfg.ADAM_BETA2, weight_decay=wd)
    elif name == "rmsprop":
        tx = optax.chain(
            optax.scale_by_rms(decay=float(ocfg.RMSPROP_ALPHA)),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return tx, schedule
