"""Production-dtype TRAINING drift bound (round-4 verdict item 2).

tests/test_bf16_drift.py bounds forward-only logit drift; accuracy
parity on a real run hinges on the *trajectory*: how far N SGD steps of
the production path (bf16 compute + fused kernels + windowed dispatch)
land from the fp32 XLA reference path on identical data. This script
measures exactly that, with the fp32 path's own sensitivity to a benign
perturbation — a different same-distribution data stream — as the
yardstick (the reference trains fp16-autocast on GPU,
/root/reference/trainers/mvlpt.py:928-932, so bit-parity was never the
contract; staying far inside the data-stream spread is).

Four trajectories from ONE prompt init on identical-shape streams:
  A. fp32 XLA single-step (the parity-test semantics), data stream S0
  B. production: bf16 + fused kernels + windowed scan, SAME stream S0
  C. fp32 XLA single-step, fresh stream S1  -> the yardstick spread
  D. bf16 XLA windowed, stream S0           -> isolates the kernels
                                               (B-D) from the dtype (A-D)

Reported (one JSON line):
  loss_mae_dtype  = mean_t |loss_B(t) - loss_A(t)|
  loss_mae_seed   = mean_t |loss_C(t) - loss_A(t)|
  param_dist_*    = global L2 distance between final prompt pytrees
  *_ratio         = dtype distance / seed-spread distance  (<1 means the
                    production path sits inside benign-perturbation noise)

Usage:
    # CI analogue (tiny towers, CPU, fused kernels in interpret mode):
    python scripts/bf16_drift_train.py --backbone tiny --steps 24
    # the real measurement (one v5e chip, flagship ViT-B/16 UPT):
    python scripts/bf16_drift_train.py --backbone b16 --steps 120
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _stream(seed: int, steps: int, batch: int, res: int, n_cls: int,
            unique: int | None = None):
    """Identically-distributed uint8 pixel + label stream.

    ``unique`` < steps stages only U distinct pixel batches and cycles
    them (labels stay fresh per step) — the bench.py staging trick for
    this environment's ~20 MB/s H2D tunnel, where uploading 120 fresh
    224^2 batches per trajectory would take ~30 min. Both compared
    trajectories see the SAME stream either way, which is the only
    thing the drift measurement needs."""
    unique = unique or steps
    rng = np.random.RandomState(seed)
    return {
        # only the U unique pixel batches are materialized/uploaded;
        # runners cycle them device-side (step t reads image[t % U])
        "image": rng.randint(0, 256, (unique, batch, res, res, 3)
                             ).astype(np.uint8),
        "label": rng.randint(0, n_cls, (steps, batch)).astype(np.int32),
    }


def _build(backbone: str, compute_dtype, kernels: bool, n_cls: int,
           batch: int):
    """(model, backbone_params, prompt_params, consts, res). The tiny
    config mirrors dryrun_multichip's rehearsal towers; b16 is the
    flagship bench config."""
    import __graft_entry__ as ge

    if backbone == "tiny":
        model, bb, pp, consts, clip_cfg = ge._tiny_flagship(
            n_cls=n_cls, compute_dtype=compute_dtype)
    else:
        model, bb, pp, consts, _, clip_cfg = ge._flagship(
            n_cls=n_cls, batch=batch, compute_dtype=compute_dtype,
            backbone_name="ViT-B/16")
    if kernels:
        if backbone == "tiny":
            # CPU analogue: fused kernels run in interpret mode
            from mvlpt_tpu.ops.block import _FusedMarker

            model = dataclasses.replace(model, attn_fn=_FusedMarker())
        # b16: _flagship already selected the Pallas kernels via
        # select_attn_fn("auto") — the production path as shipped.
    else:
        model = dataclasses.replace(model, attn_fn=None)  # pure XLA
    return model, bb, pp, consts, clip_cfg.image_resolution


def _run_single(model, bb, pp, consts, stream, lr_steps):
    """fp32-reference semantics: one jitted step per batch."""
    import jax

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step

    import jax.numpy as jnp

    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=lr_steps)
    state = init_train_state(pp, tx)
    step = make_train_step(model, tx, donate=False,
                           normalize=(CLIP_MEAN, CLIP_STD))
    imgs = jnp.asarray(stream["image"])    # (U, B, ...) uploaded once
    labels = jnp.asarray(stream["label"])  # (steps, B)
    u = imgs.shape[0]
    losses = []
    for i in range(labels.shape[0]):
        batch = {"image": imgs[i % u], "label": labels[i]}
        state, m = step(state, bb, consts, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    return np.asarray(losses), jax.device_get(state.prompt_params)


def _run_windowed(model, bb, pp, consts, stream, lr_steps, window):
    """Production semantics: W-step scan per dispatch, stem pre-embed,
    normalization folded into the patch embed."""
    import jax

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import (
        init_train_state, make_train_step_multi)

    import jax.numpy as jnp

    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=lr_steps)
    state = init_train_state(pp, tx)
    step = make_train_step_multi(model, tx, donate=False, pre_embed=True,
                                 normalize=(CLIP_MEAN, CLIP_STD))
    imgs = jnp.asarray(stream["image"])  # (U, B, ...) uploaded once
    labels = jnp.asarray(stream["label"])
    u = imgs.shape[0]
    n = labels.shape[0]
    assert n % window == 0, (n, window)
    # step t must read image[t % U] exactly like the single-step runner
    # -> every window must start phase-aligned on the U-cycle
    assert u == n or window % u == 0, (window, u, n)
    if u != n:  # cycled stream: the same device-tiled window each time
        win_imgs = jnp.tile(imgs, (window // u, 1, 1, 1, 1))
    losses = []
    for i in range(0, n, window):
        imgs_i = imgs[i:i + window] if u == n else win_imgs
        win = {"image": imgs_i, "label": labels[i:i + window]}
        state, ms = step(state, bb, consts, win, jax.random.PRNGKey(i))
        losses.extend(np.asarray(ms["loss"]).tolist())
    return np.asarray(losses), jax.device_get(state.prompt_params)


def _dist(a, b) -> float:
    """Global L2 distance between two prompt pytrees (fp64 accumulate)."""
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return float(np.sqrt(sum(
        np.sum((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2)
        for x, y in zip(leaves_a, leaves_b))))


def measure(backbone: str = "tiny", steps: int = 24, window: int = 4,
            batch: int = 8, n_cls: int = 8,
            unique: int | None = None) -> dict:
    import jax.numpy as jnp

    model32, bb32, pp, consts32, res = _build(
        backbone, jnp.float32, kernels=False, n_cls=n_cls, batch=batch)
    prod_dtype = jnp.bfloat16
    modelP, bbP, _, constsP, _ = _build(
        backbone, prod_dtype, kernels=True, n_cls=n_cls, batch=batch)
    modelD = dataclasses.replace(modelP, attn_fn=None)  # dtype, no kernels

    s0 = _stream(0, steps, batch, res, n_cls, unique=unique)
    s1 = _stream(1000, steps, batch, res, n_cls, unique=unique)

    import time as _t

    def _timed(tag, fn, *a):
        t0 = _t.time()
        out = fn(*a)
        print(f"[drift] {tag}: {_t.time() - t0:.1f}s "
              f"(final loss {out[0][-1]:.4f})", flush=True)
        return out

    loss_a, p_a = _timed("A fp32-xla-single  s0",
                         _run_single, model32, bb32, pp, consts32, s0, steps)
    loss_b, p_b = _timed("B prod-windowed    s0", _run_windowed,
                         modelP, bbP, pp, constsP, s0, steps, window)
    loss_c, p_c = _timed("C fp32-xla-single  s1",
                         _run_single, model32, bb32, pp, consts32, s1, steps)
    loss_d, p_d = _timed("D bf16-xla-window  s0", _run_windowed,
                         modelD, bbP, pp, constsP, s0, steps, window)

    d_dtype = _dist(p_a, p_b)
    d_seed = _dist(p_a, p_c)
    d_kern = _dist(p_b, p_d)
    out = {
        "metric": "production-path training drift vs fp32 reference",
        "backbone": backbone, "n_steps": steps, "window": window,
        "batch": batch, "n_cls": n_cls,
        "prod_dtype": str(prod_dtype.__name__ if hasattr(prod_dtype,
                          "__name__") else prod_dtype),
        "loss_mae_dtype": float(np.mean(np.abs(loss_b - loss_a))),
        "loss_mae_seed": float(np.mean(np.abs(loss_c - loss_a))),
        "final_loss_fp32": float(loss_a[-1]),
        "final_loss_prod": float(loss_b[-1]),
        "param_dist_dtype": d_dtype,
        "param_dist_seed": d_seed,
        "param_dist_kernels_only": d_kern,
        "param_ratio": d_dtype / d_seed if d_seed else float("inf"),
        "loss_ratio": (float(np.mean(np.abs(loss_b - loss_a)))
                       / max(float(np.mean(np.abs(loss_c - loss_a))),
                             1e-12)),
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", choices=("tiny", "b16"), default="tiny")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--window", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--n-cls", type=int, default=None)
    p.add_argument("--unique", type=int, default=None,
                   help="stage only U distinct pixel batches (tunnel "
                        "H2D relief; must divide --window)")
    args = p.parse_args()

    import jax

    if args.backbone == "tiny":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    tiny = args.backbone == "tiny"
    steps = args.steps or (24 if tiny else 120)
    window = args.window or (4 if tiny else 60)
    batch = args.batch or (8 if tiny else 32)
    n_cls = args.n_cls or (8 if tiny else 100)
    unique = args.unique if args.unique else (None if tiny else 6)
    out = measure(args.backbone, steps, window, batch, n_cls, unique)
    print(json.dumps(out))
    if out["param_ratio"] >= 1.0:
        raise SystemExit(
            f"production trajectory drifted OUTSIDE the data-stream "
            f"spread: param_ratio={out['param_ratio']:.3f}")


if __name__ == "__main__":
    main()
