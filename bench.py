"""Headline benchmark: prompt-tune throughput, images/sec/chip.

Config matches the reference comparison point (BASELINE.md): ViT-B/16,
UPT prompts (CoOp n_ctx=4 'middle' + deep VPT n_ctx=4 + transformer
coupler, MVLPT.md:49-53), batch 32 (vit_b16.yaml:3), 100-class text
tower with CUT_CONTEXTLEN, full forward-backward + SGD update per step.

The reference never measured throughput (SURVEY.md §6); BASELINE.json
sets the target at >=5x A100-PyTorch per-chip. ``vs_baseline`` is
reported against A100_PYTORCH_EST_IMG_S — an estimate of the reference
PyTorch fp16 pipeline on one A100 for this exact config (documented in
BASELINE.md; no GPU exists in this environment to measure it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

A100_PYTORCH_EST_IMG_S = 340.0  # see BASELINE.md "Throughput baseline"
BATCH = 32
N_CLS = 100
STEPS = 30


def main():
    import jax

    from __graft_entry__ import _flagship
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step

    model, backbone, prompt_params, consts, images, _ = _flagship(
        n_cls=N_CLS, batch=BATCH)
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.002
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 200
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=100)
    state = init_train_state(prompt_params, tx)
    step = make_train_step(model, tx)

    import numpy as np

    labels = jax.numpy.asarray(
        np.random.RandomState(0).randint(0, N_CLS, BATCH))
    batch = {"image": images, "label": labels}

    def sync(x):
        # On the axon remote platform block_until_ready does not actually
        # wait; materializing the scalar is the only reliable fence.
        return float(jax.device_get(x))

    rng = jax.random.PRNGKey(0)
    # pre-split the per-step keys: a fold_in dispatched inside the loop
    # adds a host->device round-trip per step (the input pipeline
    # prefetches ahead in real training, so keys are never on the
    # critical path there either)
    keys = list(jax.random.split(rng, STEPS + 3))
    state, m = step(state, backbone, consts, batch, rng)  # compile
    sync(m["loss"])
    # warm
    for i in range(3):
        state, m = step(state, backbone, consts, batch, keys[STEPS + i])
    sync(m["loss"])

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, backbone, consts, batch, keys[i])
    sync(m["loss"])  # fences the whole chain (steps depend sequentially)
    dt = time.perf_counter() - t0

    img_s = STEPS * BATCH / dt
    print(json.dumps({
        "metric": "prompt-tune images/sec/chip (ViT-B/16 UPT, batch 32, 100-cls)",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_PYTORCH_EST_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
