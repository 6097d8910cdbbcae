"""Headline benchmark: prompt-tune throughput, images/sec/chip.

Config matches the reference comparison point (BASELINE.md): ViT-B/16,
UPT prompts (CoOp n_ctx=4 'middle' + deep VPT n_ctx=4 + transformer
coupler, MVLPT.md:49-53), batch 32 (vit_b16.yaml:3), 100-class text
tower with CUT_CONTEXTLEN, full forward-backward + SGD update per step.

Measures the trainer's windowed-dispatch mode
(TRAIN.STEPS_PER_DISPATCH / make_train_step_multi): K distinct staged
batches run through one jitted lax.scan per dispatch, exactly as
train/trainer.py:_run_epoch_windowed feeds real data. On this
environment's tunneled TPU each separate execution pays ~1.4 ms of
fixed service overhead (measured: async dispatch loop 1.0 ms/step host
side vs 20.1 ms/step wall; device-side step is 18.6 ms) — windowing is
the production answer, not a benchmark trick.

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
WINDOW = 15     # steps per dispatch (TRAIN.STEPS_PER_DISPATCH)
ROUNDS = 2      # timed dispatches -> WINDOW * ROUNDS measured steps


def main():
    import jax

    from __graft_entry__ import _flagship
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import (
        init_train_state, make_train_step_multi)

    model, backbone, prompt_params, consts, _images, _ = _flagship(
        n_cls=N_CLS, batch=BATCH)
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.002
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 200
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=100)
    state = init_train_state(prompt_params, tx)
    step = make_train_step_multi(model, tx)

    import jax.numpy as jnp
    import numpy as np

    rng_np = np.random.RandomState(0)
    # distinct batches, staged in the model's compute dtype (the
    # trainer's windowed path stages the same way)
    batches = {
        "image": jnp.asarray(
            rng_np.randn(WINDOW, BATCH, 224, 224, 3),
            model.compute_dtype),
        "label": jnp.asarray(
            rng_np.randint(0, N_CLS, (WINDOW, BATCH)), jnp.int32),
    }

    def sync(x):
        # On the axon remote platform block_until_ready does not actually
        # wait; materializing the scalar is the only reliable fence.
        return float(jax.device_get(x))

    key = jax.random.PRNGKey(0)
    keys = list(jax.random.split(key, ROUNDS + 2))
    state, m = step(state, backbone, consts, batches, keys[-1])  # compile
    sync(m["loss"][-1])
    state, m = step(state, backbone, consts, batches, keys[-2])  # warm
    sync(m["loss"][-1])

    t0 = time.perf_counter()
    for i in range(ROUNDS):
        state, m = step(state, backbone, consts, batches, keys[i])
    sync(m["loss"][-1])  # fences the chain (dispatches depend sequentially)
    dt = time.perf_counter() - t0

    img_s = ROUNDS * WINDOW * BATCH / dt
    print(json.dumps({
        "metric": "prompt-tune images/sec/chip (ViT-B/16 UPT, batch 32, 100-cls)",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_PYTORCH_EST_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
