"""Headline benchmark: prompt-tune throughput, images/sec/chip.

Config matches the reference comparison point (BASELINE.md): ViT-B/16,
UPT prompts (CoOp n_ctx=4 'middle' + deep VPT n_ctx=4 + transformer
coupler, MVLPT.md:49-53), batch 32 (vit_b16.yaml:3), 100-class text
tower with CUT_CONTEXTLEN, full forward-backward + SGD update per step.

What is measured, and how honestly:

* **Steady-state step throughput** — the trainer's windowed-dispatch
  path (TRAIN.STEPS_PER_DISPATCH): a W-batch uint8 window staged
  per dispatch (8 unique batches tiled on device — see the staging
  comment in main()), stem pre-embedded outside the scan, CLIP normalization
  folded into the frozen patch-embed matmul, per-dispatch weight prep
  hoisted out of the scan — exactly the program
  train/trainer.py:_run_epoch_windowed runs. Timed over chained
  dispatches with a materializing fence (axon's block_until_ready does
  not wait). Window sweep (measured): W=1 ~19.9, W=30 18.53, W=60
  18.17, W=120 18.03 ms/step — the 1.4 ms/dispatch service overhead
  amortizes away; the trainer ships W=120 (the trainer clamps the
  window to the epoch length, so short few-shot epochs still run as
  one full-epoch scan rather than missing the window).
* **H2D streaming** — measured separately and reported in the JSON
  (``h2d_mbs``): this environment reaches the TPU through a network
  tunnel whose host→device bandwidth measures ~17 MB/s, so per-step
  transfer of fresh pixels (4.8 MB uint8/batch ≈ 275 ms at tunnel
  speed vs an 18.7 ms step) cannot be hidden HERE — an environment
  artifact three orders of magnitude below a real v5e host's PCIe DMA
  (>10 GB/s, where the same batch costs ~0.5 ms against an 18.7 ms
  step). What CAN be demonstrated on this tunnel is that transfers
  overlap compute (``h2d_overlap``: fraction of the shorter leg hidden
  when a window computes while a batch uploads), which is the property
  production streaming relies on. The throughput number therefore uses
  pre-staged distinct batches and the JSON carries the transfer story
  explicitly rather than silently excluding it.
* **MFU** — analytic matmul-FLOP count for the step
  (mvlpt_tpu/utils/flops.py; the axon backend does not populate
  ``cost_analysis()`` usefully) against the v5e bf16 peak
  (~197 TFLOP/s), over measured wall time per step.
* **Eval throughput** (``eval_img_s``) — trainer.test()'s fast path:
  text features cached once per split (make_cached_text_eval) +
  image-tower-only eval steps at the reference TEST batch 100
  (vit_b16.yaml), dispatched pipelined (async, fence at the end) the
  way train/trainer.py:test() issues them. ``zs_eval_img_s`` is the
  zero-shot config (plain CLIP, precomputed class text features,
  zsclip.py:34-60 semantics) at the same batch.

The reference never measured throughput (SURVEY.md §6); BASELINE.json
sets the target at >=5x A100-PyTorch per-chip. ``vs_baseline`` is
reported against A100_PYTORCH_EST_IMG_S — an estimate for the
reference PyTorch fp16 pipeline on one A100 for this exact config
(documented in BASELINE.md; no GPU exists in this environment).

Prints ONE JSON line.
"""

import json
import time

A100_PYTORCH_EST_IMG_S = 340.0  # see BASELINE.md "Throughput baseline"
V5E_BF16_PEAK_FLOPS = 197e12    # per chip
BATCH = 32
N_CLS = 100
# Product-config window (TRAIN.STEPS_PER_DISPATCH, the value
# vit_b16_tpu_fast.yaml ships): the headline is the shipped config.
# W=120 measured 18.03 vs W=60's 18.17 ms/step (same-session A/B,
# 3 reps each, <=0.003 ms spread); the old objection — a 120-step
# window needs 3840-sample epochs to fill — is gone now that the
# trainer clamps the window to the epoch length (a short epoch runs
# as ONE full-epoch scan), so 120 is "adaptive up to 120".
WINDOW = 120
ROUNDS = 4      # timed dispatches -> WINDOW * ROUNDS measured steps
EVAL_BATCH = 100   # reference TEST batch (vit_b16.yaml)
EVAL_STEPS = 50    # timed eval dispatches (short runs are tunnel-jittery)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.data.transforms import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD
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
    step = make_train_step_multi(
        model, tx, pre_embed=True,
        normalize=(CLIP_PIXEL_MEAN, CLIP_PIXEL_STD))

    # Stage a small set of unique batches and tile to WINDOW on device:
    # uploading the full (WINDOW, B, 224, 224, 3) uint8 window (~580 MB
    # at WINDOW=120) takes ~25 min through this environment's ~20 MB/s
    # tunnel and risks the driver's bench timeout. Tiling preserves the
    # measurement: the scan still reads a distinct array slice per step
    # (batches are traced as data, not constants, so repeated *values*
    # enable no XLA hoisting; verified 17.9 ms/step both ways).
    UNIQUE = 8
    rng_np = np.random.RandomState(0)
    host_u8 = rng_np.randint(
        0, 256, (UNIQUE, BATCH, 224, 224, 3)).astype(np.uint8)
    reps = -(-WINDOW // UNIQUE)
    batches = {
        "image": jnp.tile(jnp.asarray(host_u8),
                          (reps, 1, 1, 1, 1))[:WINDOW],
        "label": jnp.asarray(
            rng_np.randint(0, N_CLS, (WINDOW, BATCH)), jnp.int32),
    }

    def sync(x):
        # On the axon remote platform block_until_ready does not actually
        # wait; materializing the scalar is the only reliable fence.
        return float(jax.device_get(x))

    def fence_arr(a):
        return float(jax.device_get(jnp.sum(
            a[..., :1, :1, :1].astype(jnp.float32))))

    key = jax.random.PRNGKey(0)
    keys = list(jax.random.split(key, ROUNDS + 2))
    state, m = step(state, backbone, consts, batches, keys[-1])  # compile
    sync(m["loss"][-1])
    state, m = step(state, backbone, consts, batches, keys[-2])  # warm
    sync(m["loss"][-1])

    # ---- steady-state throughput (distinct staged batches per step) ----
    t0 = time.perf_counter()
    for i in range(ROUNDS):
        state, m = step(state, backbone, consts, batches, keys[i])
    sync(m["loss"][-1])  # fences the chain (dispatches depend sequentially)
    dt = time.perf_counter() - t0
    img_s = ROUNDS * WINDOW * BATCH / dt
    step_ms = dt / (ROUNDS * WINDOW) * 1e3

    # ---- MFU: analytic matmul-FLOP count (utils/flops.py; XLA's
    # cost_analysis() is not populated usefully by the axon backend) ----
    from mvlpt_tpu.utils.flops import flagship_step_flops

    flops_per_step = flagship_step_flops(batch=BATCH, n_cls=N_CLS)
    mfu = flops_per_step / (step_ms / 1e3) / V5E_BF16_PEAK_FLOPS

    # ---- eval path: cached-text fast path at the reference TEST batch
    # (100), pipelined dispatch (async, one fence at the end) — exactly
    # what trainer.test() runs. Plus the zero-shot config. ----
    from mvlpt_tpu.train.train_step import make_cached_text_eval

    text_fn, eval_fn = make_cached_text_eval(
        model, normalize=(CLIP_PIXEL_MEAN, CLIP_PIXEL_STD))
    text_features = text_fn(backbone, state.prompt_params, consts)
    EVAL_UNIQUE = 4
    eval_u8 = jnp.asarray(rng_np.randint(
        0, 256, (EVAL_UNIQUE, EVAL_BATCH, 224, 224, 3)).astype(np.uint8))
    eval_batches = [{"image": eval_u8[i % EVAL_UNIQUE]}
                    for i in range(EVAL_STEPS)]
    logits = eval_fn(backbone, state.prompt_params, text_features,
                     eval_batches[0])  # compile
    sync(logits[0, 0])
    t0 = time.perf_counter()
    outs = [eval_fn(backbone, state.prompt_params, text_features, b)
            for b in eval_batches]
    sync(sum(o[0, 0] for o in outs))  # fence the pipelined chain
    dt_eval = time.perf_counter() - t0
    eval_img_s = EVAL_STEPS * EVAL_BATCH / dt_eval
    eval_ms = dt_eval / EVAL_STEPS * 1e3

    # zero-shot config: THE shipped inferencer (models/zsclip.py
    # make_zs_infer — the uint8 fast path with normalization folded
    # into the frozen patch-embed matmul) fed by the shipped text
    # encoder (encode_class_text_features, template-averaged class
    # features), so this number can't drift from what models/zsclip.py
    # actually runs. Text content doesn't affect the timed image-side
    # throughput, but the measured config should BE the zsclip
    # semantics, not the prompt-tuned cached features above.
    from mvlpt_tpu.models.zsclip import (
        encode_class_text_features, make_zs_infer)

    zs_text = encode_class_text_features(
        backbone, model.clip_cfg, [f"class {i}" for i in range(N_CLS)],
        ["a photo of a {}."])
    zs_eval = make_zs_infer(model.clip_cfg, CLIP_PIXEL_MEAN, CLIP_PIXEL_STD)

    logits = zs_eval(backbone, zs_text, eval_batches[0]["image"])  # compile
    sync(logits[0, 0])
    t0 = time.perf_counter()
    outs = [zs_eval(backbone, zs_text, b["image"]) for b in eval_batches]
    sync(sum(o[0, 0] for o in outs))
    dt_zs = time.perf_counter() - t0
    zs_img_s = EVAL_STEPS * EVAL_BATCH / dt_zs

    # ---- H2D: tunnel bandwidth + compute/transfer overlap. Secondary
    # diagnostics: never let a flaky tunnel transfer sink the headline ----
    try:
        one = host_u8[0]
        d = jax.device_put(one)
        fence_arr(d)  # warm the transfer path
        t0 = time.perf_counter()
        d = jax.device_put(one)
        fence_arr(d)
        t_put = time.perf_counter() - t0
        h2d_mbs = one.nbytes / 1e6 / t_put

        t0 = time.perf_counter()
        state, m = step(state, backbone, consts, batches, keys[0])
        sync(m["loss"][-1])
        t_compute = time.perf_counter() - t0

        t0 = time.perf_counter()
        state, m = step(state, backbone, consts, batches, keys[1])
        d = jax.device_put(one)       # uploads while the window computes
        fence_arr(d)
        sync(m["loss"][-1])
        t_both = time.perf_counter() - t0
        overlap = (t_compute + t_put - t_both) / max(
            1e-9, min(t_compute, t_put))
        overlap = max(0.0, min(1.0, overlap))
    except Exception:
        h2d_mbs = overlap = -1.0

    out = {
        "metric": ("prompt-tune images/sec/chip "
                   "(ViT-B/16 UPT, batch 32, 100-cls)"),
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_PYTORCH_EST_IMG_S, 3),
        "device_ms": round(step_ms, 3),
        "h2d_mbs": round(h2d_mbs, 1),
        "h2d_overlap": round(overlap, 2),
        "h2d_note": ("tunnel H2D is ~17 MB/s (environment artifact, "
                     "~1000x below real v5e host DMA); streaming fresh "
                     "pixels per step is transfer-bound HERE, so the "
                     "headline uses pre-staged distinct batches and "
                     "h2d_overlap shows transfers hide under compute"),
    }
    out["mfu"] = round(mfu, 4)
    out["flops_per_step"] = int(flops_per_step)
    from mvlpt_tpu.utils.flops import eval_step_flops

    out["eval_img_s"] = round(eval_img_s, 1)
    out["eval_ms_batch100"] = round(eval_ms, 3)
    out["eval_mfu"] = round(
        eval_step_flops(batch=EVAL_BATCH, n_cls=N_CLS)
        / (eval_ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)
    out["zs_eval_img_s"] = round(zs_img_s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
