"""Component-level timing of the flagship UPT step on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship
from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.train.optim import build_optimizer
from mvlpt_tpu.train.train_step import init_train_state, make_train_step

BATCH, N_CLS, STEPS = 32, 100, 20
PARTS = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
    "step", "imgfb", "imgf", "txtfb", "fwd", "opt"}

model, backbone, prompt_params, consts, images, clip_cfg = _flagship(
    n_cls=N_CLS, batch=BATCH)
cfg = get_cfg_default()
tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=100)
state = init_train_state(prompt_params, tx)
# the jitted step donates state buffers; keep pristine copies for
# the component timings
import copy
prompt_params = jax.tree_util.tree_map(lambda x: jnp.array(x), prompt_params)

labels = jnp.asarray(np.random.RandomState(0).randint(0, N_CLS, BATCH))
batch = {"image": images, "label": labels}
rng = jax.random.PRNGKey(0)


def fence(x):
    return float(jax.device_get(jnp.sum(x).astype(jnp.float32)))


def time_fn(name, fn, *args, steps=STEPS):
    out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = None
    for _ in range(steps):
        outs = fn(*args)
    fence(jax.tree_util.tree_leaves(outs)[0])
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:42s} {dt:8.2f} ms  ({BATCH/dt*1000:7.1f} img/s)", flush=True)
    return dt


# 1. full train step
t_full = t_imgfb = t_imgf = t_txtfb = t_fwd = float("nan")
step = make_train_step(model, tx)
st = state
def full_step():
    global st
    st, m = step(st, backbone, consts, batch, rng)
    return m["loss"]
t_full = time_fn("full train step", full_step) if "step" in PARTS else t_full

# 2. image tower fwd+bwd
def img_loss(pp):
    f = model.encode_image(backbone, pp, images, None)
    return jnp.sum(f.astype(jnp.float32))
img_fb = jax.jit(jax.value_and_grad(img_loss))
t_imgfb = time_fn("image tower fwd+bwd", img_fb, prompt_params) if "imgfb" in PARTS else t_imgfb

# 3. image tower fwd only
img_f = jax.jit(lambda pp: model.encode_image(backbone, pp, images, None))
t_imgf = time_fn("image tower fwd", img_f, prompt_params) if "imgf" in PARTS else t_imgf

# 4. text path fwd+bwd (coupler + assemble + tower)
from mvlpt_tpu.prompts import coop_assemble, upt_couple

def txt_loss(pp):
    coop_ctx, _, _ = upt_couple(pp, model.spec)
    prompts = coop_assemble(coop_ctx, consts, model.spec)
    tf = model.encode_text_prompts(backbone, prompts, consts.eot_idx)
    return jnp.sum(tf.astype(jnp.float32))
txt_fb = jax.jit(jax.value_and_grad(txt_loss))
t_txtfb = time_fn("text path fwd+bwd", txt_fb, prompt_params) if "txtfb" in PARTS else t_txtfb

# 5. full forward only
fwd = jax.jit(lambda pp: model(backbone, pp, consts, images))
t_fwd = time_fn("full forward", fwd, prompt_params) if "fwd" in PARTS else t_fwd

# 6. optimizer-only update
import optax
from mvlpt_tpu.train.train_step import TrainState

g = jax.tree_util.tree_map(jnp.ones_like, prompt_params)


def opt_update(s):
    updates, opt_state = tx.update(g, s.opt_state, s.prompt_params)
    return TrainState(optax.apply_updates(s.prompt_params, updates),
                      opt_state, s.step + 1)


opt = jax.jit(opt_update)
if "opt" in PARTS:
    try:
        t_opt = time_fn("optimizer update", opt,
                        init_train_state(prompt_params, tx))
    except Exception as e:
        print("optimizer timing skipped:", e)

print(f"\nimage fwd+bwd share: {t_imgfb/t_full:.0%}; "
      f"text fwd+bwd share: {t_txtfb/t_full:.0%}; "
      f"residual (loss+opt+overhead): {(t_full-t_imgfb-t_txtfb)/t_full:.0%}")
