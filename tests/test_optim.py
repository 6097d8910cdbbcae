"""Optimizer/schedule semantics vs the Dassl configuration the reference
trains with (SGD + cosine per-epoch + 1-epoch constant warmup,
configs/trainers/MVLPT/vit_b16.yaml:16-22; torch-SGD update math)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.train.optim import build_lr_schedule, build_optimizer


def _ocfg(**kw):
    cfg = get_cfg_default().OPTIM
    for k, v in kw.items():
        cfg[k] = v
    return cfg


def test_cosine_with_constant_warmup():
    # Default WARMUP_RECOUNT=True: the cosine epoch count restarts when
    # warmup ends (Dassl resets the wrapped scheduler's count), so epoch
    # e >= 1 trains at cosine(e - 1).
    ocfg = _ocfg(NAME="sgd", LR=0.002, MAX_EPOCH=200, LR_SCHEDULER="cosine",
                 WARMUP_EPOCH=1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5)
    sched = build_lr_schedule(ocfg, steps_per_epoch=10)
    # epoch 0: constant warmup
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(9)) == pytest.approx(1e-5)
    for epoch in (1, 50, 100, 199):
        want = 0.002 * 0.5 * (1 + math.cos(math.pi * (epoch - 1) / 200))
        assert float(sched(epoch * 10)) == pytest.approx(want, rel=1e-6)


def test_cosine_warmup_no_recount():
    # WARMUP_RECOUNT=False: warmup epochs stay in the cosine count.
    ocfg = _ocfg(NAME="sgd", LR=0.002, MAX_EPOCH=200, LR_SCHEDULER="cosine",
                 WARMUP_EPOCH=1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5,
                 WARMUP_RECOUNT=False)
    sched = build_lr_schedule(ocfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-5)
    for epoch in (1, 50, 199):
        want = 0.002 * 0.5 * (1 + math.cos(math.pi * epoch / 200))
        assert float(sched(epoch * 10)) == pytest.approx(want, rel=1e-6)


def test_sgd_dampening_matches_torch():
    torch = pytest.importorskip("torch")
    import jax

    ocfg = _ocfg(NAME="sgd", LR=0.1, MOMENTUM=0.9, SGD_DAMPNING=0.3,
                 WEIGHT_DECAY=0.0, LR_SCHEDULER="constant", WARMUP_EPOCH=-1,
                 MAX_EPOCH=10)
    tx, _ = build_optimizer(ocfg, steps_per_epoch=1)

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.5, -0.1, 0.2], np.float32),
             np.array([-0.3, 0.4, 0.1], np.float32)]

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, dampening=0.3)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_single_and_multi_step():
    s1 = build_lr_schedule(
        _ocfg(LR=1.0, MAX_EPOCH=30, LR_SCHEDULER="single_step",
              STEPSIZE=(10,), GAMMA=0.1, WARMUP_EPOCH=-1), 1)
    assert float(s1(0)) == 1.0
    assert float(s1(10)) == pytest.approx(0.1)
    assert float(s1(20)) == pytest.approx(0.01)
    s2 = build_lr_schedule(
        _ocfg(LR=1.0, MAX_EPOCH=30, LR_SCHEDULER="multi_step",
              STEPSIZE=(5, 15), GAMMA=0.5, WARMUP_EPOCH=-1), 1)
    assert float(s2(4)) == 1.0
    assert float(s2(5)) == pytest.approx(0.5)
    assert float(s2(15)) == pytest.approx(0.25)


def test_sgd_matches_torch_update():
    torch = pytest.importorskip("torch")

    ocfg = _ocfg(NAME="sgd", LR=0.1, MOMENTUM=0.9, WEIGHT_DECAY=0.01,
                 LR_SCHEDULER="constant", WARMUP_EPOCH=-1, MAX_EPOCH=10)
    tx, _ = build_optimizer(ocfg, steps_per_epoch=1)

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.5, -0.1, 0.2], np.float32),
             np.array([-0.3, 0.4, 0.1], np.float32)]

    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-6, atol=1e-7)
