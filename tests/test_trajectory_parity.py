"""Training-TRAJECTORY parity vs the reference's own torch trainer.

test_reference_parity.py proves single forwards match; this file proves
TRAINING matches: N SGD steps through the reference's forward_backward
semantics (/root/reference/trainers/mvlpt.py:910-951, fp32 branch —
F.cross_entropy on logits, soft-normalized labels for the multitask
k-hot path :914-916, optimizer over prompt_learner params only
:855-871, LR stepped at the last batch of each epoch :948-949 via
Dassl's CosineAnnealingLR) against our jitted train step
(train/train_step.py:make_train_step + train/optim.py), asserting the
per-step loss trajectory AND the final prompt-parameter pytree agree.

Both sides run fp32 on CPU from identical synthetic data, identical
initial prompt params (copied from the reference learner), and the
same SGD(momentum, coupled weight decay) + per-epoch cosine schedule.

Tolerances: per-step drift measured ~1e-6..1e-5 on these tiny towers;
1e-3 loss / 1e-3 param bounds keep real gradient-path bugs (which
measure >1e-2 within two steps) detectable without flaking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_reference_parity import (  # noqa: E402
    CLASSNAMES, MODES, _build_both, _make_cfg, params_from_ref_learner, ref,
)

from mvlpt_tpu.config import get_cfg_default  # noqa: E402
from mvlpt_tpu.models.custom_clip import TaskClassRanges  # noqa: E402
from mvlpt_tpu.train.optim import build_optimizer  # noqa: E402
from mvlpt_tpu.train.train_step import (  # noqa: E402
    init_train_state, make_train_step)


pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

LR = 0.02
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
MAX_EPOCH = 4          # cosine horizon
STEPS_PER_EPOCH = 2
N_EPOCHS = 3           # -> 6 steps, crossing 2 epoch/LR boundaries
BATCH = 2


def _synthetic_stream(n_cls, n_steps, seed=17, khot=False, n_tasks=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(n_steps, BATCH, 32, 32, 3).astype(np.float32)
    if khot:
        labels = np.zeros((n_steps, BATCH, n_cls), np.float32)
        for s in range(n_steps):
            for b in range(BATCH):
                k = rng.randint(1, 3)
                labels[s, b, rng.choice(n_cls, k, replace=False)] = 1.0
    else:
        labels = rng.randint(0, n_cls, (n_steps, BATCH)).astype(np.int64)
    tasks = (rng.randint(0, n_tasks, (n_steps, BATCH)).astype(np.int64)
             if n_tasks else None)
    return imgs, labels, tasks


def _run_reference(ref_model, imgs, labels, tasks):
    """The reference trainer loop: freeze all but prompt_learner
    (mvlpt.py:855-860), SGD on prompt params (Dassl build_optimizer:
    momentum + coupled weight decay), CosineAnnealingLR stepped at the
    last batch of each epoch (mvlpt.py:948-949), fp32 forward_backward
    (mvlpt.py:928-932)."""
    for name, p in ref_model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    train_params = [p for p in ref_model.prompt_learner.parameters()
                    if p.requires_grad]
    optim = torch.optim.SGD(train_params, lr=LR, momentum=MOMENTUM,
                            weight_decay=WEIGHT_DECAY)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(optim, float(MAX_EPOCH))
    losses = []
    step = 0
    for _epoch in range(N_EPOCHS):
        for _b in range(STEPS_PER_EPOCH):
            img = torch.from_numpy(imgs[step].transpose(0, 3, 1, 2))
            label = torch.from_numpy(labels[step])
            if label.dim() > 1 and label.shape[-1] > 1:
                label = label.float()
                label = label / label.sum(dim=-1, keepdim=True)
            task = (torch.from_numpy(tasks[step]) if tasks is not None
                    else None)
            out = ref_model(img, task=task) if task is not None \
                else ref_model(img)
            loss = F.cross_entropy(out, label)
            optim.zero_grad()
            loss.backward()
            optim.step()
            losses.append(float(loss.item()))
            step += 1
        sched.step()
    return losses


def _run_ours(model, backbone, prompt_params, consts, imgs, labels, tasks,
              task_ranges=None):
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = LR
    cfg.OPTIM.MOMENTUM = MOMENTUM
    cfg.OPTIM.WEIGHT_DECAY = WEIGHT_DECAY
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = MAX_EPOCH
    cfg.OPTIM.WARMUP_EPOCH = 0
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=STEPS_PER_EPOCH)
    state = init_train_state(prompt_params, tx)
    step_fn = make_train_step(model, tx, task_ranges=task_ranges,
                              donate=False)
    losses = []
    rng = jax.random.PRNGKey(0)  # no dropout in these specs
    for s in range(imgs.shape[0]):
        batch = {"image": jnp.asarray(imgs[s]),
                 "label": jnp.asarray(labels[s])}
        if tasks is not None:
            batch["task"] = jnp.asarray(tasks[s])
        state, m = step_fn(state, backbone, consts, batch, rng)
        losses.append(float(m["loss"]))
    return losses, state.prompt_params


TRAJECTORY_MODES = ["coop_end", "coop_middle", "vpt_deep", "upt", "cocoop"]


@pytest.mark.parametrize("mode", TRAJECTORY_MODES)
def test_training_trajectory_parity(ref, mode):
    cfg = _make_cfg(**MODES[mode])
    ref_model, model, backbone, prompt_params, consts = _build_both(ref, cfg)
    n_steps = N_EPOCHS * STEPS_PER_EPOCH
    imgs, labels, _ = _synthetic_stream(len(CLASSNAMES), n_steps)

    got_losses, got_params = _run_ours(
        model, backbone, prompt_params, consts, imgs, labels, None)
    want_losses = _run_reference(ref_model, imgs, labels, None)

    np.testing.assert_allclose(got_losses, want_losses, rtol=1e-3, atol=1e-3)
    # the trained prompt-parameter pytrees must coincide too — loss
    # agreement alone can mask compensating errors
    spec = model.spec
    want_params = params_from_ref_learner(ref_model.prompt_learner, spec)
    flat_got = jax.tree_util.tree_leaves_with_path(got_params)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want_params))
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_want[path]),
            rtol=1e-3, atol=1e-3, err_msg=str(path))


def test_training_trajectory_parity_multitask_softlabel(ref):
    """The multitask path: k-hot targets soft-normalized before CE
    (mvlpt.py:914-916) + per-task logit masking (mvlpt.py:573-581)."""
    classnames = CLASSNAMES + ["red apple", "sports car"]
    dm = type("DM", (), {})()
    dm._task_names = ["t0", "t1"]
    dm._labelmap = {"t0": [0, 1], "t1": [0, 1, 2, 3]}
    dm._num_classes = 6
    cfg = _make_cfg(**{"TRAINER.MVLPT.COOP.N_CTX": 4,
                       "DATASET.MULTITASK_LABEL_PERTASK": True})
    ref_model, model, backbone, prompt_params, consts = _build_both(
        ref, cfg, classnames=classnames, dm=dm)
    ranges = TaskClassRanges(start=jnp.asarray([0, 2]), end=jnp.asarray([2, 6]))

    n_steps = N_EPOCHS * STEPS_PER_EPOCH
    imgs, labels, tasks = _synthetic_stream(
        len(classnames), n_steps, khot=True, n_tasks=2)

    got_losses, _ = _run_ours(
        model, backbone, prompt_params, consts, imgs, labels, tasks,
        task_ranges=ranges)
    want_losses = _run_reference(ref_model, imgs, labels, tasks)
    np.testing.assert_allclose(got_losses, want_losses, rtol=1e-3, atol=1e-3)
