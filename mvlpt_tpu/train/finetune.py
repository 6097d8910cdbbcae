"""Full-model finetune trainer (the ELEVATER finetune baseline).

The reference vendors the ELEVATER toolkit's finetune command
(trainers/vision_benchmark/commands/finetune.py + optim/build.py:88-170):
CLIP's visual tower plus a linear classification head, ALL parameters
trainable, optionally with a lower trunk learning rate (two-LR mode).

Here that becomes one more jitted SPMD step: the differentiated pytree
is {"visual": <tower>, "head": {kernel, bias}} — no frozen argument.
Reuses the PromptTrainer loop/checkpoint/eval machinery by presenting
the same (backbone, params, consts, batch) step signature with an empty
frozen side.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from mvlpt_tpu.core import vit as vit_mod
from mvlpt_tpu.core.clip import CLIPConfig
from mvlpt_tpu.train.optim import build_optimizer
from mvlpt_tpu.train.trainer import PromptTrainer, load_clip_backbone
from mvlpt_tpu.train.train_step import (
    TrainState, accuracy, init_train_state, soft_cross_entropy)
from mvlpt_tpu.utils.registry import TRAINER_REGISTRY


@dataclasses.dataclass(frozen=True)
class FinetuneModel:
    clip_cfg: CLIPConfig
    compute_dtype: jnp.dtype = jnp.bfloat16
    # (mean, std) for raw-uint8 batches (TPU.DEVICE_NORMALIZE loaders);
    # float batches pass through device_normalize untouched.
    normalize: tuple | None = None

    def __call__(self, backbone, params, consts, images, tasks=None,
                 task_ranges=None, rng=None):
        from mvlpt_tpu.data.transforms import device_normalize
        from mvlpt_tpu.models.custom_clip import _apply_task_mask

        if self.normalize is not None:
            images = device_normalize(images, *self.normalize)
        # Mixed precision: fp32 master params (the optimizer state), cast
        # to the compute dtype INSIDE the differentiated function — the
        # tower then actually runs bf16 (encode_image derives its compute
        # dtype from the kernel dtype), cotangents cast back to fp32.
        visual = jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype), params["visual"])
        feats = vit_mod.encode_image(
            visual, images.astype(self.compute_dtype),
            patch_size=self.clip_cfg.vision_patch_size,
            n_heads=self.clip_cfg.vision_heads)
        logits = (feats.astype(jnp.float32)
                  @ params["head"]["kernel"].astype(jnp.float32)
                  + params["head"]["bias"])
        if tasks is not None and task_ranges is not None:
            logits = _apply_task_mask(logits, tasks, task_ranges)
        return logits


def build_finetune_optimizer(ocfg, steps_per_epoch: int):
    """Two-LR mode: trunk lr = LR * BASE_LR_MULT when STAGED_LR
    (optim/build.py's trunk/head split)."""
    tx, schedule = build_optimizer(ocfg, steps_per_epoch)
    if not ocfg.STAGED_LR:
        return tx, schedule
    trunk_cfg = ocfg.clone()
    trunk_cfg.LR = ocfg.LR * ocfg.BASE_LR_MULT
    trunk_tx, _ = build_optimizer(trunk_cfg, steps_per_epoch)
    label_fn = lambda tree: {k: ("head" if k == "head" else "trunk")
                             for k in tree}
    return optax.multi_transform(
        {"head": tx, "trunk": trunk_tx}, label_fn), schedule


@TRAINER_REGISTRY.register()
class FinetuneCLIP(PromptTrainer):
    """--trainer FinetuneCLIP: full-model finetune with a linear head."""

    trainer_cfg_key = "MVLPT"  # PREC etc. read from the MVLPT namespace

    def run_epoch(self):
        # Windowed dispatch (TRAIN.STEPS_PER_DISPATCH > 1) builds
        # make_train_step_multi around the model, which requires the
        # prompt-model protocol (prepare_backbone / embed_image /
        # pre_embedded) that FinetuneModel does not implement — and the
        # amortization matters far less here (the full-tower backward
        # dwarfs the dispatch overhead). Always run the per-batch path.
        window = int(self.cfg.TRAIN.STEPS_PER_DISPATCH)
        if window > 1 and self.epoch == 0:
            print(f"FinetuneCLIP: TRAIN.STEPS_PER_DISPATCH={window} "
                  f"ignored (windowed dispatch is a prompt-trainer "
                  f"optimization); running per-batch steps")
        return self._run_epoch_plain()

    def build_model(self):
        cfg = self.cfg
        param_dtype, compute_dtype = self._dtypes()
        backbone, self.clip_cfg = load_clip_backbone(cfg, param_dtype)
        from mvlpt_tpu.core.resnet import RNConfig

        if isinstance(self.clip_cfg, RNConfig):
            raise ValueError("FinetuneCLIP currently finetunes the ViT tower")

        n_cls = self.num_classes
        out_dim = self.clip_cfg.embed_dim
        key = jax.random.PRNGKey(max(cfg.SEED, 0))
        # trainable pytree: whole visual tower (fp32 masters) + head
        visual32 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), backbone["visual"])
        params = {
            "visual": visual32,
            "head": {
                "kernel": jax.random.normal(key, (out_dim, n_cls)) * 0.01,
                "bias": jnp.zeros((n_cls,)),
            },
        }
        self.backbone = {}  # nothing frozen
        self.consts = None
        self.spec = None
        self.task_ranges = None
        if cfg.DATASET.MULTITASK_LABEL_PERTASK and hasattr(self.dm, "_task_class_idx"):
            from mvlpt_tpu.models.custom_clip import TaskClassRanges

            idx = self.dm._task_class_idx
            self.task_ranges = TaskClassRanges(
                start=jnp.asarray([idx[t][0] for t in self.dm._task_names]),
                end=jnp.asarray([idx[t][1] for t in self.dm._task_names]))

        self.model = FinetuneModel(
            clip_cfg=self.clip_cfg, compute_dtype=compute_dtype,
            normalize=(tuple(cfg.INPUT.PIXEL_MEAN),
                       tuple(cfg.INPUT.PIXEL_STD)))
        steps_per_epoch = max(1, len(self.train_loader_x))
        self.steps_per_epoch = steps_per_epoch
        self.tx, self.lr_schedule = build_finetune_optimizer(
            cfg.OPTIM, steps_per_epoch)
        self.state = init_train_state(params, self.tx)

        model, tx, task_ranges = self.model, self.tx, self.task_ranges

        @jax.jit
        def step_fn(state, backbone, consts, batch, rng):
            def loss_fn(p):
                logits = model(backbone, p, consts, batch["image"],
                               batch.get("task"), task_ranges)
                return soft_cross_entropy(logits, batch["label"]), logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.prompt_params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.prompt_params)
            new_params = optax.apply_updates(state.prompt_params, updates)
            return TrainState(new_params, opt_state, state.step + 1), {
                "loss": loss, "acc": accuracy(logits, batch["label"]),
                "grad_norm": optax.global_norm(grads)}

        @jax.jit
        def eval_fn(backbone, params, consts, batch):
            return model(backbone, params, consts, batch["image"],
                         batch.get("task"), task_ranges)

        self.train_step = step_fn
        self.eval_step = eval_fn
        from mvlpt_tpu.evaluation import ClassificationEvaluator

        self.evaluator = ClassificationEvaluator(self.lab2cname)
        self.mesh = None
        n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
        print(f"Finetuning {n_params/1e6:.1f}M params "
              f"(visual tower + {n_cls}-way head)")
