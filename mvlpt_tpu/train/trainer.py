"""Trainer engine: the Dassl-TrainerX contract rebuilt for one jitted
SPMD step.

Reproduces the training semantics the reference inherits from Dassl and
overrides in MVLPT(TrainerX) (mvlpt.py:827-1125):

  * epoch loop with per-batch metric meters and PRINT_FREQ logging;
    LR stepping per epoch (folded into the step-indexed schedule);
  * best-val checkpoint selection (TEST.FINAL_MODEL=best_val) with
    prompt-only checkpoints under <OUTPUT_DIR>/prompt_learner/;
  * resume from RESUME dir; warm start from --model-dir via load_model
    (drops token_prefix/suffix, renames upt_proj, non-strict);
  * multitask test() with per-task evaluator routing, per-task logit
    slicing by task_class_idx ranges, overall = average or
    MULTITASK_EVALKEY (mvlpt.py:989-1088), and `results {...}` prints
    that scripts/read_record.py-style scrapers can parse;
  * scalar logging to <OUTPUT_DIR>/tb/scalars.jsonl (tensorboard events
    optional via TF when installed).
"""

from __future__ import annotations

import datetime
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.checkpoint import convert as ckpt_convert
from mvlpt_tpu.checkpoint import prompt_io
from mvlpt_tpu.core import clip as clip_core
from mvlpt_tpu.core.clip import CLIPConfig
from mvlpt_tpu.data.managers import build_data_manager
from mvlpt_tpu.evaluation import ClassificationEvaluator
from mvlpt_tpu.models.custom_clip import MVLPTModel, TaskClassRanges
from mvlpt_tpu.prompts import (
    PromptSpec, build_prompt_consts, compute_cut_context_length,
    init_prompt_params)
from mvlpt_tpu.train.optim import build_optimizer
from mvlpt_tpu.train.train_step import (
    init_train_state, make_cached_text_eval, make_eval_step,
    make_train_step)
from mvlpt_tpu.utils.registry import TRAINER_REGISTRY


def load_clip_backbone(cfg, dtype):
    """Load CLIP weights for cfg.MODEL.BACKBONE.NAME.

    Resolution order: MVLPT_TPU_CLIP_CKPT env path -> ~/.cache/clip ->
    download from the OpenAI CDN (load_clip_to_cpu equivalent,
    mvlpt.py:28-43). MVLPT_TPU_RANDOM_CLIP=1 short-circuits to a random
    init (offline tests / benchmarks)."""
    name = cfg.MODEL.BACKBONE.NAME
    if os.environ.get("MVLPT_TPU_RANDOM_CLIP"):
        if name.startswith("RN"):
            from mvlpt_tpu.core.resnet import RN_ARCHS, init_rn_params

            rn_cfg = RN_ARCHS[name]
            # Text tower arch shared with ViT-B (RN50/101 use the same
            # 512-wide 12-layer text transformer).
            text_cfg = CLIPConfig.for_backbone("ViT-B/16")
            full = clip_core.init_clip_params(jax.random.PRNGKey(1), text_cfg)
            params = {
                "visual": init_rn_params(jax.random.PRNGKey(0), rn_cfg),
                "text": full["text"], "logit_scale": full["logit_scale"],
            }
            return clip_core.cast_backbone(params, dtype), rn_cfg
        clip_cfg = CLIPConfig.for_backbone(name)
        arch_env = os.environ.get("MVLPT_TPU_RANDOM_CLIP_ARCH")
        if arch_env:
            # test seam for subprocess runs (shell-driver e2e tests):
            # JSON CLIPConfig field overrides, the out-of-process
            # equivalent of the tiny-arch monkeypatch the in-process
            # tests use. Only honored on the random-init path.
            import dataclasses as _dc
            import json as _json

            clip_cfg = _dc.replace(clip_cfg, **_json.loads(arch_env))
        params = clip_core.init_clip_params(jax.random.PRNGKey(0), clip_cfg)
        return clip_core.cast_backbone(params, dtype), clip_cfg
    env = os.environ.get("MVLPT_TPU_CLIP_CKPT")
    if env and os.path.exists(env):
        params, clip_cfg = ckpt_convert.load_clip(env, dtype=dtype)
    else:
        params, clip_cfg = ckpt_convert.load_clip(name, dtype=dtype)
    return clip_core.cast_backbone(params, dtype), clip_cfg


def _fast_forward_schedule(opt_state, step: int):
    """Set every ``count`` field in an optax state tree to ``step`` so
    step-indexed schedules resume at the right position (the count lives
    in e.g. ScaleByScheduleState/ScaleByAdamState, not in TrainState)."""

    def fix(node):
        if hasattr(node, "_fields"):  # NamedTuple state
            children = {f: fix(getattr(node, f)) for f in node._fields}
            if "count" in node._fields:
                children["count"] = jnp.asarray(step, jnp.int32)
            return type(node)(**children)
        if isinstance(node, tuple):
            return tuple(fix(x) for x in node)
        if isinstance(node, list):
            return [fix(x) for x in node]
        return node

    return fix(opt_state)


class MetricMeter:
    """Accumulates step metrics WITHOUT forcing a device sync: values
    stay as (possibly device-resident) scalars until summary() — so the
    host input pipeline and the device stay pipelined between prints."""

    def __init__(self, window: int = 20):
        self.meters = {}
        self.window = window

    def update(self, metrics: dict):
        for k, v in metrics.items():
            buf = self.meters.setdefault(k, [])
            buf.append(v)
            if len(buf) > self.window:
                del buf[: -self.window]

    def summary(self) -> str:
        return " ".join(
            f"{k} {np.mean([float(x) for x in v]):.4f}"
            for k, v in self.meters.items())


class ScalarWriter:
    """write_scalar equivalent: one JSONL line per scalar."""

    def __init__(self, output_dir):
        self.path = os.path.join(output_dir, "tb", "scalars.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._f = open(self.path, "a")

    def write_scalar(self, tag, value, step):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class PromptTrainer:
    """Shared engine for the MVLPT / CoOp / CoCoOp trainers."""

    trainer_cfg_key = "MVLPT"

    def __init__(self, cfg):
        self.cfg = cfg
        self.output_dir = cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)
        self.writer = ScalarWriter(self.output_dir)
        self.epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.best_result = -np.inf

        self.multi_task = cfg.DATASET.MULTITASK
        self.build_data_loader()
        self.build_model()

    # ---------------------------------------------------------------- config
    @property
    def tcfg(self):
        return self.cfg.TRAINER[self.trainer_cfg_key]

    def check_cfg(self):
        assert self.tcfg.PREC in ("fp16", "fp32", "amp", "bf16")

    def _dtypes(self):
        prec = self.tcfg.PREC
        if prec == "fp32":
            return jnp.float32, jnp.float32
        # fp16 / amp / bf16 all mean bf16 on TPU (no loss scaling needed)
        return jnp.dtype(self.cfg.TPU.PARAM_DTYPE), jnp.dtype(
            self.cfg.TPU.COMPUTE_DTYPE)

    def build_spec(self, clip_cfg: CLIPConfig, classnames) -> PromptSpec:
        """MVLPT spec from TRAINER.MVLPT.* (overridden by CoOp/CoCoOp)."""
        from mvlpt_tpu.prompts import spec_from_cfg

        return spec_from_cfg(self.cfg, len(classnames), clip_cfg, classnames)

    def ctx_inits(self):
        return self.tcfg.COOP.CTX_INIT, self.tcfg.COCOOP.CTX_INIT

    # ------------------------------------------------------------------ data
    def build_data_loader(self):
        dm = build_data_manager(self.cfg)
        self.dm = dm
        self.train_loader_x = dm.train_loader_x
        self.val_loader = dm.val_loader
        self.test_loader = dm.test_loader
        self.num_classes = dm.num_classes
        self.lab2cname = dm.lab2cname

    # ----------------------------------------------------------------- model
    def build_model(self):
        cfg = self.cfg
        self.check_cfg()
        param_dtype, compute_dtype = self._dtypes()
        if cfg.DATASET.COOP:
            classnames = self.dm.classnames
        else:
            classnames = list(self.dm.lab2cname.values())

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.backbone, self.clip_cfg = load_clip_backbone(cfg, param_dtype)
        from mvlpt_tpu.core.resnet import RNConfig

        if isinstance(self.clip_cfg, RNConfig):
            raise ValueError(
                "Prompt tuning requires a ViT backbone (the reference "
                "asserts the same, mvlpt.py:47); RN* checkpoints serve the "
                "linear-probe / feature-extraction path.")

        print("Building custom CLIP")
        self.spec = self.build_spec(self.clip_cfg, classnames)
        coop_init, cocoop_init = self.ctx_inits()
        self.prompt_params = init_prompt_params(
            jax.random.PRNGKey(max(cfg.SEED, 0)), self.spec,
            clip_params=self.backbone,
            coop_ctx_init=coop_init, cocoop_ctx_init=cocoop_init)
        self.consts = build_prompt_consts(
            classnames, self.spec, self.backbone, compute_dtype,
            ctx_init=coop_init or cocoop_init)
        print("Current Context Length is:", self.spec.context_length)

        self.task_ranges = None
        if cfg.DATASET.MULTITASK_LABEL_PERTASK and hasattr(self.dm, "_task_class_idx"):
            idx = self.dm._task_class_idx
            starts = [idx[t][0] for t in self.dm._task_names]
            ends = [idx[t][1] for t in self.dm._task_names]
            self.task_ranges = TaskClassRanges(
                start=jnp.asarray(starts), end=jnp.asarray(ends))

        # Multi-chip: the ("data","model") mesh must exist before the
        # model so select_attn_fn can declare the fused kernels'
        # shard_map partitioning over it (replaces nn.DataParallel,
        # mvlpt.py:877-880).
        self.mesh = self._build_mesh(cfg)

        # ACT_CKPT is the memory lever (reference: checkpoint_sequential
        # chunks, mvlpt.py:119-121). On TPU remat costs ~25% step time at
        # CLIP scale, so it is opt-in rather than implied by CUT_CONTEXTLEN.
        use_remat = cfg.TRAINER.ACT_CKPT > 1
        from mvlpt_tpu.ops import select_attn_fn

        self.model = MVLPTModel(
            clip_cfg=self.clip_cfg, spec=self.spec, remat=use_remat,
            attn_fn=select_attn_fn(cfg.TPU.USE_PALLAS, mesh=self.mesh),
            compute_dtype=compute_dtype)

        n_prompt = clip_core.count_params(self.prompt_params)
        n_clip = clip_core.count_params(self.backbone)
        print(f"Tunable Param: {n_prompt/1e6}M, Original CLIP {n_clip/1e6}M")
        if n_prompt == 0:
            # The reference defaults all MVLPT N_CTX knobs to 0
            # (train.py:136,144,150) and relies on run scripts to set
            # them; with none set, torch's optimizer constructor raises
            # ("optimizer got an empty parameter list"). Match that
            # loudly instead of silently training nothing.
            raise ValueError(
                "No tunable prompt parameters: all of "
                "TRAINER.MVLPT.{COOP,VPT,COCOOP}.N_CTX are 0. Set at "
                "least one (e.g. TRAINER.MVLPT.COOP.N_CTX 16, or both "
                "COOP and VPT N_CTX for UPT) as the reference run "
                "scripts do (scripts/mvlpt/main_mt_coopdata_cut.sh).")

        steps_per_epoch = max(1, len(self.train_loader_x))
        self.steps_per_epoch = steps_per_epoch
        self.tx, self.lr_schedule = build_optimizer(cfg.OPTIM, steps_per_epoch)
        self.state = init_train_state(self.prompt_params, self.tx)
        # TPU.DEVICE_NORMALIZE: loaders yield raw uint8; the steps fold
        # CLIP normalization into the frozen patch-embed matmul
        self._normalize = (tuple(cfg.INPUT.PIXEL_MEAN),
                           tuple(cfg.INPUT.PIXEL_STD)) \
            if cfg.TPU.DEVICE_NORMALIZE else None
        self.train_step = make_train_step(
            self.model, self.tx, self.task_ranges, normalize=self._normalize)
        self.train_step_multi = None  # built lazily (TRAIN.STEPS_PER_DISPATCH)
        self.eval_step = make_eval_step(
            self.model, self.task_ranges, normalize=self._normalize)
        # Cached-text eval fast path: prompts are frozen during eval, so
        # test() computes text features once per call instead of per
        # batch (None for CoCoOp — image-conditioned text).
        self._eval_text_fn, self.eval_step_cached = make_cached_text_eval(
            self.model, self.task_ranges, normalize=self._normalize)
        self._eval_text = None
        self.evaluator = ClassificationEvaluator(self.lab2cname)

        # Shard the frozen backbone over the mesh; batches shard over
        # "data" per-step and gradients all-reduce inside the jitted
        # step.
        if self.mesh is not None:
            from mvlpt_tpu.parallel import (
                backbone_partition_specs, put_tree_on_mesh)

            # correct under multi-host too (callback-placed shards)
            self.backbone = put_tree_on_mesh(
                self.backbone, backbone_partition_specs(self.backbone),
                self.mesh)
            print(f"mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

    @staticmethod
    def _build_mesh(cfg):
        """("data","model") mesh from TPU.MESH_* (None single-device)."""
        if len(jax.devices()) <= 1:
            return None
        import math

        from mvlpt_tpu.parallel import create_mesh

        n_model = max(1, cfg.TPU.MESH_MODEL)
        n_data = cfg.TPU.MESH_DATA
        if n_data == -1:
            n_data = len(jax.devices()) // n_model
        # the data axis must divide the train batch; shrink to fit
        n_data = math.gcd(n_data, cfg.DATALOADER.TRAIN_X.BATCH_SIZE)
        if n_data * n_model < 2:
            return None
        return create_mesh(
            n_data, n_model, devices=jax.devices()[: n_data * n_model])

    def _device_batch(self, batch: dict, train: bool = True) -> dict:
        """Place one host batch onto device(s).

        Multi-host (jax.process_count() > 1): train batches arrive as
        this host's ``local_batch_slice`` rows (loader.host_shard) and
        are assembled into global arrays; eval batches arrive full on
        every host (replicated eval, parallel/multihost.py docstring).
        """
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()
                    if k in ("image", "label", "task")}

        import numpy as np

        from mvlpt_tpu.parallel import (
            batch_specs, global_batch_arrays, put_tree_on_mesh,
            replicated_specs)

        arrays = {k: np.asarray(v) for k, v in batch.items()
                  if k in ("image", "label", "task")}
        n_data = self.mesh.devices.shape[0]
        n_proc = jax.process_count()
        local_rows = arrays["image"].shape[0]
        if train and n_proc > 1:
            return global_batch_arrays(
                arrays, batch_specs(arrays), self.mesh,
                global_batch=local_rows * n_proc)
        if local_rows % n_data == 0 and n_proc == 1:
            return global_batch_arrays(
                arrays, batch_specs(arrays), self.mesh,
                global_batch=local_rows)
        # eval under multi-host stays REPLICATED (the documented contract
        # in parallel/multihost.py): sharding rows over the data axis
        # would leave eval logits spanning non-addressable devices, and
        # test()'s np.asarray on them would raise. Replicated logits are
        # fully addressable on every host.
        return put_tree_on_mesh(arrays, replicated_specs(arrays), self.mesh)

    # ------------------------------------------------------------------ train
    def train(self):
        cfg = self.cfg
        if cfg.RESUME:
            self.resume_from_checkpoint(cfg.RESUME)
        start = time.time()
        for self.epoch in range(self.epoch, self.max_epoch):
            self.run_epoch()
            self.after_epoch()
        self.after_train()
        elapsed = round(time.time() - start)
        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")

    def run_epoch(self):
        window = max(1, int(self.cfg.TRAIN.STEPS_PER_DISPATCH))
        if window > 1:
            return self._run_epoch_windowed(window)
        return self._run_epoch_plain()

    def _run_epoch_plain(self):
        """One jitted step per loader batch (the window=1 path; also the
        path trainers without the multi-step model protocol use —
        FinetuneCLIP overrides run_epoch to come here directly)."""
        meter = MetricMeter()
        num_batches = len(self.train_loader_x)
        rng = jax.random.PRNGKey(max(self.cfg.SEED, 0) * 131 + self.epoch)
        for batch_idx, batch in enumerate(self.train_loader_x):
            step_rng = jax.random.fold_in(rng, batch_idx)
            device_batch = self._device_batch(batch)
            self.state, metrics = self.train_step(
                self.state, self.backbone, self.consts, device_batch, step_rng)
            meter.update({k: v for k, v in metrics.items()})
            if "task" in batch:
                meter.update({"num_tasks": len(set(batch["task"].tolist()))})
            if (batch_idx + 1) % max(1, self.cfg.TRAIN.PRINT_FREQ) == 0:
                lr = float(self.lr_schedule(self.state.step - 1))
                print(f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                      f"batch [{batch_idx + 1}/{num_batches}] "
                      f"{meter.summary()} lr {lr:.4e}")

    def _stage_window(self, stacked: dict) -> dict:
        """Place a stacked (K, B, ...) window on device(s).

        uint8 (DEVICE_NORMALIZE) stages as-is — half the bytes of bf16;
        otherwise images stage in the compute dtype the model casts to
        anyway. Under a mesh the window shards as (None, "data"):
        step axis replicated, batch rows over the data axis — the same
        per-step placement the non-windowed path uses, so the scanned
        step's collectives are identical. Multi-host: each host holds
        its local_batch_slice rows of axis 1 and the global window is
        assembled process-locally (parallel/multihost.py)."""
        if stacked["image"].dtype != np.uint8:
            # host-side cast so the H2D transfer itself is half-width
            stacked = dict(stacked, image=stacked["image"].astype(
                jnp.dtype(self.model.compute_dtype)))

        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in stacked.items()}

        from jax.sharding import NamedSharding, PartitionSpec as P

        def spec(v):
            return P(None, "data") if np.ndim(v) >= 2 else P(None)

        n_proc = jax.process_count()
        out = {}
        for k, v in stacked.items():
            sharding = NamedSharding(self.mesh, spec(v))
            if n_proc == 1:
                out[k] = jax.device_put(v, sharding)
            else:
                gshape = (v.shape[0], v.shape[1] * n_proc) + v.shape[2:]
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, gshape)
        return out

    def _run_epoch_windowed(self, window: int):
        """Stage `window` loader batches, run them in ONE jitted scan
        (make_train_step_multi) — amortizes per-dispatch host latency.
        Same optimizer/schedule math as the per-batch path; the
        per-step dropout keys come from a nested fold
        (fold_in(fold_in(rng, first_idx), pos)) — a different but
        equally deterministic stream than the flat per-batch fold."""
        import numpy as np

        meter = MetricMeter()
        num_batches = len(self.train_loader_x)
        # Adaptive clamp: an epoch shorter than the configured window
        # must still get windowed dispatch (one scan over the whole
        # epoch), not fall back to per-batch — few-shot epochs (e.g.
        # 16-shot x batch 32 = ~50 steps) are exactly the runs that
        # used to miss the window entirely.
        window = max(1, min(window, num_batches))
        if window < 2:
            return self._run_epoch_plain()
        min_tail = max(0, int(self.cfg.TRAIN.WINDOW_MIN_TAIL))
        rng = jax.random.PRNGKey(max(self.cfg.SEED, 0) * 131 + self.epoch)
        if self.train_step_multi is None:
            from mvlpt_tpu.train.train_step import make_train_step_multi

            self.train_step_multi = make_train_step_multi(
                self.model, self.tx, self.task_ranges,
                pre_embed=bool(self.cfg.TPU.PRE_EMBED_WINDOW),
                normalize=self._normalize)
        pending: list[dict] = []
        done = 0

        def flush():
            nonlocal done
            if not pending:
                return
            if len(pending) < window and not (
                    min_tail and len(pending) >= min_tail):
                # Short tail: run through the single-step path, which
                # is already compiled — a scan program for a tiny K
                # would not amortize its compile. Tails >= min_tail DO
                # scan (branch below): jit caches one program per
                # distinct K, and the tail length N % window is the
                # same every epoch, so that is exactly one extra
                # compile for the whole run.
                for pos, b in enumerate(pending):
                    step_rng = jax.random.fold_in(rng, done + pos)
                    self.state, metrics = self.train_step(
                        self.state, self.backbone, self.consts,
                        self._device_batch(b), step_rng)
                    meter.update({k: v for k, v in metrics.items()})
            else:
                keys = ("image", "label", "task")
                stacked = {
                    k: np.stack([b[k] for b in pending])
                    for k in keys if k in pending[0]
                }
                stacked = self._stage_window(stacked)
                win_rng = jax.random.fold_in(rng, done)
                self.state, mstack = self.train_step_multi(
                    self.state, self.backbone, self.consts, stacked, win_rng)
                # one meter entry per step (the window mean, pushed K
                # times) so the rolling average weights every step
                # equally without K per-element device slices (each
                # would be its own ~1.4 ms dispatch on this tunnel)
                means = {k: jnp.mean(v) for k, v in mstack.items()}
                for _ in range(len(pending)):
                    meter.update(means)
            for b in pending:
                if "task" in b:
                    meter.update(
                        {"num_tasks": len(set(b["task"].tolist()))})
            done_new = done + len(pending)
            pending.clear()
            done = done_new
            if done % max(1, self.cfg.TRAIN.PRINT_FREQ) < window:
                lr = float(self.lr_schedule(self.state.step - 1))
                print(f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                      f"batch [{done}/{num_batches}] "
                      f"{meter.summary()} lr {lr:.4e}")

        for batch in self.train_loader_x:
            pending.append(batch)
            if len(pending) == window:
                flush()
        flush()

    def after_epoch(self):
        cfg = self.cfg
        last_epoch = (self.epoch + 1) == self.max_epoch
        do_test = not cfg.TEST.NO_TEST
        meet_freq = (cfg.TRAIN.CHECKPOINT_FREQ > 0 and
                     (self.epoch + 1) % cfg.TRAIN.CHECKPOINT_FREQ == 0)
        if do_test and cfg.TEST.FINAL_MODEL == "best_val" and self.val_loader:
            result = self.test(split="val")
            if result > self.best_result:
                self.best_result = result
                self.save_checkpoint(best=True, val_result=result)
        if meet_freq or last_epoch:
            self.save_checkpoint(val_result=self.best_result)

    def after_train(self):
        cfg = self.cfg
        if not cfg.TEST.NO_TEST:
            if cfg.TEST.FINAL_MODEL == "best_val" and self.val_loader:
                print("Deploy the model with the best val performance")
                best = prompt_io.checkpoint_path(self.output_dir)
                if os.path.exists(best):
                    self.load_model(self.output_dir)
            self.test()
        self.writer.close()

    # ------------------------------------------------------------- inference
    def model_inference(self, images, tasks=None):
        batch = {"image": images}
        if tasks is not None:
            batch["task"] = tasks
        batch = self._device_batch(batch, train=False)
        if getattr(self, "_eval_text", None) is not None:
            return self.eval_step_cached(
                self.backbone, self.state.prompt_params, self._eval_text,
                batch)
        return self.eval_step(self.backbone, self.state.prompt_params,
                              self.consts, batch)

    def test(self, split=None) -> float:
        """Per-task evaluation (mvlpt.py:989-1088)."""
        cfg = self.cfg
        if split is None:
            split = cfg.TEST.SPLIT
        if split == "val" and self.val_loader is not None:
            loader = self.val_loader
        else:
            split = "test"
            loader = self.test_loader
        print(f"Evaluate on the *{split}* set")

        self.evaluator.reset()
        elevater_pred, elevater_true = [], []
        task_eval = {}
        if self.multi_task:
            if cfg.DATASET.COOP:
                task_eval = {t: self.evaluator.clone() for t in self.dm._task_names}
            else:
                task_eval = {t: {"y_pred": [], "y_true": []}
                             for t in self.dm._task_names}

        def _dispatch(b):
            return self.model_inference(
                jnp.asarray(b["image"]),
                jnp.asarray(b["task"]) if "task" in b else None)

        # subclasses that re-build their own inference (FinetuneCLIP)
        # may not construct the cached-text fast path — fall back then
        if getattr(self, "_eval_text_fn", None) is not None:
            # one text-tower pass for the whole split (prompts frozen)
            self._eval_text = self._eval_text_fn(
                self.backbone, self.state.prompt_params, self.consts)
        try:
            return self._test_loop(loader, _dispatch, split, task_eval,
                                   elevater_pred, elevater_true)
        finally:
            self._eval_text = None  # prompts train on after test()

    def _test_loop(self, loader, _dispatch, split, task_eval,
                   elevater_pred, elevater_true) -> float:
        cfg = self.cfg
        from mvlpt_tpu.utils.pipeline import pipelined_inference

        for logits_full, batch in pipelined_inference(loader, _dispatch):
            n_valid = batch.get("n_valid", len(batch["image"]))
            tasks = batch.get("task")
            logits = logits_full[:n_valid]
            labels = np.asarray(batch["label"])[:n_valid]
            if cfg.DATASET.COOP:
                self.evaluator.process(logits, labels)
            elif not self.multi_task:
                # only the single-task branch consumes these; multitask
                # keeps per-task copies in task_eval (avoids holding the
                # full (N, n_global) logit matrix twice)
                elevater_pred.append(logits)
                elevater_true.append(labels)
            if tasks is not None:
                tasks_np = np.asarray(batch["task"])[:n_valid]
                for out, lab, tid in zip(logits, labels, tasks_np):
                    task = self.dm._id2task[int(tid)]
                    if cfg.DATASET.COOP:
                        lo, hi = self.dm._task_class_idx[task]
                        task_eval[task].process(out[None, lo:hi],
                                                np.asarray([lab - lo]))
                    else:
                        task_eval[task]["y_pred"].append(out[None])
                        task_eval[task]["y_true"].append(lab[None])

        results_overall = {}
        for task, ev in task_eval.items():
            print(f"evaluate on the *{task}* !")
            if cfg.DATASET.COOP:
                results = ev.evaluate()
                results_overall[task] = results["accuracy"]
            else:
                y_true = np.concatenate(ev["y_true"], axis=0)
                y_pred = np.concatenate(ev["y_pred"], axis=0)
                lo, hi = self.dm._task_class_idx[task]
                y_true, y_pred = y_true[:, lo:hi], y_pred[:, lo:hi]
                if self.dm._metric_name[task] == "accuracy":
                    y_true = np.argmax(y_true, axis=-1)
                value = self.dm._metric[task](y_true, y_pred)
                results = {self.dm._metric_name[task]: value}
                results_overall[task] = value
            print("results", results)
            for k, v in results.items():
                self.writer.write_scalar(f"{split}/{task}/{k}", v, self.epoch)

        print("Overall evaluation !")
        if self.multi_task:
            evalkey = cfg.DATASET.MULTITASK_EVALKEY
            if evalkey == "average":
                results = {"average": sum(results_overall.values())
                           / max(1, len(results_overall))}
            else:
                assert evalkey in results_overall
                results = {evalkey: results_overall[evalkey]}
        elif not cfg.DATASET.COOP:
            y_true = np.concatenate(elevater_true, axis=0)
            y_pred = np.concatenate(elevater_pred, axis=0)
            results = {self.dm._metric_name: self.dm._metric(y_true, y_pred)}
        else:
            results = self.evaluator.evaluate()
        print("results", results)
        for k, v in results.items():
            self.writer.write_scalar(f"/{split}/{k}", v, self.epoch)
        return float(list(results.values())[0])

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, best: bool = False, val_result=None):
        if val_result is not None and not np.isfinite(val_result):
            # last_step/NO_TEST runs pass the -inf best_result sentinel;
            # persist None (Dassl checkpoints carry a real value or
            # nothing) so averaging/export never see -inf.
            val_result = None
        path = prompt_io.checkpoint_path(
            self.output_dir, epoch=None if best else self.epoch + 1)
        # opt_state/step ride along for exact resume (reference-written
        # checkpoints lack them and resume with fresh optimizer state)
        extra = {
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
        }
        prompt_io.save_prompt_checkpoint(
            path, self.state.prompt_params, self.epoch + 1, val_result,
            extra=extra)
        print(f"Checkpoint saved to {path}")

    def load_model(self, directory, epoch=None):
        """Warm start / eval load (mvlpt.py:1090-1125)."""
        if not directory:
            print("Note that load_model() is skipped as no pretrained model "
                  "is given")
            return
        path = prompt_io.find_checkpoint(directory, epoch)
        if not os.path.exists(path):
            raise FileNotFoundError(f'Model not found at "{path}"')
        payload = prompt_io.load_prompt_checkpoint(path)
        print(f'Loading weights to prompt_learner from "{path}" '
              f'(epoch = {payload["epoch"]})')
        params, loaded, skipped = prompt_io.apply_state_dict(
            self.state.prompt_params, payload["state_dict"])
        if skipped:
            print(f"  skipped keys: {skipped}")
        self.state = init_train_state(params, self.tx)

    def resume_from_checkpoint(self, directory):
        epochs = prompt_io.list_epoch_checkpoints(directory)
        if not epochs:
            print(f"No checkpoint found in {directory}, starting fresh")
            return
        payload = prompt_io.load_prompt_checkpoint(
            prompt_io.checkpoint_path(directory, epochs[-1]))
        params, _, _ = prompt_io.apply_state_dict(
            self.state.prompt_params, payload["state_dict"])
        self.state = init_train_state(params, self.tx)
        self.epoch = payload["epoch"]
        # Restore the best-val watermark (save_checkpoint stores it as
        # the epoch checkpoint's val_result): without it a resumed
        # best_val run would clobber model-best.pth.tar with the first
        # post-resume val result, however much worse than the best.
        val = payload.get("val_result")
        if val is not None and np.isfinite(val):
            self.best_result = max(self.best_result, float(val))
        # The epoch checkpoint's watermark is stale whenever model-best
        # was updated AFTER it was written (CHECKPOINT_FREQ > 1): a
        # crash between the two would let a worse post-resume val
        # clobber the true best. model-best.pth.tar carries the real
        # watermark — consult it too.
        best_path = prompt_io.checkpoint_path(directory)
        if os.path.exists(best_path):
            best_val = prompt_io.load_prompt_checkpoint(
                best_path).get("val_result")
            if best_val is not None and np.isfinite(best_val):
                self.best_result = max(self.best_result, float(best_val))
        # restore optimizer momentum + schedule position; older /
        # reference-format checkpoints lack these — momentum resumes
        # fresh, but the schedule count (which lives INSIDE optax's
        # ScaleByScheduleState, not in TrainState.step) is always
        # fast-forwarded so the LR does not restart from step 0
        step = payload.get("step", self.epoch * self.steps_per_epoch)
        opt_state = payload.get("opt_state")
        restored = False
        if opt_state is not None:
            try:
                opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
                restored = jax.tree_util.tree_structure(
                    opt_state) == jax.tree_util.tree_structure(
                    self.state.opt_state)
            except Exception:
                restored = False
        if not restored:
            if opt_state is not None:
                print("  (optimizer state in checkpoint incompatible; "
                      "resuming with fresh momentum)")
            opt_state = _fast_forward_schedule(self.state.opt_state, step)
        self.state = self.state.__class__(
            self.state.prompt_params, opt_state, jnp.asarray(step, jnp.int32))
        print(f"Resumed from epoch {self.epoch} (step {step})")


@TRAINER_REGISTRY.register()
class MVLPT(PromptTrainer):
    """Multitask vision-language prompt tuning (mvlpt.py:827)."""

    trainer_cfg_key = "MVLPT"


@TRAINER_REGISTRY.register()
class CoOp(PromptTrainer):
    """Text-context prompt tuning (coop.py:502); spec from TRAINER.COOP."""

    trainer_cfg_key = "COOP"

    def check_cfg(self):
        assert self.cfg.TRAINER.COOP.PREC in ("fp16", "fp32", "amp", "bf16")

    def build_spec(self, clip_cfg, classnames):
        t = self.cfg.TRAINER.COOP
        n_ctx = t.N_CTX
        if t.CTX_INIT:
            n_ctx = len(t.CTX_INIT.replace("_", " ").split(" "))
        context_length = clip_cfg.context_length
        if self.cfg.TRAINER.CUT_CONTEXTLEN:
            context_length = compute_cut_context_length(
                classnames, n_ctx, clip_cfg.context_length,
                ctx_init=t.CTX_INIT)
        return PromptSpec(
            n_cls=len(classnames), coop_n_ctx=n_ctx, coop_csc=t.CSC,
            class_token_position=t.CLASS_TOKEN_POSITION,
            context_length=context_length,
            vision_layers=clip_cfg.vision_layers,
            vision_width=clip_cfg.vision_width,
            text_width=clip_cfg.transformer_width,
            embed_dim=clip_cfg.embed_dim,
            vision_patch_size=clip_cfg.vision_patch_size)

    def ctx_inits(self):
        return self.cfg.TRAINER.COOP.CTX_INIT, ""


@TRAINER_REGISTRY.register()
class CoCoOp(PromptTrainer):
    """Conditional prompt tuning (cocoop.py:197); spec from TRAINER.COCOOP."""

    trainer_cfg_key = "COCOOP"

    def check_cfg(self):
        assert self.cfg.TRAINER.COCOOP.PREC in ("fp16", "fp32", "amp", "bf16")

    def build_spec(self, clip_cfg, classnames):
        t = self.cfg.TRAINER.COCOOP
        n_ctx = t.N_CTX
        if t.CTX_INIT:
            n_ctx = len(t.CTX_INIT.replace("_", " ").split(" "))
        context_length = clip_cfg.context_length
        if self.cfg.TRAINER.CUT_CONTEXTLEN:
            context_length = compute_cut_context_length(
                classnames, n_ctx, clip_cfg.context_length,
                ctx_init=t.CTX_INIT)
        return PromptSpec(
            n_cls=len(classnames), cocoop_n_ctx=n_ctx,
            context_length=context_length,
            vision_layers=clip_cfg.vision_layers,
            vision_width=clip_cfg.vision_width,
            text_width=clip_cfg.transformer_width,
            embed_dim=clip_cfg.embed_dim,
            vision_patch_size=clip_cfg.vision_patch_size)

    def ctx_inits(self):
        return "", self.cfg.TRAINER.COCOOP.CTX_INIT


def build_trainer(cfg):
    return TRAINER_REGISTRY.get(cfg.TRAINER.NAME)(cfg)
