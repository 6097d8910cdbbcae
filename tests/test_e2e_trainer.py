"""End-to-end trainer tests through the CLI surface (SURVEY.md §4 item 6):
tiny synthetic datasets + random-init CLIP, few epochs, checking the
checkpoint/best-val/eval-only/warm-start/resume contracts."""

import os

import numpy as np
import pytest

from mvlpt_tpu.cli.train import build_parser, main
from tests.util_fixtures import make_coop_dataset, make_elevater_task

TINY_OPTS = [
    "OPTIM.MAX_EPOCH", "2", "OPTIM.LR", "0.05", "OPTIM.WARMUP_EPOCH", "0",
    "OPTIM.LR_SCHEDULER", "cosine",
    "DATALOADER.TRAIN_X.BATCH_SIZE", "4", "DATALOADER.TEST.BATCH_SIZE", "4",
    "DATALOADER.NUM_WORKERS", "0",
    "INPUT.SIZE", "(32, 32)",
    "INPUT.TRANSFORMS", "('random_resized_crop', 'random_flip', 'normalize')",
    "MODEL.BACKBONE.NAME", "ViT-B/32",
    "TRAINER.MVLPT.COOP.N_CTX", "2", "TRAINER.MVLPT.VPT.N_CTX", "2",
    "TRAINER.MVLPT.PROJECT_DIM", "8",
    "TEST.FINAL_MODEL", "best_val",
    "TRAIN.PRINT_FREQ", "1",
]


@pytest.fixture(autouse=True)
def random_clip(monkeypatch):
    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    # tiny towers for speed: monkeypatch the arch table
    from mvlpt_tpu.core import clip as cc

    monkeypatch.setitem(cc.VIT_ARCHS, "ViT-B/32", dict(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8))
    monkeypatch.setitem(cc._TEXT_ARCHS, 16, dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2))


def _run(argv):
    return main(build_parser().parse_args(argv))


def test_mvlpt_coop_universe_end_to_end(tmp_path):
    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "2", "--cut-contextlen",
        *TINY_OPTS,
    ])
    # checkpoints with reference-compatible names
    assert os.path.exists(os.path.join(out, "prompt_learner", "model-best.pth.tar"))
    assert os.path.exists(os.path.join(out, "prompt_learner", "model.pth.tar-2"))
    assert os.path.exists(os.path.join(out, "log.txt"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "results" in log

    # eval-only from the trained dir
    trainer2 = _run([
        "--root", str(tmp_path / "data"), "--output-dir", str(tmp_path / "out2"),
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "2", "--cut-contextlen", "--eval-only",
        "--model-dir", out,
        *TINY_OPTS,
    ])
    a = np.concatenate([np.asarray(x).ravel() for x in
                        _leaves(trainer.state.prompt_params)])
    b = np.concatenate([np.asarray(x).ravel() for x in
                        _leaves(trainer2.state.prompt_params)])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


@pytest.mark.slow
def test_multitask_coop_training(tmp_path):
    make_coop_dataset(tmp_path / "data")
    make_coop_dataset(tmp_path / "data", "caltech-101", ("face", "leopard"),
                      split_name="split_zhou_Caltech101.json",
                      image_subdir="101_ObjectCategories")
    out = str(tmp_path / "out_mt")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--multi-task",
        "--dataset", "OxfordPets,Caltech101",
        "--seed", "1", "--shots", "2",
        *TINY_OPTS,
    ])
    assert trainer.num_classes == 4
    assert trainer.dm._task_class_idx["Caltech101"] == (2, 4)


@pytest.mark.slow
def test_elevater_single_task_training(tmp_path):
    make_elevater_task(tmp_path / "data", "cifar-10", 10, n_train=20, n_test=8)
    out = str(tmp_path / "out_ev")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset", "cifar-10",
        "--seed", "1", "--shots", "2",
        *TINY_OPTS,
    ])
    assert trainer.num_classes == 10


def test_zeroshot_clip(tmp_path):
    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out_zs")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "ZeroshotCLIP", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--no-train", "--eval-only",
        "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
        "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
        "DATASET.NAME", "OxfordPets",
    ])
    assert trainer.text_features.shape[0] == 2


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out_resume")
    flags = [
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "2",
    ]
    opts = [*TINY_OPTS, "TRAIN.CHECKPOINT_FREQ", "1"]
    first = _run(flags + opts)
    assert np.isfinite(first.best_result)
    # stray near-matches (manual backup, in-flight temp) must not break
    # the resume scan — only exact model.pth.tar-N files count
    pdir = os.path.join(out, "prompt_learner")
    for stray in ("model.pth.tar-2.bak", "model.pth.tar-1.tmp"):
        with open(os.path.join(pdir, stray), "w") as f:
            f.write("junk")
    # resume: checkpoints exist up to epoch 2 == MAX_EPOCH -> no more
    # training, straight to final test
    trainer = _run(flags + ["--resume", out] + opts)
    assert trainer.epoch == 2
    # the best-val watermark came back from the epoch checkpoint, so a
    # longer resumed run can't clobber model-best with a worse result
    assert trainer.best_result == pytest.approx(first.best_result)
    # With CHECKPOINT_FREQ > 1 the newest epoch checkpoint's watermark
    # can be STALE (model-best updated after it was written). Resume
    # must consult model-best.pth.tar's own val_result too.
    from mvlpt_tpu.checkpoint.prompt_io import (
        checkpoint_path, load_prompt_checkpoint, save_prompt_checkpoint)
    best_path = checkpoint_path(out)
    best = load_prompt_checkpoint(best_path)
    from mvlpt_tpu.checkpoint.prompt_io import unflatten_params
    save_prompt_checkpoint(best_path, unflatten_params(best["state_dict"]),
                           epoch=best["epoch"],
                           val_result=first.best_result + 10.0)
    trainer = _run(flags + ["--resume", out] + opts)
    assert trainer.best_result == pytest.approx(first.best_result + 10.0)


def test_last_step_checkpoint_val_result_is_none(tmp_path):
    """last_step runs never track a val result; the epoch checkpoint
    must persist val_result=None, not the -inf best_result sentinel
    (which would poison avg_ckpt means and torch exports)."""
    from mvlpt_tpu.checkpoint.prompt_io import (
        checkpoint_path, load_prompt_checkpoint)

    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out_last")
    opts = list(TINY_OPTS)
    opts[opts.index("best_val")] = "last_step"
    opts[opts.index("OPTIM.MAX_EPOCH") + 1] = "1"
    _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "2", *opts,
    ])
    payload = load_prompt_checkpoint(checkpoint_path(out, 1))
    assert payload["val_result"] is None


def test_zeroshot_ensembling(tmp_path):
    make_coop_dataset(tmp_path / "data")
    trainer = _run([
        "--root", str(tmp_path / "data"),
        "--output-dir", str(tmp_path / "out_zs2"),
        "--trainer", "ZeroshotCLIP2", "--dataset-coop",
        "--dataset", "OxfordPets", "--seed", "1", "--no-train", "--eval-only",
        "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
        "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
        "DATASET.NAME", "OxfordPets",
    ])
    # 7 select templates + the pets custom template were ensembled
    assert trainer.text_features.shape == (2, 16)


@pytest.mark.slow
def test_finetune_clip_trainer(tmp_path):
    make_elevater_task(tmp_path / "data", "cifar-10", 10, n_train=16, n_test=8)
    trainer = _run([
        "--root", str(tmp_path / "data"),
        "--output-dir", str(tmp_path / "out_ft"),
        "--trainer", "FinetuneCLIP", "--dataset", "cifar-10",
        "--seed", "1", "--shots", "2",
        "OPTIM.MAX_EPOCH", "2", "OPTIM.LR", "0.01", "OPTIM.WARMUP_EPOCH", "0",
        "OPTIM.STAGED_LR", "True", "OPTIM.BASE_LR_MULT", "0.1",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "4", "DATALOADER.TEST.BATCH_SIZE", "4",
        "DATALOADER.NUM_WORKERS", "0", "INPUT.SIZE", "(32, 32)",
        "MODEL.BACKBONE.NAME", "ViT-B/32", "TEST.FINAL_MODEL", "best_val",
    ])
    assert trainer.state.prompt_params["head"]["kernel"].shape == (16, 10)
    assert os.path.exists(os.path.join(
        str(tmp_path / "out_ft"), "prompt_learner", "model.pth.tar-2"))


@pytest.mark.slow
def test_finetune_clip_tpu_fast_options(tmp_path):
    """FinetuneCLIP under the tpu_fast config knobs: DEVICE_NORMALIZE
    loaders emit raw uint8 (the model must normalize on device — it fed
    0-255 pixels to the tower before the fix) and STEPS_PER_DISPATCH>1
    must fall back to per-batch steps instead of crashing on the
    prompt-model multi-step protocol."""
    import numpy as np

    make_elevater_task(tmp_path / "data", "cifar-10", 10, n_train=16,
                       n_test=8)
    trainer = _run([
        "--root", str(tmp_path / "data"),
        "--output-dir", str(tmp_path / "out_ftw"),
        "--trainer", "FinetuneCLIP", "--dataset", "cifar-10",
        "--seed", "1", "--shots", "2",
        "OPTIM.MAX_EPOCH", "1", "OPTIM.LR", "0.01", "OPTIM.WARMUP_EPOCH", "0",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "4", "DATALOADER.TEST.BATCH_SIZE", "4",
        "DATALOADER.NUM_WORKERS", "0", "INPUT.SIZE", "(32, 32)",
        "MODEL.BACKBONE.NAME", "ViT-B/32", "TEST.FINAL_MODEL", "last_step",
        "TPU.DEVICE_NORMALIZE", "True", "TRAIN.STEPS_PER_DISPATCH", "8",
    ])
    assert trainer.model.normalize is not None
    # the uint8 batch is normalized on device: a raw-pixel forward of the
    # same batch must differ from the model's logits
    batch = next(iter(trainer.test_loader))
    img = batch["image"]
    assert img.dtype == np.uint8  # DEVICE_NORMALIZE loader contract
    logits = np.asarray(trainer.model(
        {}, trainer.state.prompt_params, None, jnp_asarray(img)))
    import dataclasses as _dc

    raw_model = _dc.replace(trainer.model, normalize=None)
    logits_raw = np.asarray(raw_model(
        {}, trainer.state.prompt_params, None, jnp_asarray(img)))
    assert not np.allclose(logits, logits_raw)
    assert np.isfinite(logits).all()


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


@pytest.mark.slow
def test_warm_start_transfer_training(tmp_path):
    """Target-task adaptation (SURVEY §3.3): --model-dir loads the source
    prompt, then training continues on the target task."""
    import jax

    make_coop_dataset(tmp_path / "data")
    src = str(tmp_path / "src")
    _run(["--root", str(tmp_path / "data"), "--output-dir", src,
          "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
          "--seed", "1", "--shots", "2", *TINY_OPTS])

    # target task with DIFFERENT classnames -> prefix/suffix consts rebuilt
    make_coop_dataset(tmp_path / "data", "caltech-101", ("face", "leopard"),
                      split_name="split_zhou_Caltech101.json",
                      image_subdir="101_ObjectCategories")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", str(tmp_path / "tgt"),
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "Caltech101",
        "--seed", "2", "--shots", "2", "--model-dir", src, *TINY_OPTS])
    # trained further on the target (checkpoints written, params finite)
    assert os.path.exists(os.path.join(
        str(tmp_path / "tgt"), "prompt_learner", "model-best.pth.tar"))
    for leaf in jax.tree_util.tree_leaves(trainer.state.prompt_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_zeroshot_on_elevater_task(tmp_path):
    """Zero-shot eval over an ELEVATER manifest task resolves templates
    from the bundled metadata."""
    make_elevater_task(tmp_path / "data", "cifar-10", 10, n_train=8, n_test=8)
    trainer = _run([
        "--root", str(tmp_path / "data"),
        "--output-dir", str(tmp_path / "out_zsev"),
        "--trainer", "ZeroshotCLIP", "--dataset", "cifar-10",
        "--seed", "1", "--no-train", "--eval-only",
        "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
        "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
    ])
    assert trainer.text_features.shape == (10, 16)


def test_zeroshot_honors_device_normalize(tmp_path):
    """TPU.DEVICE_NORMALIZE makes loaders emit raw uint8; zero-shot
    inference must normalize on device and produce the same logits as
    the host-normalized float path (same random backbone: PRNGKey init)."""
    import jax.numpy as jnp

    make_elevater_task(tmp_path / "data", "cifar-10", 10, n_train=8,
                       n_test=8)
    common = [
        "--root", str(tmp_path / "data"),
        "--trainer", "ZeroshotCLIP", "--dataset", "cifar-10",
        "--seed", "1", "--no-train", "--eval-only",
        "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
        "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
    ]
    t_f32 = _run(["--output-dir", str(tmp_path / "o_f32"), *common])
    t_u8 = _run(["--output-dir", str(tmp_path / "o_u8"), *common,
                 "TPU.DEVICE_NORMALIZE", "True"])

    b_f32 = next(iter(t_f32.test_loader))
    b_u8 = next(iter(t_u8.test_loader))
    assert b_u8["image"].dtype == np.uint8
    assert b_f32["image"].dtype != np.uint8
    np.testing.assert_array_equal(b_f32["label"], b_u8["label"])
    l_f32 = np.asarray(t_f32.model_inference(jnp.asarray(b_f32["image"])))
    l_u8 = np.asarray(t_u8.model_inference(jnp.asarray(b_u8["image"])))
    np.testing.assert_allclose(l_f32, l_u8, rtol=0, atol=5e-2)


@pytest.mark.slow
def test_single_task_multilabel_training(tmp_path):
    """Single ELEVATER multilabel task (voc-style): k-hot targets through
    the soft-CE path and the 11-pt mAP metric."""
    make_elevater_task(tmp_path / "data", "voc-2007-classification", 20,
                       n_train=40, n_test=8, multilabel=True)
    trainer = _run([
        "--root", str(tmp_path / "data"),
        "--output-dir", str(tmp_path / "out_ml"),
        "--trainer", "MVLPT", "--dataset", "voc-2007-classification",
        "--seed", "1", "--shots", "2",
        *TINY_OPTS,
    ])
    assert trainer.dm._metric_name == "11point_mAP"
    log = open(os.path.join(str(tmp_path / "out_ml"), "log.txt")).read()
    assert "11point_mAP" in log


@pytest.mark.slow
def test_device_normalize_windowed_training(tmp_path):
    """TPU.DEVICE_NORMALIZE (uint8 loader batches, normalize folded into
    the frozen stem) + STEPS_PER_DISPATCH windowed dispatch with a tail
    (5 train batches, window 2 -> two full windows + 1 tail batch through
    the single-step path), eval included — the full round-3 fast path."""
    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out_u8win")
    trainer = _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "8", "--cut-contextlen",
        *TINY_OPTS,
        "TPU.DEVICE_NORMALIZE", "True",
        "TRAIN.STEPS_PER_DISPATCH", "2",
    ])
    # loader produced uint8 (device-side normalization), training ran
    batch = next(iter(trainer.train_loader_x))
    assert batch["image"].dtype == np.uint8
    log = open(os.path.join(out, "log.txt")).read()
    assert "results" in log
    # best-val checkpointing worked through the uint8 eval path
    assert os.path.exists(
        os.path.join(out, "prompt_learner", "model-best.pth.tar"))


@pytest.mark.slow
def test_adaptive_window_clamps_and_scans_tail(tmp_path, monkeypatch):
    """The dispatch window adapts to the epoch (trainer.py
    _run_epoch_windowed): (a) an epoch SHORTER than
    TRAIN.STEPS_PER_DISPATCH is clamped to one full-epoch scan instead
    of silently falling back to per-batch dispatch — the few-shot
    regime (e.g. 16-shot = ~50 steps/epoch at the reference batch 32)
    is exactly where windowing used to disengage; (b) tails of
    >= TRAIN.WINDOW_MIN_TAIL leftover batches run as one scanned
    dispatch of their own length. Both must reproduce the window=1
    optimizer math exactly (these specs use no dropout)."""
    import mvlpt_tpu.train.trainer as trainer_mod

    make_coop_dataset(tmp_path / "data")
    calls = {"single": 0}
    real_make = trainer_mod.make_train_step

    def counting_make(*a, **kw):
        step = real_make(*a, **kw)

        def counted(*sa, **skw):
            calls["single"] += 1
            return step(*sa, **skw)

        return counted

    monkeypatch.setattr(trainer_mod, "make_train_step", counting_make)

    def run(out, *extra):
        return _run([
            "--root", str(tmp_path / "data"), "--output-dir", str(out),
            "--trainer", "MVLPT", "--dataset-coop", "--dataset",
            "OxfordPets", "--seed", "1", "--shots", "8",
            "--cut-contextlen", *TINY_OPTS, "TEST.NO_TEST", "True",
            "TEST.FINAL_MODEL", "last_step", *extra,
        ])

    # baseline: classic per-batch dispatch
    t_ref = run(tmp_path / "o_ref", "TRAIN.STEPS_PER_DISPATCH", "1")
    n_batches = len(t_ref.train_loader_x)
    assert n_batches >= 3 and n_batches % 2 == 1  # odd -> window-2 tail
    assert calls["single"] == 2 * n_batches  # all per-batch, 2 epochs

    # (a) window 8 > epoch length -> clamped to a full-epoch scan;
    # the single-step path must never run
    calls["single"] = 0
    t_clamp = run(tmp_path / "o_clamp", "TRAIN.STEPS_PER_DISPATCH", "8")
    assert calls["single"] == 0

    # (b) window 2 over an odd epoch -> full scans of 2 and a scanned
    # tail of 1 (WINDOW_MIN_TAIL 1); the single-step path must never run
    calls["single"] = 0
    t_tail = run(tmp_path / "o_tail", "TRAIN.STEPS_PER_DISPATCH", "2",
                 "TRAIN.WINDOW_MIN_TAIL", "1")
    assert calls["single"] == 0

    # (b') default WINDOW_MIN_TAIL (8): the 1-batch tail stays on the
    # already-compiled single-step path
    calls["single"] = 0
    run(tmp_path / "o_tail_dflt", "TRAIN.STEPS_PER_DISPATCH", "2")
    assert calls["single"] == 2  # one tail batch per epoch

    ref = np.concatenate([np.asarray(x).ravel()
                          for x in _leaves(t_ref.state.prompt_params)])
    for t in (t_clamp, t_tail):
        got = np.concatenate([np.asarray(x).ravel()
                              for x in _leaves(t.state.prompt_params)])
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_zero_tunable_params_fails_loudly(tmp_path):
    """With all MVLPT N_CTX knobs at their reference defaults (0 —
    train.py:136,144,150), there is nothing to train; torch raises
    'optimizer got an empty parameter list'. Our trainer must also fail
    loudly rather than silently training nothing (grad_norm 0 forever)."""
    make_coop_dataset(tmp_path / "data")
    opts = [o for o in TINY_OPTS]
    for key in ("TRAINER.MVLPT.COOP.N_CTX", "TRAINER.MVLPT.VPT.N_CTX"):
        i = opts.index(key)
        opts[i + 1] = "0"
    with pytest.raises(ValueError, match="No tunable prompt parameters"):
        _run([
            "--root", str(tmp_path / "data"),
            "--output-dir", str(tmp_path / "out_zero"),
            "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
            "--seed", "1", "--shots", "2",
            *opts,
        ])


@pytest.mark.slow
def test_mvlpt_native_backend_end_to_end(tmp_path):
    """Full CLI surface over DATALOADER.BACKEND native (C++ decode/
    resample core): argv -> manager -> native loader -> train -> eval.
    The TPU variant of this drive is the round's /verify run."""
    import mvlpt_tpu.native as native

    if not native.available():
        pytest.skip("native toolchain not available")
    make_coop_dataset(tmp_path / "data")
    out = str(tmp_path / "out_native")
    _run([
        "--root", str(tmp_path / "data"), "--output-dir", out,
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "2", "--cut-contextlen",
        *TINY_OPTS, "DATALOADER.BACKEND", "native", "OPTIM.MAX_EPOCH", "1",
    ])
    log = open(os.path.join(out, "log.txt")).read()
    assert "results" in log
