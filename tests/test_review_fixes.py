"""Regression tests for the round-1 code-review findings."""

import os
import pickle

import numpy as np
import pytest

from tests.util_fixtures import make_coop_dataset


def test_resume_restores_optimizer_state_and_step(tmp_path, monkeypatch):
    """Review finding 1: --resume must restore momentum + schedule step."""
    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    from mvlpt_tpu.core import clip as cc

    monkeypatch.setitem(cc.VIT_ARCHS, "ViT-B/32", dict(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8))
    monkeypatch.setitem(cc._TEXT_ARCHS, 16, dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2))

    from mvlpt_tpu.cli.train import build_parser, main

    make_coop_dataset(tmp_path / "d")
    out = str(tmp_path / "o")
    flags = ["--root", str(tmp_path / "d"), "--output-dir", out,
             "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
             "--seed", "1", "--shots", "2"]
    opts = ["OPTIM.MAX_EPOCH", "3", "OPTIM.LR", "0.05",
            "OPTIM.LR_SCHEDULER", "cosine", "OPTIM.WARMUP_EPOCH", "0",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "4",
            "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
            "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
            "TRAINER.MVLPT.COOP.N_CTX", "2", "TEST.NO_TEST", "True",
            "TRAIN.CHECKPOINT_FREQ", "1"]
    main(build_parser().parse_args(flags + opts))
    trainer = main(build_parser().parse_args(
        flags + ["--resume", out] + opts))
    assert trainer.epoch == 3
    assert int(trainer.state.step) == 3 * trainer.steps_per_epoch
    # momentum buffers restored (non-zero after training)
    import jax

    momenta = [np.abs(np.asarray(x)).sum()
               for x in jax.tree_util.tree_leaves(trainer.state.opt_state)]
    assert any(m > 0 for m in momenta)


def test_yaml_unknown_key_raises(tmp_path):
    """Review finding 7: yaml typos must fail loudly (yacs semantics)."""
    from mvlpt_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    bad = tmp_path / "bad.yaml"
    bad.write_text("TRAINER:\n  MVLPT:\n    VPT:\n      NCTX: 4\n")
    with pytest.raises(KeyError, match="TRAINER.MVLPT.VPT.NCTX"):
        cfg.merge_from_file(str(bad))


def test_train_augmentation_seeded_and_fresh_per_epoch(tmp_path):
    """Review findings 2+6: augmentation deterministic across runs,
    different across epochs."""
    from mvlpt_tpu.data.loader import DataLoader, _TransformedDataset
    from mvlpt_tpu.data.transforms import TrainTransform
    from mvlpt_tpu.data.datum import Datum
    from PIL import Image

    rng = np.random.RandomState(0)
    path = str(tmp_path / "x.jpg")
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(path)
    items = [Datum(impath=path, label=0) for _ in range(4)]

    def run():
        ds = _TransformedDataset(items, TrainTransform(size=32))
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        seed=7, drop_last=True)
        return [b["image"] for b in dl], [b["image"] for b in dl]

    (e1a, e2a), (e1b, e2b) = run(), run()
    # identical across runs with the same seed, even with worker threads
    np.testing.assert_array_equal(e1a[0], e1b[0])
    np.testing.assert_array_equal(e2a[0], e2b[0])
    # fresh augmentation each epoch
    assert not np.array_equal(e1a[0], e2a[0])


def test_tfdata_augmentation_fresh_per_epoch(tmp_path):
    pytest.importorskip("tensorflow")
    from mvlpt_tpu.data.datum import Datum
    from mvlpt_tpu.data.tfdata import TFDataLoader
    from PIL import Image

    rng = np.random.RandomState(0)
    path = str(tmp_path / "x.jpg")
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(path)
    items = [Datum(impath=path, label=i) for i in range(4)]
    dl = TFDataLoader(items, batch_size=4, shuffle=True, size=32,
                      mean=[0.5] * 3, std=[0.25] * 3, seed=1, drop_last=True)
    e1 = next(iter(dl))
    e2 = next(iter(dl))
    by_label1 = e1["image"][np.argsort(e1["label"])]
    by_label2 = e2["image"][np.argsort(e2["label"])]
    assert not np.array_equal(by_label1, by_label2)


def test_foreign_fewshot_cache_fallback(tmp_path):
    """Review finding 4: unreadable reference caches trigger a rebuild
    instead of crashing; 'val'-less caches load."""
    from mvlpt_tpu.data.datum import DatasetBase, Datum

    d = tmp_path / "split_fewshot"
    d.mkdir()
    # unreadable foreign pickle (simulates dassl-pickled Datum objects)
    (d / "shot_2-seed_1.pkl").write_bytes(b"\x80\x04corrupt")
    built = []

    def build():
        built.append(True)
        return [Datum(impath="a", label=0)], []

    train, val = DatasetBase.load_fewshot_cached(str(d), 2, 1, build)
    assert built and train[0].impath == "a"

    # val-less cache (ImageNet reference format)
    with open(d / "shot_4-seed_1.pkl", "wb") as f:
        pickle.dump({"train": [Datum(impath="b", label=1)]}, f)
    train, val = DatasetBase.load_fewshot_cached(str(d), 4, 1, lambda: (1 / 0, 0))
    assert train[0].impath == "b" and val == []


def test_cut_contextlen_accounts_for_ctx_init_tokens():
    """Review finding 5: multi-BPE-token CTX_INIT words must lengthen the
    computed context."""
    from mvlpt_tpu.prompts import compute_cut_context_length

    names = ["cat", "dog"]
    plain = compute_cut_context_length(names, 4)
    # 'photograph' splits into multiple BPE tokens
    with_init = compute_cut_context_length(
        names, 4, ctx_init="a blurry photograph of a")
    assert with_init >= plain
    # and building consts with that init must not overflow
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.prompts import PromptSpec, build_prompt_consts

    cfg = CLIPConfig(embed_dim=16, image_resolution=32, vision_layers=2,
                     vision_width=32, vision_patch_size=8,
                     transformer_width=32, transformer_heads=2,
                     transformer_layers=2, vision_heads_override=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    init = "a blurry photograph of a"
    n_ctx = len(init.split(" "))
    spec = PromptSpec(
        n_cls=2, coop_n_ctx=n_ctx,
        context_length=compute_cut_context_length(names, n_ctx, ctx_init=init),
        text_width=32, vision_layers=2, vision_width=32, embed_dim=16,
        vision_patch_size=8)
    consts = build_prompt_consts(names, spec, params, jnp.float32,
                                 ctx_init=init)
    assert consts.token_prefix.shape[0] == 2


def test_fast_forward_schedule_applies_correct_lr():
    """Second-pass review: the schedule count lives inside optax state —
    resume without a stored opt_state must fast-forward it so the LR
    doesn't restart at the base value."""
    import jax.numpy as jnp
    import optax

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.trainer import _fast_forward_schedule

    cfg = get_cfg_default()
    cfg.OPTIM.LR = 1.0
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = 200
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.OPTIM.MOMENTUM = 0.9
    cfg.OPTIM.WEIGHT_DECAY = 0.0
    tx, schedule = build_optimizer(cfg.OPTIM, steps_per_epoch=1)

    params = jnp.zeros(3)
    state = _fast_forward_schedule(tx.init(params), step=150)
    g = jnp.ones(3)
    updates, _ = tx.update(g, state, params)
    want = -float(schedule(150))  # cosine tail, ~0.146, NOT the base 1.0
    np.testing.assert_allclose(np.asarray(updates), want, rtol=1e-6)
    assert abs(want) < 0.2


def test_roc_auc_binary_two_column():
    from mvlpt_tpu.evaluation.metrics import roc_auc

    y = np.array([0, 1, 1, 0, 1])
    logits = np.stack([-y * 2.0 + 1.0, y * 2.0 - 1.0], axis=1)
    assert roc_auc(y, logits) == 1.0
    # k-hot targets also accepted
    khot = np.eye(2)[y]
    assert roc_auc(khot, logits) == 1.0


def test_multitask_label_offset_handles_aliased_splits():
    """Second-pass review: loaders that alias splits (ImageNet val=test)
    must not be double-offset."""
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.data.datum import DatasetBase, Datum
    from mvlpt_tpu.data.managers import CoopMultitaskDataManager
    from mvlpt_tpu.utils.registry import DATASET_REGISTRY

    class _AliasedDataset(DatasetBase):
        def __init__(self, cfg):
            data = [Datum(impath=f"{i}.jpg", label=i % 2, classname=f"x{i % 2}")
                    for i in range(4)]
            super().__init__(train_x=data, val=data, test=data)  # aliased!

    if "_AliasedDataset" not in DATASET_REGISTRY:
        DATASET_REGISTRY.register(_AliasedDataset, name="_AliasedDataset")

    class _PlainDataset(DatasetBase):
        def __init__(self, cfg):
            data = [Datum(impath=f"{i}.jpg", label=i % 3, classname=f"y{i % 3}")
                    for i in range(6)]
            super().__init__(train_x=list(data), val=list(data), test=list(data))

    if "_PlainDataset" not in DATASET_REGISTRY:
        DATASET_REGISTRY.register(_PlainDataset, name="_PlainDataset")

    cfg = get_cfg_default()
    cfg.DATASET.DATASET = "_PlainDataset,_AliasedDataset"
    cfg.DATASET.COOP = True
    cfg.DATASET.MULTITASK = True
    cfg.DATALOADER.NUM_WORKERS = 0

    import unittest.mock as mock

    with mock.patch("mvlpt_tpu.data.managers.build_data_loader",
                    lambda *a, **k: None):
        dm = CoopMultitaskDataManager(cfg)
    # aliased dataset occupies labels [3, 5); offset applied exactly once
    assert dm._task_class_idx["_AliasedDataset"] == (3, 5)
    assert set(dm.lab2cname) == {0, 1, 2, 3, 4}
