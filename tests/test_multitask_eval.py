"""Multitask test() routing semantics (mvlpt.py:989-1088) checked with
controlled logits: per-task evaluator slicing, per-task metrics over
global-class k-hots, overall average vs MULTITASK_EVALKEY selection."""

import numpy as np
import pytest

from mvlpt_tpu.cli.train import build_parser, main
from tests.util_fixtures import make_coop_dataset, make_elevater_task

TINY = [
    "OPTIM.MAX_EPOCH", "1", "DATALOADER.TRAIN_X.BATCH_SIZE", "4",
    "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
    "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
    "TRAINER.MVLPT.COOP.N_CTX", "2", "TEST.NO_TEST", "True",
]


@pytest.fixture(autouse=True)
def random_clip(monkeypatch):
    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    from mvlpt_tpu.core import clip as cc

    monkeypatch.setitem(cc.VIT_ARCHS, "ViT-B/32", dict(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8))
    monkeypatch.setitem(cc._TEXT_ARCHS, 16, dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2))


def _trainer_coop_mt(tmp_path, extra=()):
    make_coop_dataset(tmp_path / "d", "oxford_pets", ("a", "b"))
    make_coop_dataset(tmp_path / "d", "caltech-101", ("c", "d", "e"),
                      split_name="split_zhou_Caltech101.json",
                      image_subdir="101_ObjectCategories")
    return main(build_parser().parse_args([
        "--root", str(tmp_path / "d"), "--output-dir", str(tmp_path / "o"),
        "--trainer", "MVLPT", "--dataset-coop", "--multi-task",
        "--dataset", "OxfordPets,Caltech101", "--seed", "1", "--no-train",
        *TINY, *extra,
    ]))


def test_per_task_routing_with_oracle_logits(tmp_path):
    trainer = _trainer_coop_mt(tmp_path)

    # oracle: always predicts the TRUE global label -> 100% everywhere
    def oracle(images, tasks=None):
        labels = oracle.labels.pop(0)
        out = np.full((len(labels), trainer.num_classes), -5.0, np.float32)
        out[np.arange(len(labels)), labels] = 5.0
        return out

    labels_per_batch = []
    for batch in trainer.test_loader:
        labels_per_batch.append(np.asarray(batch["label"])[: batch["n_valid"]])
    oracle.labels = list(labels_per_batch)
    trainer.model_inference = oracle
    assert trainer.test() == pytest.approx(100.0)

    # adversary: predicts the right task range but wrong class within it
    def wrongly(images, tasks=None):
        labels = wrongly.labels.pop(0)
        out = np.full((len(labels), trainer.num_classes), -5.0, np.float32)
        for i, l in enumerate(labels):
            lo, hi = (0, 2) if l < 2 else (2, 5)
            out[i, lo + (l - lo + 1) % (hi - lo)] = 5.0
        return out

    wrongly.labels = list(labels_per_batch)
    trainer.model_inference = wrongly
    assert trainer.test() == pytest.approx(0.0)


def test_multitask_evalkey_selects_single_task(tmp_path):
    trainer = _trainer_coop_mt(
        tmp_path, extra=["DATASET.MULTITASK_EVALKEY", "OxfordPets"])

    # correct on OxfordPets (labels 0-1), wrong on Caltech101 (2-4)
    def mixed(images, tasks=None):
        labels = mixed.labels.pop(0)
        out = np.full((len(labels), trainer.num_classes), -5.0, np.float32)
        for i, l in enumerate(labels):
            out[i, l if l < 2 else (2 + (l - 1) % 3)] = 5.0
        return out

    mixed.labels = [np.asarray(b["label"])[: b["n_valid"]]
                    for b in trainer.test_loader]
    trainer.model_inference = mixed
    assert trainer.test() == pytest.approx(100.0)  # pets-only key


def test_elevater_multitask_metric_slicing(tmp_path):
    make_elevater_task(tmp_path / "d", "cifar-10", 10, n_train=12, n_test=8)
    make_elevater_task(tmp_path / "d", "voc-2007-classification", 20,
                       n_train=30, n_test=8, multilabel=True)
    trainer = main(build_parser().parse_args([
        "--root", str(tmp_path / "d"), "--output-dir", str(tmp_path / "o"),
        "--trainer", "MVLPT", "--multi-task",
        "--dataset", "cifar-10,voc-2007-classification",
        "--seed", "1", "--shots", "3", "--no-train",
        *TINY,
    ]))

    def oracle(images, tasks=None):
        khots = oracle.labels.pop(0)
        return np.where(khots > 0, 5.0, -5.0).astype(np.float32)

    all_labels = [np.asarray(b["label"])[: b["n_valid"]]
                  for b in trainer.test_loader]
    all_tasks = [np.asarray(b["task"])[: b["n_valid"]]
                 for b in trainer.test_loader]
    oracle.labels = list(all_labels)
    trainer.model_inference = oracle

    # expected: per-task metric of the oracle logits (classes with zero
    # positives in the tiny VOC split legitimately drag its mAP < 1)
    from mvlpt_tpu.evaluation.metrics import accuracy, map_11_points

    y = np.concatenate(all_labels)
    t = np.concatenate(all_tasks)
    logits = np.where(y > 0, 5.0, -5.0)
    lo_c, hi_c = trainer.dm._task_class_idx["cifar-10"]
    lo_v, hi_v = trainer.dm._task_class_idx["voc-2007-classification"]
    exp_cifar = accuracy(np.argmax(y[t == 0][:, lo_c:hi_c], -1),
                         logits[t == 0][:, lo_c:hi_c])
    exp_voc = map_11_points(y[t == 1][:, lo_v:hi_v],
                            logits[t == 1][:, lo_v:hi_v])
    assert exp_cifar == pytest.approx(1.0)
    want = (exp_cifar + exp_voc) / 2
    assert trainer.test() == pytest.approx(want)
