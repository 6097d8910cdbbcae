"""Data layer tests: CoOp loaders (split json, few-shot cache,
subsample), multitask label offsets, ELEVATER manifests + sampling +
splits, transforms, metrics."""

import os

import numpy as np
import pytest

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.data.managers import (
    CoopMultitaskDataManager, ElevaterDataManager,
    ElevaterMultitaskDataManager)
from mvlpt_tpu.data.datum import DatasetBase, Datum
from mvlpt_tpu.evaluation.metrics import get_metric
from tests.util_fixtures import make_coop_dataset, make_elevater_task


@pytest.fixture()
def cfg(tmp_path):
    c = get_cfg_default()
    c.DATASET.ROOT = str(tmp_path)
    c.SEED = 1
    c.DATALOADER.NUM_WORKERS = 0
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    c.DATALOADER.TEST.BATCH_SIZE = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.INTERPOLATION = "bicubic"
    c.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
    return c


def test_coop_single_dataset_and_fewshot_cache(cfg, tmp_path):
    make_coop_dataset(tmp_path)
    cfg.DATASET.DATASET = "OxfordPets"
    cfg.DATASET.COOP = True
    cfg.DATASET.NUM_SHOTS = 2
    dm = CoopMultitaskDataManager(cfg)
    assert dm.num_classes == 2
    assert dm.classnames == ["abyssinian", "beagle"]
    # 2 shots x 2 classes
    assert len(dm.train_loader_x.dataset) == 4
    # few-shot pickle cache created with reference-compatible name
    assert os.path.exists(
        tmp_path / "oxford_pets" / "split_fewshot" / "shot_2-seed_1.pkl")
    batch = next(iter(dm.train_loader_x))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].dtype == np.float32


def test_coop_multitask_label_offsets(cfg, tmp_path):
    make_coop_dataset(tmp_path, "oxford_pets", ("abyssinian", "beagle"))
    make_coop_dataset(tmp_path, "caltech-101", ("face", "leopard", "motorbike"),
                      split_name="split_zhou_Caltech101.json",
                      image_subdir="101_ObjectCategories")
    cfg.DATASET.DATASET = "OxfordPets,Caltech101"
    cfg.DATASET.COOP = True
    cfg.DATASET.MULTITASK = True
    dm = CoopMultitaskDataManager(cfg)
    assert dm.num_classes == 5
    assert dm._task_class_idx == {"OxfordPets": (0, 2), "Caltech101": (2, 5)}
    labels = {d.label for d in dm.test_loader.dataset.items}
    assert labels == {0, 1, 2, 3, 4}
    doms = {d.domain for d in dm.test_loader.dataset.items}
    assert doms == {0, 1}
    batch = next(iter(dm.test_loader))
    assert "task" in batch


def test_subsample_base_new():
    items = [Datum(impath="x", label=i % 4, classname=f"c{i % 4}")
             for i in range(8)]
    (base,) = DatasetBase.subsample_classes(items, subsample="base")
    (new,) = DatasetBase.subsample_classes(items, subsample="new")
    assert {d.label for d in base} == {0, 1} and {d.classname for d in base} == {"c0", "c1"}
    assert {d.label for d in new} == {0, 1} and {d.classname for d in new} == {"c2", "c3"}


def test_elevater_single_task(cfg, tmp_path):
    make_elevater_task(tmp_path, "cifar-10", 10, n_train=20, n_test=8)
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    dm = ElevaterDataManager(cfg)
    assert dm.num_classes == 10
    assert dm._metric_name == "accuracy"
    assert dm.lab2cname[0] == "airplane"
    batch = next(iter(dm.test_loader))
    assert batch["image"].shape[0] == 4
    assert batch["label"].ndim == 1  # multiclass -> int labels


def test_elevater_manifest_metadata_class_count_mismatch(cfg, tmp_path):
    """A manifest whose num_classes disagrees with the metadata classname
    table must fail loudly at load time — the manager builds prompts
    from the metadata names but k-hot targets/offsets from the manifest
    count, so a silent mismatch surfaces as an opaque logit-shape crash
    deep inside the train step."""
    make_elevater_task(tmp_path, "cifar-10", 5, n_train=10, n_test=4)
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    with pytest.raises(ValueError, match="num_classes=5.*10 classes"):
        ElevaterDataManager(cfg)


def test_elevater_manifest_own_classnames_bypass_guard(cfg, tmp_path):
    """A manifest carrying its own 'classnames' is authoritative for its
    local data: the class-count guard must not bind even when the count
    disagrees with the metadata table (e.g. a local 3-class debug slice
    of cifar-10), and the manager must consume the manifest's names."""
    make_elevater_task(tmp_path, "cifar-10", 3, n_train=6, n_test=4,
                       classnames=["cat", "dog", "frog"])
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    dm = ElevaterDataManager(cfg)
    assert dm.num_classes == 3
    assert dm.classnames == ["cat", "dog", "frog"]
    batch = next(iter(dm.test_loader))
    assert int(np.max(batch["label"])) < 3


def test_elevater_manifest_classnames_count_must_match(cfg, tmp_path):
    """Manifest-declared classnames must agree with its own num_classes."""
    make_elevater_task(tmp_path, "cifar-10", 3, n_train=6, n_test=4,
                       classnames=["cat", "dog"])
    cfg.DATASET.DATASET = "cifar-10"
    with pytest.raises(ValueError, match="carries 2 classnames"):
        ElevaterDataManager(cfg)


def test_elevater_nonstrict_placeholder_classnames(cfg, tmp_path):
    """strict_classnames=False (feature-extraction flows that never
    consume classnames) must load a count-mismatched manifest with
    positional placeholder names instead of hard-failing."""
    make_elevater_task(tmp_path, "cifar-10", 3, n_train=6, n_test=4)
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    dm = ElevaterDataManager(cfg, strict_classnames=False)
    assert dm.num_classes == 3
    assert dm.classnames == [f"cifar-10 class {i}" for i in range(3)]


def test_elevater_custom_task_with_own_classnames(cfg, tmp_path):
    """A task outside the metadata registry works when its manifest is
    self-describing (classnames) and a metric override names its metric
    — local custom datasets need no metadata.json entry."""
    make_elevater_task(tmp_path, "my-local-task", 2, n_train=4, n_test=4,
                       classnames=["good", "bad"])
    cfg.DATASET.DATASET = "my-local-task"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    cfg.DATASET.METRIC_OVERRIDES = ["my-local-task=accuracy"]
    dm = ElevaterDataManager(cfg)
    assert dm.num_classes == 2
    assert dm.classnames == ["good", "bad"]


def test_elevater_unknown_task_nonstrict_gets_placeholders(cfg, tmp_path):
    """A task outside the metadata registry whose manifest carries only
    num_classes (e.g. built from an index TSV) must still load for
    feature-extraction flows (strict_classnames=False): positional
    placeholders, not a KeyError from the metadata lookup."""
    make_elevater_task(tmp_path, "my-tsv-task", 3, n_train=6, n_test=4)
    cfg.DATASET.DATASET = "my-tsv-task"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    cfg.DATASET.METRIC_OVERRIDES = ["my-tsv-task=accuracy"]
    dm = ElevaterDataManager(cfg, strict_classnames=False)
    assert dm.num_classes == 3
    assert dm.classnames == [f"my-tsv-task class {i}" for i in range(3)]


def test_elevater_unknown_task_strict_instructs(cfg, tmp_path):
    """The same manifest under a strict (prompt/label) flow fails with
    instructions naming both fixes (manifest 'classnames' list or a
    metadata.json entry), not a bare metadata KeyError."""
    make_elevater_task(tmp_path, "my-tsv-task", 3, n_train=6, n_test=4)
    cfg.DATASET.DATASET = "my-tsv-task"
    cfg.DATASET.METRIC_OVERRIDES = ["my-tsv-task=accuracy"]
    with pytest.raises(ValueError, match="'classnames'"):
        ElevaterDataManager(cfg)


def test_elevater_unknown_task_names_known_ones(cfg, tmp_path):
    """Tasks outside the metadata registry get an actionable KeyError
    (prompts/classnames come from the reference's prompts.py tables —
    there is nothing to synthesize them from)."""
    from mvlpt_tpu.data.elevater.manifest import class_map

    with pytest.raises(KeyError, match="unknown ELEVATER task 'not-a-task'"):
        class_map("not-a-task")


def test_elevater_one_shot_keeps_train_set(cfg, tmp_path):
    """1-shot: no 80/20 split — val IS the train set (feature.py:602-605);
    a split would move every class's single item to val and train nothing."""
    make_elevater_task(tmp_path, "cifar-10", 10, n_train=20, n_test=8)
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    dm = ElevaterDataManager(cfg)
    assert len(dm.train_loader_x.dataset) == 10  # one per class, kept
    assert len(dm.val_loader.dataset) == 10      # same items as train

    make_elevater_task(tmp_path, "voc-2007-classification", 20,
                       n_train=40, n_test=8, multilabel=True)
    cfg.DATASET.DATASET = "voc-2007-classification,cifar-10"
    cfg.DATASET.MULTITASK = True
    mdm = ElevaterMultitaskDataManager(cfg)
    n_train = len(mdm.train_loader_x.dataset)
    assert n_train > 0
    assert len(mdm.val_loader.dataset) == n_train


def test_elevater_multilabel_and_multitask(cfg, tmp_path):
    make_elevater_task(tmp_path, "voc-2007-classification", 20,
                       n_train=30, n_test=8, multilabel=True)
    make_elevater_task(tmp_path, "cifar-10", 10, n_train=20, n_test=8)
    cfg.DATASET.DATASET = "voc-2007-classification,cifar-10"
    cfg.DATASET.MULTITASK = True
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 5
    dm = ElevaterMultitaskDataManager(cfg)
    assert dm.num_classes == 30
    assert dm._task_class_idx["voc-2007-classification"] == (0, 20)
    assert dm._task_class_idx["cifar-10"] == (20, 30)
    assert dm._metric_name["voc-2007-classification"] == "11point_mAP"
    batch = next(iter(dm.test_loader))
    assert batch["label"].shape[1] == 30  # global k-hot
    assert batch["task"].max() <= 1


def test_imagenet_a_layout_and_dense_labels(cfg, tmp_path):
    """ImageNet-A: images under imagenet-adversarial/imagenet-a/
    (imagenet_a.py:23), labels enumerate the PRESENT folders densely
    (imagenet_a.py:38) — 3 of 5 classnames.txt wnids present -> a
    3-way problem, not sparse indices into the 1000-class table."""
    from tests.util_fixtures import _write_image

    from mvlpt_tpu.data.coop.datasets import ImageNetA

    ddir = tmp_path / "imagenet-adversarial"
    img_dir = ddir / "imagenet-a"
    wnids = [f"n{i:08d}" for i in range(5)]
    present = [wnids[1], wnids[3], wnids[4]]
    for k, w in enumerate(present):
        for i in range(2):
            _write_image(str(img_dir / w / f"{w}_{i}.jpg"), seed=k * 10 + i)
    (img_dir / wnids[1]).joinpath(".hidden.jpg").write_bytes(b"junk")
    (ddir / "classnames.txt").write_text(
        "".join(f"{w} class {j}\n" for j, w in enumerate(wnids)))

    cfg.DATASET.NAME = "ImageNetA"
    cfg.DATASET.COOP = True
    ds = ImageNetA(cfg)
    labels = sorted({d.label for d in ds.test})
    assert labels == [0, 1, 2]          # dense over present folders
    assert len(ds.test) == 6            # hidden file skipped
    assert ds.classnames == ["class 1", "class 3", "class 4"]


def test_fewshot_sampling_seeded():
    items = [Datum(impath=str(i), label=i % 3) for i in range(30)]
    a = DatasetBase.generate_fewshot_dataset(items, 2, seed=7)
    b = DatasetBase.generate_fewshot_dataset(items, 2, seed=7)
    c = DatasetBase.generate_fewshot_dataset(items, 2, seed=8)
    assert [d.impath for d in a] == [d.impath for d in b]
    assert [d.impath for d in a] != [d.impath for d in c]
    assert len(a) == 6


def test_metrics_golden_values():
    y = np.array([0, 1, 1, 0])
    logits = np.array([[2.0, 1.0], [0.0, 1.0], [1.0, 0.0], [3.0, -1.0]])
    assert get_metric("accuracy")(y, logits) == 0.75
    # balanced: class0 recall 1.0, class1 recall 0.5 -> 0.75
    assert get_metric("mean-per-class")(y, logits) == 0.75
    auc = get_metric("roc_auc")(y, logits[:, 1] - logits[:, 0])
    assert 0.0 <= auc <= 1.0
    khot = np.eye(2)[y]
    m = get_metric("11point_mAP")(khot, logits)
    assert 0.0 < m <= 1.0


def test_eval_transform_golden():
    from PIL import Image

    from mvlpt_tpu.data.transforms import EvalTransform

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8))
    out = EvalTransform(size=32)(img)
    assert out.shape == (32, 32, 3)
    # normalization: a mid-gray image maps near (0.5-mean)/std
    gray = Image.new("RGB", (40, 40), (128, 128, 128))
    got = EvalTransform(size=32)(gray)[0, 0]
    want = (128 / 255 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_elevater_custom_task_metric_defaults_to_accuracy(cfg, tmp_path):
    """A custom task with a self-describing manifest and NO
    METRIC_OVERRIDES must construct (metric defaults to accuracy with a
    note) — the metric row lookup used to raise a bare KeyError, which
    broke even flows that never consult the metric (feature
    extraction)."""
    make_elevater_task(tmp_path, "my-local-task", 2, n_train=4, n_test=4,
                       classnames=["good", "bad"])
    cfg.DATASET.DATASET = "my-local-task"
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 1
    dm = ElevaterDataManager(cfg)
    assert dm._metric_name == "accuracy"


def test_align_meta_to_folders():
    """ImageFolder labels come from SORTED folder order; metadata.json
    lists classes in canonical label order. The aligner must place each
    metadata name at the folder-derived label (or keep folder names
    when it can't), never pair positionally across the two orders."""
    from mvlpt_tpu.data.elevater.manifest import _align_meta_to_folders

    # name-keyed folders sorting differently than the metadata order
    assert _align_meta_to_folders(
        ["cat", "dog"], ["dog", "cat"]) == ["cat", "dog"]
    # synonym lists + normalization (underscores/case)
    assert _align_meta_to_folders(
        ["Great_Dane", "tabby"],
        [["tabby", "tabby cat"], ["great dane"]]) == [
            ["great dane"], ["tabby", "tabby cat"]]
    # numeric folders index the metadata table (lexicographic sort of
    # '0','1','10',... must not shift labels)
    folders = sorted(str(i) for i in range(11))  # '0','1','10','2',...
    meta = [f"class {i}" for i in range(11)]
    aligned = _align_meta_to_folders(folders, meta)
    assert aligned == [f"class {int(f)}" for f in folders]
    # unmatchable names: keep folder names (label-aligned by construction)
    assert _align_meta_to_folders(
        ["n01440764", "n01443537"], ["tench", "goldfish"]) == [
            "n01440764", "n01443537"]


def test_imagefolder_metadata_names_follow_labels(cfg, tmp_path, monkeypatch):
    """End-to-end ImageFolder fallback: when metadata lists the classes
    in a different order than the sorted folders, lab2cname must still
    map each label to the name of the folder that produced it."""
    import mvlpt_tpu.data.elevater.manifest as man_mod
    from tests.util_fixtures import _write_image

    task_dir = tmp_path / "flipped-task"
    for split in ("train", "test"):
        for ci, cname in enumerate(["cat", "dog"]):
            for i in range(2):
                _write_image(str(task_dir / split / cname / f"{i}.jpg"),
                             seed=ci * 10 + i, class_signal=ci)
    real_meta = man_mod.load_metadata

    def fake_meta():
        meta = dict(real_meta())
        meta["flipped-task"] = {
            "classes": ["dog", "cat"],   # metadata order != sorted folders
            "metric": "accuracy", "templates": ["a photo of a {}."]}
        return meta

    monkeypatch.setattr(man_mod, "load_metadata", fake_meta)
    man = man_mod.load_task_manifest(str(tmp_path), "flipped-task")
    # sorted folders: cat=0, dog=1 — names must follow the labels
    assert [man_mod.first_classname(c) for c in man.classnames] == \
        ["cat", "dog"]
    by_label = {}
    for it in man.train:
        by_label.setdefault(it.labels[0], set()).add(
            os.path.basename(os.path.dirname(it.impath)))
    assert by_label == {0: {"cat"}, 1: {"dog"}}
