"""Smaller-surface tests: loader reshuffling, zero-shot template
resolution for ELEVATER tasks, profiler timer, manifest builder."""

import numpy as np

from mvlpt_tpu.data.datum import Datum
from mvlpt_tpu.data.loader import DataLoader, _TransformedDataset


class _IdDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2, 3), i, np.float32), i, 0


def test_train_loader_reshuffles_each_epoch():
    dl = DataLoader(_IdDataset(16), batch_size=4, shuffle=True,
                    num_workers=0, seed=3, drop_last=True)
    e1 = [tuple(b["label"]) for b in dl]
    e2 = [tuple(b["label"]) for b in dl]
    assert e1 != e2  # reshuffled
    assert sorted(sum(e1, ())) == list(range(16))


def test_eval_loader_pads_tail():
    dl = DataLoader(_IdDataset(10), batch_size=4, shuffle=False,
                    num_workers=0, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[-1]["n_valid"] == 2
    assert batches[-1]["image"].shape == (4, 2, 2, 3)


def test_zeroshot_template_resolution_elevater():
    from mvlpt_tpu.models.zsclip import ZeroshotCLIP

    class Fake(ZeroshotCLIP):
        def __init__(self, name):
            from mvlpt_tpu.config import get_cfg_default

            self.cfg = get_cfg_default()
            self.cfg.DATASET.NAME = ""
            self.cfg.DATASET.DATASET = name

    assert "satellite" in Fake("eurosat_clip").templates(["x"])[0]
    assert Fake("OxfordPets") and True
    t = ZeroshotCLIP.templates(Fake("cifar-10"), ["x"])
    assert "{}" in t[0]


def test_step_timer():
    from mvlpt_tpu.utils.profiler import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        t.stop(n_items=8)
    assert t.throughput() > 0


def test_build_manifest_image_folder(tmp_path):
    import os

    from PIL import Image

    from mvlpt_tpu.cli.build_manifest import from_image_folder

    for split in ("train", "test"):
        for cls in ("a", "b"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            Image.new("RGB", (8, 8)).save(d / "x.jpg")
    rows, classes = from_image_folder(str(tmp_path))
    assert classes == ["a", "b"]
    assert len(rows["train"]) == 2 and len(rows["test"]) == 2
    assert rows["train"][0][1] == [0]


def test_knowledge_texts():
    from mvlpt_tpu.data.elevater.knowledge import knowledge_texts

    # wiki definition present for cifar-10 classes; the leading space is
    # load-bearing (feature.py:509: ' ' + ' '.join(word_tokenize(...)) —
    # it keeps the template's '.' and the ';' as separate BPE tokens)
    texts = knowledge_texts("cifar-10", "cat", use_wiki=True)
    assert len(texts) == 1 and texts[0].startswith(" ; cat ,")
    # gpt3 appended in WIKI_AND_GPT3 mode
    both = knowledge_texts("cifar-10", "cat", use_wiki=True, use_gpt3=True,
                           n_gpt3=2)
    assert len(both) == 3
    # WIKI_THEN_GPT3: gpt3 only when no wiki hit
    fb = knowledge_texts("cifar-10", "cat", use_wiki=True, use_gpt3=True,
                         n_gpt3=2, aggregation="WIKI_THEN_GPT3")
    assert len(fb) == 1
    # unknown class -> no knowledge
    assert knowledge_texts("cifar-10", "not-a-class", use_wiki=True) == []
    # hierarchy path capped at 3 hops
    h = knowledge_texts("cifar-10", "cat", use_hierarchy=True)
    assert "cat feline carnivore" in h[0]


def test_eval_mode_restores_full_deterministic_pass():
    """loader.eval_mode on a python train loader: clears host_shard
    (eval is replicated), keeps tails, and swaps the augmenting
    TrainTransform for its EvalTransform counterpart."""
    from PIL import Image

    from mvlpt_tpu.data.loader import (
        DataLoader, _TransformedDataset, eval_mode)
    from mvlpt_tpu.data.transforms import EvalTransform, TrainTransform

    class _Item:
        def __init__(self, i):
            self.impath = f"mem{i}"
            self.label = i % 2
            self.domain = 0

    import mvlpt_tpu.data.loader as loader_mod

    orig = loader_mod._load_image
    loader_mod._load_image = lambda p: Image.new("RGB", (48, 40), (128, 7, 9))
    try:
        tfm = TrainTransform(size=16, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
        ds = _TransformedDataset([_Item(i) for i in range(5)], tfm)
        loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                            seed=3, drop_last=True, host_shard=(0, 1))
        eval_mode(loader)
        assert loader.host_shard is None and not loader.drop_last
        assert isinstance(ds.transform, EvalTransform)
        a = [b["image"] for b in loader]
        b = [b["image"] for b in loader]
        assert len(a) == 3  # tail kept (5 items, bs 2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)  # deterministic pass
    finally:
        loader_mod._load_image = orig


def test_knowledge_augmented_text_features():
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.data.elevater.knowledge import (
        encode_class_text_features_with_knowledge)

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, transformer_width=32, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    feats = encode_class_text_features_with_knowledge(
        params, cfg, "cifar-10", ["cat", "dog"], ["a photo of a {}."],
        sources=("wiki", "gpt3"), n_gpt3=1)
    assert feats.shape == (2, 16)
    norms = jnp.linalg.norm(feats, axis=-1)
    assert jnp.allclose(norms, 1.0, atol=1e-5)


def test_device_normalize_matches_host_arithmetic():
    """data/transforms.device_normalize: uint8 -> (x/255 - mean)/std in
    fp32 (the uint8 loader contract); float inputs pass through."""
    import jax.numpy as jnp
    import numpy as np

    from mvlpt_tpu.data.transforms import (
        CLIP_PIXEL_MEAN, CLIP_PIXEL_STD, device_normalize)

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 4, 4, 3)).astype(np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(u8), CLIP_PIXEL_MEAN,
                                      CLIP_PIXEL_STD))
    want = ((u8.astype(np.float32) / 255.0 - np.float32(CLIP_PIXEL_MEAN))
            / np.float32(CLIP_PIXEL_STD))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    f32 = jnp.ones((1, 2, 2, 3), jnp.float32) * 0.5
    out = device_normalize(f32, CLIP_PIXEL_MEAN, CLIP_PIXEL_STD)
    assert out is f32  # passthrough, no accidental re-normalization


def test_pipelined_inference_order_and_depth():
    """utils/pipeline.pipelined_inference: same (result, batch) pairs in
    order, dispatching exactly one batch ahead of the sync point."""
    import numpy as np

    from mvlpt_tpu.utils.pipeline import pipelined_inference

    events = []
    batches = [{"image": np.full((2, 2), i)} for i in range(4)]

    def dispatch(b):
        events.append(("dispatch", int(b["image"][0, 0])))
        return b["image"] * 10

    out = []
    for res, b in pipelined_inference(batches, dispatch):
        events.append(("yield", int(b["image"][0, 0])))
        out.append((res, b))

    assert [int(r[0, 0]) for r, _ in out] == [0, 10, 20, 30]
    assert [int(b["image"][0, 0]) for _, b in out] == [0, 1, 2, 3]
    # dispatch i+1 happens before yield i (one-deep pipelining)
    assert events[:5] == [("dispatch", 0), ("dispatch", 1), ("yield", 0),
                          ("dispatch", 2), ("yield", 1)]
    assert list(pipelined_inference([], dispatch)) == []


def _tsv_src(tmp_path, max_label):
    """train/test index-TSVs whose labels reach max_label, with images."""
    import os

    from PIL import Image

    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    for split in ("train", "test"):
        lines = []
        for i in range(max_label + 1):
            rel = f"images/{split}_{i}.jpg"
            Image.new("RGB", (8, 8)).save(src / rel)
            lines.append(f"{rel}\t{i}")
        (src / f"{split}.tsv").write_text("\n".join(lines) + "\n")
    return str(src)


def test_build_manifest_known_task_tsv_subset_keeps_metadata_count(
        tmp_path, monkeypatch):
    """A TSV subset of a KNOWN task whose labels don't reach the last
    classes (few-shot dumps do this routinely) must write the metadata
    class count — the observed max+1 would make every strict load
    refuse on the count-agreement guard."""
    import json
    import sys

    from mvlpt_tpu.cli.build_manifest import cli
    from mvlpt_tpu.data.elevater.manifest import load_task_manifest

    src = _tsv_src(tmp_path, max_label=6)  # cifar-10 has 10 classes
    root = tmp_path / "root"
    monkeypatch.setattr(sys, "argv", [
        "build_manifest", "--src", src, "--task", "cifar-10",
        "--root", str(root)])
    cli()
    man = json.load(open(root / "cifar-10" / "manifest.json"))
    assert man["num_classes"] == 10
    # and the strict loader accepts it (metadata classnames apply)
    loaded = load_task_manifest(str(root), "cifar-10")
    assert loaded.num_classes == 10 and len(loaded.classnames) == 10


def test_build_manifest_known_task_tsv_labels_exceed_table(
        tmp_path, monkeypatch):
    """Labels beyond the known task's class table are a real
    inconsistency: fail at BUILD time with instructions, not at load."""
    import sys

    import pytest

    from mvlpt_tpu.cli.build_manifest import cli

    src = _tsv_src(tmp_path, max_label=11)  # 12 labels > cifar-10's 10
    monkeypatch.setattr(sys, "argv", [
        "build_manifest", "--src", src, "--task", "cifar-10",
        "--root", str(tmp_path / "root")])
    with pytest.raises(SystemExit, match="disagree"):
        cli()


def test_build_manifest_image_folder_known_task_writes_aligned_classnames(
        tmp_path, monkeypatch):
    """ImageFolder source for a metadata-known task: row labels use
    SORTED folder order, so the built manifest must carry classnames
    aligned to that order — a classnames-free manifest would resolve to
    class_map(task) in metadata canonical order at load time and pair
    every prompt with the wrong label whenever the orders differ."""
    import json
    import sys

    from PIL import Image

    from mvlpt_tpu.cli.build_manifest import cli
    from mvlpt_tpu.data.elevater.manifest import load_task_manifest

    # 'Truck' sorts before every lowercase name, so label 0 is truck —
    # metadata canonical order has truck LAST (index 9).
    folders = ["Truck", "airplane", "automobile", "bird", "cat", "deer",
               "dog", "frog", "horse", "ship"]
    src = tmp_path / "src"
    for split in ("train", "test"):
        for cls in folders:
            d = src / split / cls
            d.mkdir(parents=True)
            Image.new("RGB", (8, 8)).save(d / "x.jpg")
    root = tmp_path / "root"
    monkeypatch.setattr(sys, "argv", [
        "build_manifest", "--src", str(src), "--task", "cifar-10",
        "--root", str(root)])
    cli()
    man = json.load(open(root / "cifar-10" / "manifest.json"))
    assert man["num_classes"] == 10
    # aligned: metadata spelling at the folder-derived label
    assert man["classnames"][0] == "truck"
    assert man["classnames"][1] == "airplane"
    # and the loader pairs label 0's rows with 'truck'
    loaded = load_task_manifest(str(root), "cifar-10")
    assert loaded.classnames[0] == "truck"
    truck_rows = [p for p, ls in man["splits"]["train"] if ls == [0]]
    assert len(truck_rows) == 1 and "Truck" in truck_rows[0]
