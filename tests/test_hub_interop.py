"""vision_datasets hub-dump interop: registry + zip-backed images.

The reference consumes ELEVATER through the Azure hub
(feature.py:555-567): a ``vision_datasets.json`` registry entry points
at a root_folder holding split index files ("iris" rows:
``train.zip@1.jpg <label[,label]>``) and the image zips. These tests
build a verbatim miniature dump, convert it with
cli/build_manifest.py:from_hub, and train-load images straight out of
the zips (data/zipio.py).
"""

import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from mvlpt_tpu.cli.build_manifest import find_hub_registry, from_hub
from mvlpt_tpu.data import zipio


def _png_bytes(seed, size=(24, 24)):
    import io

    arr = np.random.RandomState(seed).randint(0, 255, size + (3,), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture()
def hub_dump(tmp_path):
    """Miniature hub dump: cifar-10 (multiclass) with train/test zips."""
    root = tmp_path / "hub"
    task_root = root / "classification" / "cifar10_20200721"
    task_root.mkdir(parents=True)

    index = {"train": [], "test": []}
    for split, n in (("train", 8), ("test", 4)):
        zpath = task_root / f"{split}.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            for i in range(n):
                member = f"{split}_images/{i}.png"
                zf.writestr(member, _png_bytes(hash((split, i)) % 2**31))
                index[split].append(f"{split}.zip@{member} {i % 10}")
        (task_root / f"{split}_index.txt").write_text(
            "\n".join(index[split]) + "\n")

    registry = [{
        "name": "cifar-10",
        "version": 1,
        "type": "classification_multiclass",
        "root_folder": "classification/cifar10_20200721",
        "train": {"index_path": "train_index.txt",
                  "files_for_local_usage": ["train.zip"], "num_images": 8},
        "test": {"index_path": "test_index.txt",
                 "files_for_local_usage": ["test.zip"], "num_images": 4},
        "num_classes": 10,
        "labelmap": None,
    }]
    (root / "vision_datasets.json").write_text(json.dumps(registry))
    return root


def test_find_hub_registry(hub_dump, tmp_path):
    assert find_hub_registry(str(hub_dump)) == str(
        hub_dump / "vision_datasets.json")
    assert find_hub_registry(str(tmp_path / "empty")) is None


def test_from_hub_parses_registry_and_index(hub_dump):
    rows, n_classes, dtype, root_folder = from_hub(
        str(hub_dump), str(hub_dump / "vision_datasets.json"), "cifar-10")
    assert n_classes == 10 and dtype == "classification_multiclass"
    assert len(rows["train"]) == 8 and len(rows["test"]) == 4
    ref, labels = rows["train"][3]
    assert ref == "train.zip@train_images/3.png" and labels == [3]


def test_from_hub_unknown_task(hub_dump):
    with pytest.raises(SystemExit, match="not in registry"):
        from_hub(str(hub_dump), str(hub_dump / "vision_datasets.json"),
                 "no-such-task")


def test_zipio_reads_members(hub_dump):
    zpath = str(hub_dump / "classification" / "cifar10_20200721" / "train.zip")
    ref = f"{zpath}@train_images/0.png"
    assert zipio.is_zip_path(ref)
    assert not zipio.is_zip_path("/plain/path.png")
    img = zipio.open_image(ref)
    assert img.size == (24, 24)


def test_hub_dump_converts_and_trains_from_zip(hub_dump, tmp_path,
                                               monkeypatch):
    """Full path: convert → manifest load → DataLoader decodes from zip."""
    import sys

    from mvlpt_tpu.cli.build_manifest import cli

    out_root = tmp_path / "elevater"
    monkeypatch.setattr(sys, "argv", [
        "build_manifest", "--src", str(hub_dump), "--task", "cifar-10",
        "--root", str(out_root)])
    cli()

    from mvlpt_tpu.data.elevater.manifest import load_task_manifest

    m = load_task_manifest(str(out_root), "cifar-10", test_set="test")
    assert m.num_classes == 10
    assert len(m.train) == 8 and len(m.test) == 4
    assert all(".zip@" in it.impath for it in m.train)

    from mvlpt_tpu.data.datum import Datum
    from mvlpt_tpu.data.loader import DataLoader, _TransformedDataset
    from mvlpt_tpu.data.transforms import EvalTransform

    items = [Datum(impath=it.impath, label=it.labels[0], domain=0)
             for it in m.train]
    tfm = EvalTransform(size=32)
    loader = DataLoader(_TransformedDataset(items, tfm), batch_size=4,
                        shuffle=False, num_workers=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["label"].tolist() == [0, 1, 2, 3]
    assert np.isfinite(batch["image"]).all()
