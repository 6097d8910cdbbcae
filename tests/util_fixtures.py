"""Synthetic dataset fixtures: tiny on-disk image trees in the exact
layouts the loaders expect (CoOp split_zhou JSONs, ELEVATER manifests)."""

import json
import os

import numpy as np
from PIL import Image


def _write_image(path, seed=0, size=(32, 32), class_signal=None):
    """class_signal: int -> images carry a class-dependent color bias so
    synthetic datasets are actually learnable (for overfit/soak runs)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 100, (*size, 3)).astype(np.int64)
    if class_signal is not None:
        color = np.array([(class_signal * 97) % 156,
                          (class_signal * 57) % 156,
                          (class_signal * 37) % 156])
        arr = arr + color[None, None, :]
    Image.fromarray(arr.astype(np.uint8)).save(path)


def make_coop_dataset(root, dataset_dir="oxford_pets", classes=("abyssinian", "beagle"),
                      n_train=6, n_val=2, n_test=4,
                      split_name="split_zhou_OxfordPets.json", image_subdir="images"):
    """Create a split-json CoOp dataset under <root>/<dataset_dir>."""
    ddir = os.path.join(root, dataset_dir)
    img_dir = os.path.join(ddir, image_subdir)
    split = {"train": [], "val": [], "test": []}
    seed = 0
    for label, cname in enumerate(classes):
        for part, count in (("train", n_train), ("val", n_val), ("test", n_test)):
            for i in range(count):
                rel = f"{cname}_{part}_{i}.jpg"
                _write_image(os.path.join(img_dir, rel), seed=seed,
                             class_signal=label)
                seed += 1
                split[part].append([rel, label, cname])
    os.makedirs(ddir, exist_ok=True)
    with open(os.path.join(ddir, split_name), "w") as f:
        json.dump(split, f)
    return ddir


def make_elevater_task(root, task, n_classes, n_train=8, n_test=4,
                       multilabel=False, classnames=None):
    """Create <root>/<task>/manifest.json + images."""
    tdir = os.path.join(root, task)
    manifest = {"type": ("classification_multilabel" if multilabel
                         else "classification_multiclass"),
                "num_classes": n_classes, "splits": {"train": [], "test": []}}
    if classnames is not None:
        manifest["classnames"] = list(classnames)
    rng = np.random.RandomState(hash(task) % 2**31)
    seed = 0
    for part, count in (("train", n_train), ("test", n_test)):
        for i in range(count):
            rel = f"{part}_{i}.jpg"
            if multilabel:
                k = rng.randint(1, max(2, n_classes // 2 + 1))
                labels = sorted(rng.choice(n_classes, size=k, replace=False).tolist())
            else:
                labels = [i % n_classes]
            _write_image(os.path.join(tdir, rel), seed=seed,
                         class_signal=labels[0])
            seed += 1
            manifest["splits"][part].append([rel, labels])
    with open(os.path.join(tdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return tdir
