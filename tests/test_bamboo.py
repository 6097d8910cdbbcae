"""Bamboo loader fidelity (reference datasets/bamboo.py:17-101):
id-map classnames, <root>/images layout, preprocessed.pkl reuse —
including caches pickled by the REFERENCE with Dassl Datum objects
(dassl is not installed here; the tolerant unpickler shims it)."""

import json
import os
import pickle
import sys
import types

import numpy as np
import pytest
from PIL import Image

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.data.coop.datasets import Bamboo
from mvlpt_tpu.data.datum import load_foreign_pickle


def _make_dump(root, with_id_map=True):
    img_root = root / "bamboo" / "images"
    for folder in ("n001", "n002"):
        d = img_root / folder
        d.mkdir(parents=True)
        for i in range(5):
            arr = np.random.RandomState(hash((folder, i)) % 2**31).randint(
                0, 255, (8, 8, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    if with_id_map:
        (root / "bamboo" / "bamboo_id_map_sample.json").write_text(json.dumps(
            {"n001": ["golden retriever", "dog"], "n002": "tabby cat"}))
    return root


def _cfg(root, shots=-1):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.SEED = 1
    return cfg


def test_bamboo_classnames_from_id_map(tmp_path):
    _make_dump(tmp_path)
    ds = Bamboo(_cfg(tmp_path))
    # lists collapse to the first name (bamboo.py:88-92)
    assert ds.classnames == ["golden retriever", "tabby cat"]
    # 80/20: 4 train + 1 "test" (the val slice; reference discards the
    # empty third slice) per class
    assert len(ds.train_x) == 8 and len(ds.test) == 2
    # split was cached
    assert os.path.exists(tmp_path / "bamboo" / "preprocessed.pkl")
    # second load comes from the cache, identical
    ds2 = Bamboo(_cfg(tmp_path))
    assert [d.impath for d in ds2.train_x] == [d.impath for d in ds.train_x]


def test_bamboo_fewshot_cached(tmp_path):
    _make_dump(tmp_path)
    ds = Bamboo(_cfg(tmp_path, shots=2))
    assert len(ds.train_x) == 4  # 2 shots x 2 classes
    cache = tmp_path / "bamboo" / "split_fewshot" / "shot_2-seed_1.pkl"
    assert cache.exists()


def _dassl_style_pickle(path, items):
    """Pickle Datum objects under the dassl module path, then remove the
    module so unpickling must go through the tolerant shim."""
    mod_name = "dassl.data.datasets.base_dataset"
    parts = []
    for name in mod_name.split("."):
        parts.append(name)
        sys.modules.setdefault(".".join(parts), types.ModuleType(".".join(parts)))

    class Datum:  # mimics dassl's underscore-attribute Datum
        def __init__(self, impath, label, classname):
            self._impath = impath
            self._label = label
            self._classname = classname
            self._domain = 0

    Datum.__module__ = mod_name
    Datum.__qualname__ = "Datum"
    sys.modules[mod_name].Datum = Datum
    try:
        with open(path, "wb") as f:
            pickle.dump(
                {"train": [Datum(*it) for it in items],
                 "test": [Datum(*it) for it in items[:1]]}, f)
    finally:
        for name in list(sys.modules):
            if name == "dassl" or name.startswith("dassl."):
                del sys.modules[name]


def test_reference_written_preprocessed_pkl_loads(tmp_path):
    _make_dump(tmp_path, with_id_map=False)
    pre = tmp_path / "bamboo" / "preprocessed.pkl"
    _dassl_style_pickle(pre, [
        ("/data/a.jpg", 0, "golden retriever"),
        ("/data/b.jpg", 1, "tabby cat"),
    ])
    with pytest.raises(ImportError):
        import dassl  # noqa: F401  (guard: shim must be exercised)
    raw = load_foreign_pickle(pre)
    assert raw["train"][0].impath == "/data/a.jpg"
    ds = Bamboo(_cfg(tmp_path))
    assert [d.classname for d in ds.train_x] == [
        "golden retriever", "tabby cat"]
    assert [d.label for d in ds.train_x] == [0, 1]
    assert len(ds.test) == 1
