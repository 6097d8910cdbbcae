"""tf.data input-pipeline backend: manager integration, eval-transform
closeness to the PIL reference path, determinism."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mvlpt_tpu.config import get_cfg_default
from mvlpt_tpu.data.managers import (
    CoopMultitaskDataManager, ElevaterDataManager,
    ElevaterMultitaskDataManager)
from tests.util_fixtures import make_coop_dataset, make_elevater_task


@pytest.fixture()
def cfg(tmp_path):
    c = get_cfg_default()
    c.DATASET.ROOT = str(tmp_path)
    c.SEED = 1
    c.DATALOADER.BACKEND = "tf"
    c.DATALOADER.NUM_WORKERS = 0
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    c.DATALOADER.TEST.BATCH_SIZE = 4
    c.INPUT.SIZE = (32, 32)
    c.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
    return c


def test_coop_manager_tf_backend(cfg, tmp_path):
    make_coop_dataset(tmp_path)
    cfg.DATASET.DATASET = "OxfordPets"
    cfg.DATASET.COOP = True
    dm = CoopMultitaskDataManager(cfg)
    batch = next(iter(dm.train_loader_x))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].dtype == np.float32
    tb = next(iter(dm.test_loader))
    assert tb["n_valid"] == 4


def test_elevater_multitask_tf_backend(cfg, tmp_path):
    make_elevater_task(tmp_path, "cifar-10", 10, n_train=16, n_test=8)
    make_elevater_task(tmp_path, "mnist", 10, n_train=16, n_test=8)
    cfg.DATASET.DATASET = "cifar-10,mnist"
    cfg.DATASET.MULTITASK = True
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 2
    dm = ElevaterMultitaskDataManager(cfg)
    batch = next(iter(dm.test_loader))
    assert batch["label"].shape[1] == 20  # global k-hot survives tf path
    assert "task" in batch


def test_eval_transform_close_to_pil(cfg, tmp_path):
    from PIL import Image

    from mvlpt_tpu.data.tfdata import TFDataLoader
    from mvlpt_tpu.data.transforms import EvalTransform
    from mvlpt_tpu.data.datum import Datum

    # structured image (resize-kernel comparisons diverge on pure noise)
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([(x * 3) % 255, (y * 4) % 255, ((x + y) * 2) % 255],
                   -1).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(path, quality=95)
    items = [Datum(impath=path, label=0)]
    loader = TFDataLoader(items, batch_size=1, shuffle=False, size=32,
                          mean=[0.48145466, 0.4578275, 0.40821073],
                          std=[0.26862954, 0.26130258, 0.27577711])
    got = next(iter(loader))["image"][0]
    from mvlpt_tpu.data.loader import _load_image

    want = EvalTransform(size=32)(_load_image(path))
    # tf bicubic-antialias vs PIL bicubic: close, not bit-exact
    assert np.mean(np.abs(got - want)) < 0.08
    assert np.max(np.abs(got - want)) < 0.5


def test_train_loader_deterministic_per_seed(cfg, tmp_path):
    make_coop_dataset(tmp_path)
    cfg.DATASET.DATASET = "OxfordPets"
    cfg.DATASET.COOP = True
    a = CoopMultitaskDataManager(cfg)
    b = CoopMultitaskDataManager(cfg)
    ba = next(iter(a.train_loader_x))
    bb = next(iter(b.train_loader_x))
    np.testing.assert_array_equal(ba["label"], bb["label"])
    np.testing.assert_allclose(ba["image"], bb["image"], rtol=1e-6)


def test_train_rrc_matches_torchvision_distribution():
    """The tf RRC sampler must draw from torchvision's rejection-sampler
    distribution (data/transforms.py:_sample_crop), not tf's
    sample_distorted_bounding_box. Compare crop area/aspect moments of
    the REAL tf sampler (tfdata.rrc_params) against the PIL path over
    many draws on a rectangular image."""
    import random

    from mvlpt_tpu.data.tfdata import rrc_params
    from mvlpt_tpu.data.transforms import TrainTransform

    h, w, n = 48, 64, 400
    tt = TrainTransform(size=16)
    pil_areas, pil_ars = [], []
    for i in range(n):
        x, y, cw, ch = tt._sample_crop(w, h, random.Random(i))
        pil_areas.append(cw * ch / (w * h))
        pil_ars.append(cw / ch)

    areas, ars = [], []
    for i in range(n):
        y, x, ch, cw = rrc_params(float(h), float(w), tf.stack([i, 0]))
        y, x, ch, cw = (int(v) for v in (y, x, ch, cw))
        assert 0 <= x and x + cw <= w and 0 <= y and y + ch <= h
        assert cw > 0 and ch > 0
        areas.append(cw * ch / (w * h))
        ars.append(cw / ch)

    assert abs(np.mean(areas) - np.mean(pil_areas)) < 0.05
    assert abs(np.std(areas) - np.std(pil_areas)) < 0.05
    assert abs(np.mean(ars) - np.mean(pil_ars)) < 0.08


def test_rrc_fallback_center_crop_extreme_aspect():
    """A 10x300 strip rejects all candidates -> clamped-aspect center
    crop (torchvision fallback semantics)."""
    from mvlpt_tpu.data.tfdata import rrc_params

    h, w = 10.0, 300.0
    y, x, ch, cw = rrc_params(h, w, tf.stack([7, 0]))
    ch, cw = int(ch), int(cw)
    assert ch == 10 and cw == round(10 * 4 / 3)  # ratio clamped to 4/3
    assert int(x) == (300 - cw) // 2 and int(y) == 0
