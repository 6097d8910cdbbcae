"""tf.data-backed input pipeline (native C++ decode/augment workers).

The reference's host-side input parallelism is torch DataLoader's C++
worker pool (NUM_WORKERS 8, configs/trainers/MVLPT/vit_b16.yaml:6). The
TPU-native equivalent is a tf.data pipeline: multithreaded JPEG decode,
crop/resize/flip and normalization in TensorFlow's C++ runtime, with
deterministic stateless augmentation seeded per (seed, epoch, index).

Preprocessing semantics match data/transforms.py (and therefore the
reference):
  * train: random-resized-crop scale 0.08-1.0, ratio 3/4-4/3, bicubic,
    random horizontal flip, CLIP normalization;
  * eval: shorter-side bicubic resize + center crop (or plain warp for
    the ELEVATER non-center-crop mode).
tf bicubic (antialias) is not bit-identical to PIL bicubic; agreement is
within ~1% of pixel range (tolerance-tested), same as torchvision-vs-PIL
differences the reference tolerates across its two pipelines.

Select with DATALOADER.BACKEND = "tf" ("python" = PIL loader).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def available() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except ImportError:
        return False


def _build_dataset(paths, labels, domains, *, train, batch_size, size,
                   mean, std, seed, center_crop, interpolation="bicubic",
                   scale=(0.08, 1.0), ratio=(0.75, 4.0 / 3.0),
                   drop_last=True, shuffle=None):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")  # host-only pipeline

    n = len(paths)
    mean = tf.constant(mean, tf.float32)
    std = tf.constant(std, tf.float32)
    size_t = int(size)

    ds = tf.data.Dataset.from_tensor_slices({
        "path": tf.constant(list(paths)),
        "label": tf.constant(np.asarray(labels)),
        "task": tf.constant(np.asarray(domains, np.int32)),
        "index": tf.range(n, dtype=tf.int64),
    })
    if shuffle if shuffle is not None else train:
        ds = ds.shuffle(n, seed=seed, reshuffle_each_iteration=True)

    from mvlpt_tpu.data.zipio import is_zip_path, read_bytes

    # zip@member refs (hub-format manifests) can't go through
    # tf.io.read_file; route those datasets through a numpy_function
    # reader (decode still happens in tf, so the cost is one host hop).
    has_zip = any(is_zip_path(str(p)) for p in paths)

    def _np_read(p):
        p = p.decode() if isinstance(p, bytes) else str(p)
        if is_zip_path(p):
            return read_bytes(p)
        with open(p, "rb") as f:
            return f.read()

    def decode(rec):
        if has_zip:
            raw = tf.numpy_function(_np_read, [rec["path"]], tf.string)
            raw.set_shape([])
        else:
            raw = tf.io.read_file(rec["path"])
        img = tf.io.decode_image(raw, channels=3, expand_animations=False)
        img.set_shape([None, None, 3])
        return rec, img

    def train_map(rec, img):
        seeds = tf.stack([tf.cast(rec["index"], tf.int32) + seed, seed])
        bbox, bsize, _ = tf.image.stateless_sample_distorted_bounding_box(
            tf.shape(img),
            bounding_boxes=tf.zeros([0, 0, 4], tf.float32),
            seed=seeds,
            min_object_covered=0.0,
            aspect_ratio_range=ratio,
            area_range=scale,
            max_attempts=10,
            use_image_if_no_bounding_boxes=True)
        img = tf.slice(img, bbox, bsize)
        img = tf.image.resize(img, (size_t, size_t), method="bicubic",
                              antialias=True)
        img = tf.image.stateless_random_flip_left_right(img, seeds)
        return rec, img

    def eval_map(rec, img):
        if center_crop:
            shape = tf.cast(tf.shape(img)[:2], tf.float32)
            short = tf.minimum(shape[0], shape[1])
            new = tf.cast(tf.round(shape * (size_t / short)), tf.int32)
            img = tf.image.resize(img, new, method="bicubic", antialias=True)
            img = tf.image.resize_with_crop_or_pad(img, size_t, size_t)
        else:
            img = tf.image.resize(img, (size_t, size_t), method="bicubic",
                                  antialias=True)
        return rec, img

    def normalize(rec, img):
        img = tf.cast(img, tf.float32) / 255.0
        img = (img - mean) / std
        return {"image": img, "label": rec["label"], "task": rec["task"]}

    ds = ds.map(decode, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.map(train_map if train else eval_map,
                num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.map(normalize, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=drop_last)
    return ds.prefetch(tf.data.AUTOTUNE)


class TFDataLoader:
    """Drop-in replacement for data.loader.DataLoader backed by tf.data."""

    def __init__(self, items: Sequence, batch_size: int, shuffle: bool,
                 size: int, mean, std, seed: int = 0, center_crop=True,
                 drop_last: bool = False, multitask: bool = False,
                 augment: bool | None = None,
                 label_vectors: np.ndarray | None = None):
        self.items = items
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.multitask = multitask
        self.augment = shuffle if augment is None else augment
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0
        self._size, self._mean, self._std = size, mean, std
        self._center_crop = center_crop
        self._paths = [d.impath for d in items]
        if label_vectors is not None:
            self._labels = label_vectors  # (N, C) k-hot targets
        else:
            self._labels = np.asarray([d.label for d in items])
        self._domains = [getattr(d, "domain", getattr(d, "task_id", 0))
                         for d in items]

    def set_eval_mode(self):
        """Deterministic full pass: no shuffle/augment, keep tail batches
        (feature extraction over a loader built for training)."""
        self.shuffle = False
        self.augment = False
        self.drop_last = False

    def _build(self):
        # rebuilt per epoch so the stateless augmentation seeds get an
        # epoch component (fresh crops/flips each epoch, deterministic
        # per (seed, epoch, index))
        epoch_seed = self._seed * 1000003 + self._epoch
        return _build_dataset(
            self._paths, self._labels, self._domains, train=self.augment,
            batch_size=self.batch_size, size=self._size, mean=self._mean,
            std=self._std, seed=epoch_seed, center_crop=self._center_crop,
            drop_last=self.drop_last or self.shuffle, shuffle=self.shuffle)

    def __len__(self):
        n = len(self.items)
        if self.shuffle or self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        ds = self._build()
        self._epoch += 1
        for rec in ds.as_numpy_iterator():
            n_valid = len(rec["image"])
            batch = {"image": rec["image"].astype(np.float32),
                     "label": rec["label"], "n_valid": n_valid}
            if self.multitask:
                batch["task"] = rec["task"]
            if n_valid < self.batch_size:  # pad eval tail to static shape
                pad = self.batch_size - n_valid
                for k in ("image", "label", "task"):
                    if k in batch:
                        batch[k] = np.concatenate(
                            [batch[k]] + [batch[k][-1:]] * pad, axis=0)
            yield batch
