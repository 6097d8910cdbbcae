"""tf.data-backed input pipeline (native C++ decode/augment workers).

The reference's host-side input parallelism is torch DataLoader's C++
worker pool (NUM_WORKERS 8, configs/trainers/MVLPT/vit_b16.yaml:6). The
TPU-native equivalent is a tf.data pipeline: multithreaded JPEG decode,
crop/resize/flip and normalization in TensorFlow's C++ runtime, with
deterministic stateless augmentation seeded per (seed, epoch, index).

Preprocessing semantics vs data/transforms.py (and the reference):
  * train: random-resized-crop implements torchvision's 10-try
    rejection sampler (uniform area in scale 0.08-1.0, log-uniform
    ratio 3/4-4/3, clamped-aspect center-crop fallback) in tf ops —
    the same crop DISTRIBUTION as the PIL path, though individual
    draws differ (independent RNG streams); then bicubic resize,
    random horizontal flip, CLIP normalization.
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


def rrc_params(h, w, seeds, scale=(0.08, 1.0), ratio=(0.75, 4.0 / 3.0)):
    """torchvision RandomResizedCrop.get_params in tf ops: 10
    rejection-sampled (uniform-area scale, log-uniform ratio)
    candidates, first valid wins; clamped-aspect center crop as the
    fallback — the same DISTRIBUTION as
    data/transforms.py:_sample_crop (individual draws differ: the two
    backends use independent RNG streams). Returns (y, x, ch, cw) int32
    scalars for an (h, w) image."""
    import tensorflow as tf

    log_r0, log_r1 = float(np.log(ratio[0])), float(np.log(ratio[1]))
    area = w * h
    u = tf.random.stateless_uniform([10, 4], seeds)
    target = area * (scale[0] + u[:, 0] * (scale[1] - scale[0]))
    ar = tf.exp(log_r0 + u[:, 1] * (log_r1 - log_r0))
    cw = tf.round(tf.sqrt(target * ar))
    ch = tf.round(tf.sqrt(target / ar))
    valid = (cw > 0.0) & (cw <= w) & (ch > 0.0) & (ch <= h)
    idx = tf.argmax(tf.cast(valid, tf.int32))
    cw_i, ch_i = cw[idx], ch[idx]
    # uniform integer positions in [0, w-cw] x [0, h-ch]
    x_i = tf.floor(u[idx, 2] * (w - cw_i + 1.0))
    y_i = tf.floor(u[idx, 3] * (h - ch_i + 1.0))
    # fallback: center crop at clamped aspect
    in_ratio = w / h
    fb_w = tf.where(in_ratio < ratio[0], w,
                    tf.where(in_ratio > ratio[1], tf.round(h * ratio[1]), w))
    fb_h = tf.where(in_ratio < ratio[0], tf.round(w / ratio[0]),
                    tf.where(in_ratio > ratio[1], h, h))
    any_valid = tf.reduce_any(valid)
    cw_i = tf.where(any_valid, cw_i, fb_w)
    ch_i = tf.where(any_valid, ch_i, fb_h)
    x_i = tf.where(any_valid, x_i, tf.floor((w - fb_w) / 2.0))
    y_i = tf.where(any_valid, y_i, tf.floor((h - fb_h) / 2.0))
    to_i = lambda v: tf.cast(v, tf.int32)  # noqa: E731
    return to_i(y_i), to_i(x_i), to_i(ch_i), to_i(cw_i)


def _build_dataset(paths, labels, domains, *, train, batch_size, size,
                   mean, std, seed, center_crop, interpolation="bicubic",
                   scale=(0.08, 1.0), ratio=(0.75, 4.0 / 3.0),
                   drop_last=True, shuffle=None, to_uint8=False):
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
        return read_bytes(p.decode() if isinstance(p, bytes) else str(p))

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
        shape = tf.cast(tf.shape(img)[:2], tf.float32)
        y, x, ch_i, cw_i = rrc_params(shape[0], shape[1], seeds,
                                      scale=scale, ratio=ratio)
        img = tf.slice(img, [y, x, 0], [ch_i, cw_i, 3])
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
        if to_uint8:
            # TPU.DEVICE_NORMALIZE: ship raw uint8; the train step folds
            # (x/255-mean)/std into the frozen patch-embed matmul
            img = tf.saturate_cast(tf.round(img), tf.uint8)
        else:
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
                 label_vectors: np.ndarray | None = None,
                 to_uint8: bool = False):
        self.items = items
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.multitask = multitask
        self.augment = shuffle if augment is None else augment
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0
        self._size, self._mean, self._std = size, mean, std
        self._to_uint8 = to_uint8
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
        # keep clear of int32: the seed lands in int32 stateless-RNG
        # seed tensors inside train_map (index + seed would overflow for
        # user seeds >= ~2148); 2**30 leaves headroom for index/epoch
        epoch_seed = (self._seed * 1000003 + self._epoch) % (1 << 30)
        return _build_dataset(
            self._paths, self._labels, self._domains, train=self.augment,
            batch_size=self.batch_size, size=self._size, mean=self._mean,
            std=self._std, seed=epoch_seed, center_crop=self._center_crop,
            drop_last=self.drop_last or self.shuffle, shuffle=self.shuffle,
            to_uint8=self._to_uint8)

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
            imgs = rec["image"]
            if imgs.dtype != np.uint8:  # uint8 = device-side normalize
                imgs = imgs.astype(np.float32)
            batch = {"image": imgs,
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
