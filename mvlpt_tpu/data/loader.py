"""Host input pipeline: threaded decode/transform workers feeding
fixed-shape numpy batches, with device prefetch.

TPU-native replacement for torch DataLoader + Dassl DatasetWrapper
(used at mvlpt.py:661-720): deterministic seeded shuffling, worker
parallelism for JPEG decode + PIL transforms (PIL releases the GIL for
the heavy ops), static batch shapes (train loaders drop/pad nothing —
they wrap around; eval loaders pad the tail batch and report the pad so
metrics can mask it).
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Callable, Iterator, Sequence

import numpy as np
from PIL import Image

from mvlpt_tpu.data.datum import Datum


def _load_image(impath: str) -> Image.Image:
    from mvlpt_tpu.data.zipio import open_image

    return open_image(impath)  # plain path or zip@member reference


class _TransformedDataset:
    """items + transform -> (image HWC f32, label, domain)."""

    def __init__(self, items: Sequence[Datum], transform: Callable,
                 label_transform: Callable | None = None):
        self.items = items
        self.transform = transform
        self.label_transform = label_transform

    def __len__(self):
        return len(self.items)

    def _transform_takes_rng(self) -> bool:
        """Signature-inspected (never by catching TypeError, which would
        swallow real errors raised inside the transform). Cached per
        transform object — this sits in the per-item hot loop."""
        if getattr(self, "_rng_ok_for", None) is not self.transform:
            import inspect

            try:
                ok = "rng" in inspect.signature(self.transform).parameters
            except (TypeError, ValueError):
                ok = False
            self._rng_ok_for, self._rng_ok = self.transform, ok
        return self._rng_ok

    def __getitem__(self, idx: int, rng: random.Random | None = None):
        d = self.items[idx]
        if getattr(self.transform, "wants_bytes", False):
            # native backend: hand raw encoded bytes to the C pipeline
            from mvlpt_tpu.data.zipio import read_bytes

            img = read_bytes(d.impath)
        else:
            img = _load_image(d.impath)
        if rng is not None and self._transform_takes_rng():
            img = self.transform(img, rng=rng)
        else:
            img = self.transform(img)
        label = d.label if self.label_transform is None else self.label_transform(d.label)
        return img, label, d.domain


class DataLoader:
    """Deterministic batched iterator with a thread pool.

    Train mode: infinite-epoch semantics are left to the caller; each
    ``__iter__`` yields one epoch of full batches (tail dropped when
    ``drop_last``, matching torch's default for Dassl train loaders).
    Eval mode: tail batch is padded to the static batch size and
    ``n_valid`` marks real rows.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = False,
                 multitask: bool = False,
                 host_shard: tuple[int, int] | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.multitask = multitask
        self.epoch = 0
        # Multi-host: (start, size) row range of each global batch this
        # host decodes (parallel.local_batch_slice). The global order is
        # identical on every host (same seed/epoch); only decode work is
        # sharded. Requires drop_last (static full batches).
        self.host_shard = host_shard
        if host_shard is not None and not drop_last:
            raise ValueError("host_shard requires drop_last=True "
                             "(eval loaders run replicated, unsharded)")

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> list[int]:
        idxs = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idxs)
        return idxs

    def __iter__(self) -> Iterator[dict]:
        idxs = self._order()
        epoch_seed = (self.seed * 1000003 + self.epoch) if self.shuffle else None
        self.epoch += 1
        bs = self.batch_size

        import inspect

        supports_rng = False
        try:
            supports_rng = "rng" in inspect.signature(
                self.dataset.__getitem__).parameters
        except (TypeError, ValueError):
            pass

        def fetch(i):
            if epoch_seed is None or not supports_rng:
                return self.dataset[i]
            # deterministic per-(seed, epoch, index) augmentation draws,
            # independent of thread interleaving
            return self.dataset.__getitem__(
                i, rng=random.Random(epoch_seed * 1000003 + i))

        pool = cf.ThreadPoolExecutor(self.num_workers) if self.num_workers else None
        try:
            for start in range(0, len(idxs), bs):
                chunk = idxs[start : start + bs]
                if len(chunk) < bs and self.drop_last:
                    break
                if self.host_shard is not None:
                    # augmentation rng keys on the GLOBAL index i, so the
                    # decoded rows are identical to the single-host run
                    s0, sz = self.host_shard
                    chunk = chunk[s0 : s0 + sz]
                if pool is not None:
                    rows = list(pool.map(fetch, chunk))
                else:
                    rows = [fetch(i) for i in chunk]
                n_valid = len(rows)
                target = bs if self.host_shard is None else self.host_shard[1]
                while len(rows) < target:  # pad eval tail to static shape
                    rows.append(rows[-1])
                imgs = np.stack([r[0] for r in rows])
                if imgs.dtype != np.uint8:
                    # uint8 = TPU.DEVICE_NORMALIZE staging (normalize is
                    # folded on device); everything else ships fp32
                    imgs = imgs.astype(np.float32)
                labels = np.asarray([r[1] for r in rows])
                batch = {"image": imgs, "label": labels, "n_valid": n_valid}
                if self.multitask:
                    batch["task"] = np.asarray([r[2] for r in rows], np.int32)
                yield batch
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)


def build_data_loader(cfg, data_source, batch_size, tfm, is_train: bool,
                      multitask: bool = False, label_transform=None):
    """Dassl build_data_loader equivalent (mvlpt.py:661-720)."""
    ds = _TransformedDataset(data_source, tfm, label_transform)
    host_shard = None
    if is_train:
        import jax

        if jax.process_count() > 1:
            from mvlpt_tpu.parallel import local_batch_slice

            host_shard = local_batch_slice(batch_size)
    return DataLoader(
        ds, batch_size=batch_size, shuffle=is_train,
        num_workers=cfg.DATALOADER.NUM_WORKERS, seed=max(cfg.SEED, 0),
        drop_last=is_train, multitask=multitask, host_shard=host_shard,
    )


def eval_mode(loader):
    """Switch any loader to a deterministic full pass (no shuffle, no
    augmentation, keep tail batches, every host sees every row) — for
    feature extraction over loaders built for training."""
    if hasattr(loader, "set_eval_mode"):
        loader.set_eval_mode()
        return loader
    loader.shuffle = False
    loader.drop_last = False
    # Eval is replicated (parallel/multihost.py contract): a train
    # loader's per-host batch slice would make each host extract only
    # its 1/P of every batch.
    loader.host_shard = None
    # Swap a training transform for its eval counterpart so the "no
    # augmentation" promise holds on the python backend too (the tf
    # backend handles this inside set_eval_mode).
    ds = getattr(loader, "dataset", None)
    tfm = getattr(ds, "transform", None)
    from mvlpt_tpu.data.transforms import EvalTransform, TrainTransform

    if isinstance(tfm, TrainTransform):
        ds.transform = EvalTransform(
            size=tfm.size, interpolation=tfm.interpolation, mean=tfm.mean,
            std=tfm.std, to_uint8=tfm.to_uint8)
    return loader


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Async host->device pipeline (replaces pinned-memory workers)."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        n_valid = batch.pop("n_valid", None)
        arrays = {k: jax.device_put(v, sharding) if sharding is not None
                  else jax.device_put(v) for k, v in batch.items()}
        if n_valid is not None:
            arrays["n_valid"] = n_valid
        queue.append(arrays)

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
