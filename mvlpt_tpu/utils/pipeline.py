"""One-deep host<->device inference pipelining.

Every eval/feature loop in the reference is torch-synchronous per batch
(trainers/mvlpt.py:989-1088 test loop, feature.py:324-355 extraction).
Under jax, dispatch is asynchronous and ``np.asarray`` is the sync
point, so dispatching batch i+1 before pulling batch i's result overlaps
the per-dispatch service overhead and the D2H copy with the next batch's
compute — for free, with identical results in identical order. All
inference loops (trainer.test, zero-shot eval, feature extraction) run
through this helper.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import numpy as np


def pipelined_inference(loader: Iterable[dict],
                        dispatch: Callable[[dict], object],
                        ) -> Iterator[tuple[np.ndarray, dict]]:
    """Yield ``(np.asarray(dispatch(batch)), batch)`` for every batch,
    one dispatch ahead of the sync point."""
    pend = None
    for batch in loader:
        dev = dispatch(batch)
        if pend is not None:
            yield np.asarray(pend[0]), pend[1]
        pend = (dev, batch)
    if pend is not None:
        yield np.asarray(pend[0]), pend[1]


def dump_split_features(loader, dispatch: Callable[[dict], object],
                        out_path: str) -> int:
    """Extract features over a full deterministic pass of ``loader`` and
    save the reference npz contract (``feature_list``/``label_list``,
    lpclip/feat_extractor.py:105-167). Shared by the lpclip and
    extract-features CLIs. Returns the number of rows written."""
    from mvlpt_tpu.data.loader import eval_mode

    eval_mode(loader)
    feats, labels = [], []
    for f, batch in pipelined_inference(loader, dispatch):
        n = batch.get("n_valid", len(batch["image"]))
        feats.append(f.astype(np.float32)[:n])
        labels.append(np.asarray(batch["label"])[:n])
    np.savez(out_path, feature_list=np.concatenate(feats),
             label_list=np.concatenate(labels))
    return int(sum(len(l) for l in labels))
