"""Evaluation metrics (numpy/sklearn, host-side).

Covers the metric surface of the reference's
trainers/vision_benchmark/datasets/metrics.py: the four metrics the main
path dispatches through ``get_metric`` (metrics.py:1281-1294 — accuracy,
mean-per-class/balanced accuracy, 11-point mAP, roc_auc) plus the
commonly used members of the evaluator zoo (top-k, threshold accuracy,
F1, average precision, tag-wise accuracy, ECE), group-wise reporting
(GroupWiseEvaluator, :1163) and mean-Lp regression error
(MeanLpErrorEvaluator, :1211).

The rest of the reference's evaluator zoo lives in sibling modules:
  * ``evaluation.detection`` — VOC/COCO detection mAP
    (metrics.py:565-840)
  * ``evaluation.caption``   — BLEU/ROUGE-L/CIDEr/METEOR
    (metrics.py:901-989)
  * ``evaluation.matting``   — IoU/boundary-IoU/L1 matting metrics
    (metrics.py:990-1162)
``get_metric`` still exposes exactly the names the reference's table
does (metrics.py:1281-1294 plus this repo's documented extras); names
outside it raise KeyError, the same failure the reference produces.

All functions take (y_true, y_pred) where y_pred is (N, C) scores and
y_true is (N,) int labels or (N, C) {0,1} indicators, matching how the
MVLPT test loop feeds them (mvlpt.py:1047-1061).
"""

from __future__ import annotations

import numpy as np


def _as_int_labels(y_true) -> np.ndarray:
    y = np.asarray(y_true)
    return y if y.ndim == 1 else np.argmax(y, axis=-1)


def accuracy(y_true, y_pred) -> float:
    """Top-1 accuracy, y_pred (N, C) scores (metrics.py:1254-1262)."""
    return top_k_accuracy(y_true, y_pred, k=1)


def top_k_accuracy(y_true, y_pred, k: int = 1) -> float:
    y = _as_int_labels(y_true)
    topk = np.argsort(-np.asarray(y_pred), axis=-1)[:, :k]
    return float((topk == y[:, None]).any(axis=-1).mean())


def balanced_accuracy(y_true, y_pred) -> float:
    """Mean per-class recall ('mean-per-class', metrics.py:839-850)."""
    y = _as_int_labels(y_true)
    pred = np.argmax(np.asarray(y_pred), axis=-1)
    classes = np.unique(y)
    recalls = [(pred[y == c] == c).mean() for c in classes]
    return float(np.mean(recalls))


def _interp_precision(scores, targets, recall_thresholds) -> np.ndarray:
    """11-point interpolated precision at descending recall thresholds
    (metrics.py:862-880 semantics via sklearn's PR curve)."""
    from sklearn.metrics import precision_recall_curve

    precision, recall, _ = precision_recall_curve(targets, scores)
    out = np.empty(len(recall_thresholds))
    idx, best = 0, 0.0
    for i, thr in enumerate(recall_thresholds):
        while idx < len(recall) and thr <= recall[idx]:
            best = max(best, precision[idx])
            idx += 1
        out[i] = best
    return out


def map_11_points(y_true, y_pred) -> float:
    """11-point interpolated mAP over classes (VOC2007 protocol,
    metrics.py:884-896)."""
    y = np.asarray(y_true)
    p = np.asarray(y_pred)
    if y.ndim == 1:
        y = np.eye(p.shape[1], dtype=np.int64)[y]
    thresholds = np.linspace(1, 0, 11, endpoint=True).tolist()
    aps = [
        np.mean(_interp_precision(p[:, c], y[:, c], thresholds))
        for c in range(p.shape[1])
    ]
    return float(np.mean(aps))


def roc_auc(y_true, y_pred) -> float:
    """ROC-AUC; binary tasks may pass (N, 2) class logits (the trainer
    feeds full per-task logit slices) — the positive-class score is used,
    as sklearn requires 1-D scores for binary targets."""
    from sklearn.metrics import roc_auc_score

    y = np.asarray(y_true)
    p = np.asarray(y_pred)
    if p.ndim == 2 and p.shape[1] == 2 and (y.ndim == 1 or y.shape[1] == 2):
        if y.ndim == 2:
            y = np.argmax(y, axis=-1)
        p = p[:, 1] - p[:, 0]
    return float(roc_auc_score(y, p))


def threshold_accuracy(y_true, y_pred, threshold: float = 0.5) -> float:
    """Sample-based intersection-over-union accuracy of thresholded
    multilabel predictions (ThresholdAccuracyEvaluator,
    metrics.py:293-333): per sample, |pred ∩ target| / |pred ∪ target|
    (denominator clamped to 1 when both are empty), averaged over
    samples. Deliberately NOT elementwise equality — that would count
    true negatives, which the reference calls "too harsh"/meaningless
    for sparse label spaces. (N,) multiclass targets are one-hot
    expanded (metrics.py:122-130); the filter is ``>= threshold``
    (ThresholdPredictionFilter.filter, metrics.py:106)."""
    p = np.asarray(y_pred)
    y = np.asarray(y_true)
    if y.ndim == 1:
        y = np.eye(p.shape[1], dtype=np.int64)[y]
    over = (p >= threshold).astype(np.int64)
    n_correct = (over * y).sum(axis=1)
    n_total = ((over + y) >= 1).sum(axis=1)
    n_total[n_total == 0] = 1
    return float((n_correct / n_total).mean())


def macro_f1(y_true, y_pred) -> float:
    from sklearn.metrics import f1_score

    y = _as_int_labels(y_true)
    pred = np.argmax(np.asarray(y_pred), axis=-1)
    return float(f1_score(y, pred, average="macro", zero_division=0))


def average_precision(y_true, y_pred) -> float:
    from sklearn.metrics import average_precision_score

    return float(average_precision_score(np.asarray(y_true), np.asarray(y_pred)))


def tag_wise_accuracy(y_true, y_pred) -> float:
    """Per-class recall for MULTICLASS predictions: argmax the scores,
    build the confusion matrix over all classes, row-normalize, take
    the diagonal with nan→0 (TagWiseAccuracyEvaluator,
    metrics.py:431-460). The reference reports the per-class list; the
    trainer's results contract here is scalar-per-metric, so this
    returns the list's mean — the per-class math is identical."""
    y = _as_int_labels(y_true)
    p = np.asarray(y_pred)
    n_cls = p.shape[1]
    pred = np.argmax(p, axis=1)
    cm = np.zeros((n_cls, n_cls), np.int64)
    np.add.at(cm, (y, pred), 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_class = np.nan_to_num(cm.diagonal() / cm.sum(axis=1))
    return float(per_class.mean())


def ece_loss(y_true, y_pred, n_bins: int = 15) -> float:
    """Expected calibration error (metrics.py:485-527)."""
    y = _as_int_labels(y_true)
    p = np.asarray(y_pred, np.float64)
    p = np.exp(p - p.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    conf = p.max(-1)
    pred = p.argmax(-1)
    correct = (pred == y).astype(np.float64)
    ece = 0.0
    edges = np.linspace(0, 1, n_bins + 1)
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (conf > lo) & (conf <= hi)
        if mask.any():
            ece += abs(correct[mask].mean() - conf[mask].mean()) * mask.mean()
    return float(ece)


def mean_lp_error(y_true, y_pred, p: int = 1) -> float:
    """Mean Lp regression error: ``(sum |pred-true|^p)^(1/p) / N``
    (MeanLpErrorEvaluator, metrics.py:1211-1248)."""
    assert p > 0
    y = np.asarray(y_true, np.float64)
    pr = np.asarray(y_pred, np.float64)
    assert y.shape == pr.shape and y.ndim == 1
    if y.size == 0:
        return 0.0
    total = float(np.sum(np.abs(pr - y) ** p))
    return float(total ** (1.0 / p) / y.size)


def group_wise(metric_fn, y_true, y_pred, groups) -> dict:
    """Apply ``metric_fn(y_true, y_pred)`` to each group separately
    (GroupWiseEvaluator, metrics.py:1163-1208). ``groups`` is a length-N
    sequence of hashable group ids; returns
    ``{"group_wise_metrics": {group: metric_fn(...)}}``."""
    y = np.asarray(y_true)
    p = np.asarray(y_pred)
    groups = list(groups)
    assert len(groups) == len(y) == len(p)
    by_group: dict = {}
    for i, g in enumerate(groups):
        by_group.setdefault(g, []).append(i)
    return {
        "group_wise_metrics": {
            g: metric_fn(y[idx], p[idx]) for g, idx in by_group.items()
        }
    }


_METRICS = {
    "accuracy": accuracy,
    "mean-per-class": balanced_accuracy,
    "11point_mAP": map_11_points,
    "roc_auc": roc_auc,
    "threshold_accuracy": threshold_accuracy,
    "macro_f1": macro_f1,
    "average_precision": average_precision,
    "tag_wise_accuracy": tag_wise_accuracy,
    "ece": ece_loss,
}


def get_metric(metric_name: str):
    """Metric dispatch (metrics.py:1281-1294)."""
    if metric_name not in _METRICS:
        raise KeyError(f"Undefined metric {metric_name!r}; known: {sorted(_METRICS)}")
    return _METRICS[metric_name]
