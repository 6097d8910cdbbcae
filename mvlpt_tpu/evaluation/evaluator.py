"""Dassl-style Classification evaluator for the CoOp universe.

Accumulates (logits, labels) batches and reports accuracy / error /
macro-F1 (plus optional per-class accuracy), matching the evaluator the
reference gets from Dassl and deep-copies per task in its multitask test
loop (mvlpt.py:1013-1020)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class ClassificationEvaluator:
    def __init__(self, lab2cname=None, per_class: bool = False):
        self._lab2cname = lab2cname
        self._per_class = per_class
        self.reset()

    def reset(self):
        self._correct = 0
        self._total = 0
        self._y_true: list[np.ndarray] = []
        self._y_pred: list[np.ndarray] = []
        self._per_class_res = defaultdict(list) if self._per_class else None

    def clone(self):
        return ClassificationEvaluator(self._lab2cname, self._per_class)

    def process(self, logits, labels):
        logits = np.asarray(logits)
        labels = np.asarray(labels)
        if labels.ndim > 1:
            labels = labels.argmax(-1)
        pred = logits.argmax(-1)
        matches = (pred == labels).astype(np.int64)
        self._correct += int(matches.sum())
        self._total += len(labels)
        self._y_true.append(labels)
        self._y_pred.append(pred)
        if self._per_class_res is not None:
            for label, ok in zip(labels, matches):
                self._per_class_res[int(label)].append(int(ok))

    def evaluate(self) -> dict:
        from sklearn.metrics import f1_score

        y_true = np.concatenate(self._y_true) if self._y_true else np.zeros(0)
        y_pred = np.concatenate(self._y_pred) if self._y_pred else np.zeros(0)
        acc = 100.0 * self._correct / max(1, self._total)
        results = {
            "accuracy": acc,
            "error_rate": 100.0 - acc,
            "macro_f1": 100.0 * f1_score(
                y_true, y_pred, average="macro", zero_division=0)
            if self._total else 0.0,
        }
        if self._per_class_res is not None:
            accs = [100.0 * np.mean(v) for v in self._per_class_res.values() if v]
            results["perclass_accuracy"] = float(np.mean(accs)) if accs else 0.0
        return results
