"""Tests for the evaluator-zoo tail: detection mAP, matting, caption
metrics, group-wise and mean-Lp (reference metrics.py:565-1248)."""

import numpy as np
import pytest

from mvlpt_tpu.evaluation.caption import (
    caption_bleu, caption_cider, caption_meteor, caption_report,
    caption_rouge_l)
from mvlpt_tpu.evaluation.detection import (
    detection_map_coco, detection_map_multi_iou, detection_map_single_iou)
from mvlpt_tpu.evaluation.matting import (
    matting_boundary_foreground_iou, matting_boundary_mean_iou,
    matting_foreground_iou, matting_l1_error, matting_mean_iou)
from mvlpt_tpu.evaluation.metrics import group_wise, mean_lp_error


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------

def test_detection_perfect_predictions():
    targets = [
        [[0, 10, 10, 50, 50], [1, 60, 60, 100, 100]],
        [[0, 0, 0, 30, 30]],
    ]
    predictions = [
        [[0, 0.9, 10, 10, 50, 50], [1, 0.8, 60, 60, 100, 100]],
        [[0, 0.95, 0, 0, 30, 30]],
    ]
    rep = detection_map_single_iou(predictions, targets, iou=0.5)
    assert rep == {"mAP_50": pytest.approx(1.0)}
    coco = detection_map_coco(predictions, targets, ious=(0.5,))
    assert coco["mAP_50"] == pytest.approx(1.0)
    assert coco["avg_mAP"] == pytest.approx(1.0)


def test_detection_misses_and_false_positives():
    targets = [[[0, 0, 0, 100, 100]]]
    # One overlapping hit below the threshold and one clean false positive.
    predictions = [[[0, 0.9, 200, 200, 300, 300]]]
    rep = detection_map_single_iou(predictions, targets, iou=0.5)
    assert rep["mAP_50"] == 0.0


def test_detection_duplicate_detections_count_once():
    # Second (lower-scored) detection of an already-claimed GT is a FP
    # (reference's already_detected set, metrics.py:636-643).
    targets = [[[0, 0, 0, 100, 100]]]
    predictions = [[[0, 0.9, 0, 0, 100, 100], [0, 0.8, 1, 1, 99, 99]]]
    rep = detection_map_single_iou(predictions, targets, iou=0.5)
    # sklearn AP of sequence [TP, FP] with scores [0.9, 0.8] is 1.0 at
    # recall 1.0 -> scaled by recall 1.0 -> 1.0
    assert rep["mAP_50"] == pytest.approx(1.0)


def test_detection_scoring_order_matters():
    # FP scored higher than the TP drags the interpolated precision down.
    targets = [[[0, 0, 0, 100, 100]]]
    predictions = [[[0, 0.95, 300, 300, 400, 400], [0, 0.9, 0, 0, 100, 100]]]
    rep = detection_map_single_iou(predictions, targets, iou=0.5)
    assert 0.0 < rep["mAP_50"] < 1.0


def test_detection_multi_iou_and_tag_wise():
    targets = [[[0, 0, 0, 100, 100]]]
    # IoU with the GT is 0.6: hit at 0.5, miss at 0.75.
    predictions = [[[0, 0.9, 0, 0, 60, 100]]]
    rep = detection_map_multi_iou(
        predictions, targets, ious=(0.5, 0.75), report_tag_wise=[True, False])
    assert rep["mAP_50"] == pytest.approx(1.0)
    assert rep["mAP_75"] == 0.0
    assert rep["tag_wise_AP_50"] == [pytest.approx(1.0)]


def test_detection_coco_partial_recall():
    # Two GT boxes, only one detected: precision 1 up to recall 0.5 then 0.
    # 101-point sampling -> 51/101 of the samples at precision 1.
    targets = [[[0, 0, 0, 100, 100], [0, 200, 200, 300, 300]]]
    predictions = [[[0, 0.9, 0, 0, 100, 100]]]
    rep = detection_map_coco(predictions, targets, ious=(0.5,))
    assert rep["mAP_50"] == pytest.approx(51 / 101, abs=1e-6)


def test_detection_coco_best_unclaimed_gt_matching():
    """pycocotools matches each detection to the best UNCLAIMED GT: d1
    takes A (its argmax), d2's argmax is also A but it still matches B
    — both TP (the VOC greedy argmax would mark d2 FP)."""
    A = [0, 0, 100, 100]
    B = [0, 40, 100, 140]          # overlaps A
    targets = [[[0, *A], [0, *B]]]
    d1 = [0, 0.9, 0, 0, 100, 100]   # IoU(A)=1.0, IoU(B)=0.43
    d2 = [0, 0.8, 0, 20, 100, 120]  # IoU(A)=IoU(B)=0.67, argmax ties to A
    predictions = [[d1, d2]]
    rep = detection_map_coco(predictions, targets, ious=(0.4,))
    assert rep["mAP_40"] == pytest.approx(1.0)


def test_detection_coco_max_dets_per_category():
    """maxDets truncates per (image, category), not per image: 4 class-1
    detections must not evict class-0's lower-scoring TP."""
    targets = [[[0, 0, 0, 100, 100], [1, 200, 200, 300, 300]]]
    cls0_tp = [0, 0.1, 0, 0, 100, 100]      # lowest score in the image
    cls1 = [[1, 0.9, 200, 200, 300, 300]] + [
        [1, 0.8 - i * 0.1, 400, 400, 500, 500] for i in range(3)]
    rep = detection_map_coco([[cls0_tp, *cls1]], targets, ious=(0.5,),
                             max_dets=4)
    # per-image cap of 4 would drop cls0_tp -> AP_0 = 0; per-category
    # keeps it -> both classes AP 1.0... cls1 has 3 FPs after its TP,
    # envelope keeps AP 1.0 (precision 1 at recall 1 comes first)
    assert rep["mAP_50"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# matting
# ---------------------------------------------------------------------------

def _disk_mask(h=64, w=64, cx=32, cy=32, r=15):
    yy, xx = np.mgrid[:h, :w]
    return np.where((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r, 255, 0).astype(
        np.uint8)


def test_matting_identical_masks():
    m = _disk_mask()
    assert matting_mean_iou([m], [m])["mIOU"] == pytest.approx(1.0)
    assert matting_foreground_iou([m], [m])["fgIOU"] == pytest.approx(1.0)
    assert matting_boundary_mean_iou([m], [m])["b_mIOU"] == pytest.approx(1.0)
    assert matting_boundary_foreground_iou([m], [m])["b_fgIOU"] == (
        pytest.approx(1.0))
    assert matting_l1_error([m], [m])["L1Err"] == 0.0


def test_matting_disjoint_masks():
    gt = _disk_mask(cx=16, cy=16, r=8)
    pred = _disk_mask(cx=48, cy=48, r=8)
    assert matting_foreground_iou([pred], [gt])["fgIOU"] == 0.0
    # background still overlaps, so mean IoU is strictly between 0 and 1
    miou = matting_mean_iou([pred], [gt])["mIOU"]
    assert 0.0 < miou < 1.0


def test_matting_all_background_gt():
    gt = np.zeros((32, 32), np.uint8)
    pred_empty = np.zeros((32, 32), np.uint8)
    pred_full = np.full((32, 32), 255, np.uint8)
    assert matting_foreground_iou([pred_empty], [gt])["fgIOU"] == 1.0
    assert matting_foreground_iou([pred_full], [gt])["fgIOU"] == 0.0


def test_matting_boundary_localizes_errors():
    # Error far from the boundary: plain fgIOU drops, boundary fgIOU
    # stays perfect (the hole is outside the contour band).
    gt = _disk_mask(r=20)
    pred = gt.copy()
    pred[30:34, 30:34] = 0  # hole at the disk center, > 5px from the edge
    assert matting_foreground_iou([pred], [gt])["fgIOU"] < 1.0
    assert matting_boundary_foreground_iou([pred], [gt])["b_fgIOU"] == (
        pytest.approx(1.0))


def test_matting_l1():
    gt = np.zeros((10, 10), np.uint8)
    pred = np.full((10, 10), 30, np.uint8)
    assert matting_l1_error([pred], [gt])["L1Err"] == pytest.approx(30.0)


# ---------------------------------------------------------------------------
# caption
# ---------------------------------------------------------------------------

def test_bleu_exact_match_is_one():
    rep = caption_bleu(["a cat sits on the mat"], [["a cat sits on the mat"]])
    for n in range(1, 5):
        assert rep[f"Bleu_{n}"] == pytest.approx(1.0, abs=1e-6)


def test_bleu_unigram_precision():
    # candidate "the the the" vs ref "the cat": clipped unigram count 1
    # (ref has one "the"), total 3, BP = exp(1 - 2/3)... cand longer: BP=1
    rep = caption_bleu(["the the the"], [["the cat"]])
    assert rep["Bleu_1"] == pytest.approx(1 / 3, abs=1e-6)


def test_bleu_brevity_penalty():
    # candidate shorter than the only reference -> BP < 1 even with
    # perfect precision
    rep = caption_bleu(["a cat"], [["a cat sits"]])
    assert rep["Bleu_1"] == pytest.approx(np.exp(1 - 3 / 2), abs=1e-6)


def test_bleu_empty_order_not_scored_one():
    # corpus has no 3-/4-grams: coco bleu_scorer smoothing (tiny/small)
    # gives those orders ~1e-6 precision, NOT 1.0 — Bleu_4 must collapse
    rep = caption_bleu(["a cat"], [["a cat"]])
    assert rep["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert rep["Bleu_2"] == pytest.approx(1.0, abs=1e-6)
    assert rep["Bleu_3"] < 0.05
    assert rep["Bleu_4"] < 0.05


def test_rouge_l():
    # LCS("the cat sat", "the cat on the mat") = "the cat" (2)
    rep = caption_rouge_l(["the cat sat"], [["the cat on the mat"]])
    p, r, beta = 2 / 3, 2 / 5, 1.2
    expected = (1 + beta**2) * p * r / (r + beta**2 * p)
    assert rep["ROUGE_L"] == pytest.approx(expected, abs=1e-6)


def test_cider_identical_beats_partial():
    refs = [["a dog runs in the park"], ["a bird flies over water"]]
    perfect = caption_cider(["a dog runs in the park",
                             "a bird flies over water"], refs)["CIDEr"]
    partial = caption_cider(["a dog runs",
                             "something else entirely here"], refs)["CIDEr"]
    assert perfect > partial >= 0.0
    assert perfect > 0.0


def test_meteor_perfect_and_fragmented():
    perfect = caption_meteor(["the cat sat down"],
                             [["the cat sat down"]])["METEOR"]
    # same words, scrambled -> same P/R but more chunks -> bigger penalty
    scrambled = caption_meteor(["down sat cat the"],
                               [["the cat sat down"]])["METEOR"]
    assert perfect == pytest.approx(1.0 - 0.5 * (1 / 4) ** 3)
    assert scrambled < perfect


def test_meteor_minimum_chunk_alignment():
    """The fragmentation penalty is defined over the minimum-chunk
    maximum matching: cand 'a b' vs ref 'b a b' must align a->ref[1],
    b->ref[2] (1 chunk), not the greedy a->ref[1], b->ref[0] (2 chunks)."""
    got = caption_meteor(["a b"], [["b a b"]])["METEOR"]
    p, r = 2 / 2, 2 / 3
    fmean = 10 * p * r / (r + 9 * p)
    want = fmean * (1 - 0.5 * (1 / 2) ** 3)
    assert got == pytest.approx(want, abs=1e-9)


def test_caption_report_dispatch():
    preds, refs = ["a cat"], [["a cat"]]
    assert "Bleu_4" in caption_report(preds, refs, "Bleu")
    assert "ROUGE_L" in caption_report(preds, refs, "ROUGE_L")
    assert "CIDEr" in caption_report(preds, refs, "CIDEr")
    assert "METEOR" in caption_report(preds, refs, "METEOR")
    with pytest.raises(KeyError):
        caption_report(preds, refs, "SPICE")


# ---------------------------------------------------------------------------
# group-wise + mean-Lp
# ---------------------------------------------------------------------------

def test_group_wise():
    from mvlpt_tpu.evaluation.metrics import accuracy

    y = np.array([0, 1, 0, 1])
    p = np.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.7], [0.4, 0.6]])
    groups = ["a", "a", "b", "b"]
    rep = group_wise(accuracy, y, p, groups)["group_wise_metrics"]
    assert rep["a"] == pytest.approx(1.0)
    assert rep["b"] == pytest.approx(0.5)


def test_mean_lp_error():
    y = np.array([0.0, 0.0, 0.0, 0.0])
    p = np.array([1.0, -1.0, 1.0, -1.0])
    # L1: (sum |e|)^1 / N = 4/4 = 1;  L2: sqrt(4)/4 = 0.5
    assert mean_lp_error(y, p, p=1) == pytest.approx(1.0)
    assert mean_lp_error(y, p, p=2) == pytest.approx(0.5)
    assert mean_lp_error(np.array([]), np.array([]), p=1) == 0.0


def test_threshold_accuracy_reference_semantics():
    """ThresholdAccuracyEvaluator (metrics.py:293-333) is per-sample
    |pred ∩ target| / |pred ∪ target| — NOT elementwise equality, which
    would count true negatives: on sparse multilabel with every score
    below threshold the answer is 0, not ~0.9. Values verified against
    the reference class executed side-by-side."""
    from mvlpt_tpu.evaluation.metrics import threshold_accuracy

    rng = np.random.RandomState(0)
    y = (rng.rand(50, 20) < 0.1).astype(int)
    assert threshold_accuracy(y, rng.rand(50, 20) * 0.4) == 0.0
    # hand-checkable: sample 0 IoU 1/2, sample 1 IoU 0 -> mean 0.25
    y2 = np.array([[1, 0, 0], [0, 1, 0]])
    p2 = np.array([[0.9, 0.8, 0.1], [0.1, 0.2, 0.9]])
    assert threshold_accuracy(y2, p2) == pytest.approx(0.25)
    # filter is >= threshold (a score AT 0.5 counts as predicted)
    assert threshold_accuracy(
        np.array([[1, 0, 0]]), np.array([[0.5, 0.0, 0.0]])) == 1.0
    # empty-union samples contribute 0 (clamped denominator, not nan)
    assert threshold_accuracy(
        np.zeros((2, 3), int), np.zeros((2, 3))) == 0.0
    # (N,) multiclass targets one-hot expand (metrics.py:122-130)
    assert threshold_accuracy(
        np.array([0, 2]), p2) == pytest.approx((1 / 2 + 1 / 1) / 2)


def test_tag_wise_accuracy_reference_semantics():
    """TagWiseAccuracyEvaluator (metrics.py:431-460) is argmax-based
    per-class recall (row-normalized confusion diagonal, nan→0) for
    multiclass — not 0.5-thresholded binary accuracy. Returns the mean
    of the reference's per-class list (results contract is scalar)."""
    from mvlpt_tpu.evaluation.metrics import tag_wise_accuracy

    y = np.array([0, 0, 1, 1, 2])
    p = np.array([[0.9, 0.1, 0.0],   # 0 -> 0 correct
                  [0.1, 0.9, 0.0],   # 0 -> 1 wrong
                  [0.0, 1.0, 0.0],   # 1 -> 1 correct
                  [0.0, 1.0, 0.0],   # 1 -> 1 correct
                  [1.0, 0.0, 0.0]])  # 2 -> 0 wrong
    # recalls: 0.5, 1.0, 0.0 -> mean 0.5
    assert tag_wise_accuracy(y, p) == pytest.approx(0.5)
    # class absent from targets: nan row -> 0, not nan
    y2 = np.array([0, 0])
    p2 = np.array([[1.0, 0.0], [1.0, 0.0]])
    assert tag_wise_accuracy(y2, p2) == pytest.approx(0.5)
