"""The reference's embedded synthetic validator cases (validator.py:662-901)
ported as a real pytest suite, plus RLE roundtrip and coco_map sanity checks."""

import numpy as np
import pytest

from custom_d_fine_tpu.eval.coco_map import coco_map
from custom_d_fine_tpu.eval.rle import mask_to_rle, masks_to_rle, rle_to_masks
from custom_d_fine_tpu.eval.validator import Validator


def box_from_mask(m):
    ys, xs = np.where(m > 0)
    if len(ys) == 0:
        return np.array([0, 0, 0, 0], np.float32)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def pack(masks, labels, scores=None):
    if len(masks) == 0:
        out = {"masks": np.zeros((0, 1, 1), np.uint8),
               "boxes": np.zeros((0, 4), np.float32),
               "labels": np.zeros((0,), np.int64)}
    else:
        ms = np.stack([np.asarray(m, np.uint8) for m in masks])
        out = {"masks": ms,
               "boxes": np.stack([box_from_mask(m) for m in ms]),
               "labels": np.asarray(labels, np.int64)}
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
    return out


def run_case(gt, preds, iou_thr=0.5):
    labels = set()
    for g in gt:
        labels.update(np.asarray(g["labels"]).tolist())
    for p in preds:
        labels.update(np.asarray(p["labels"]).tolist())
    v = Validator(gt, preds, {l: f"class_{l}" for l in labels},
                  conf_thresh=0.5, iou_thresh=iou_thr, compute_maps=False)
    return v.compute_metrics()


M_SMALL = np.array([[0, 0, 0, 0], [0, 1, 1, 0], [0, 1, 1, 0], [0, 0, 0, 0]], np.uint8)
M_FULL = np.ones((4, 4), np.uint8)
M_PARTIAL = np.array([[1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1], [0, 0, 0, 0]], np.uint8)


def test_case1_perfect_match():
    m = run_case([pack([M_SMALL], [0])], [pack([M_SMALL], [0], [1.0])])
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(1.0)


def test_case2_partial_above_threshold():
    m = run_case([pack([M_FULL], [0])], [pack([M_PARTIAL], [0], [1.0])])
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(0.75)


def test_case3_misclassification():
    m = run_case([pack([M_SMALL], [0])], [pack([M_SMALL], [1], [1.0])])
    assert m["precision"] == pytest.approx(0.0)
    assert m["recall"] == pytest.approx(0.0)
    assert m["iou"] == pytest.approx(0.0)


def test_case4_pure_fp():
    m = run_case([pack([], [])], [pack([M_SMALL], [0], [1.0])])
    assert m["precision"] == pytest.approx(0.0)
    assert m["recall"] == pytest.approx(0.0)


def test_case5_resolution_mismatch():
    gt = pack([np.ones((10, 10), np.uint8)], [2])
    pred = pack([np.ones((5, 5), np.uint8)], [2], [1.0])
    m = run_case([gt], [pred])
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(1.0)


def test_case6_one_gt_many_preds():
    gt6 = np.zeros((7, 8), np.uint8)
    gt6[1:6, 1:7] = 1
    p1 = np.zeros((7, 8), np.uint8)
    p1[1:3, 1:6] = 1
    p1[3, 1:4] = 1
    p1[4, 1:3] = 1
    p1[5, 1:3] = 1
    p1[5, 6] = 1
    p1[6, 5:7] = 1
    p2 = np.zeros((7, 8), np.uint8)
    p2[4:7, 5:7] = 1
    m = run_case([pack([gt6], [0])], [pack([p1, p2], [0, 0], [1.0, 1.0])])
    assert m["iou"] == pytest.approx(0.28125)
    assert m["recall"] == pytest.approx(1.0)
    assert m["precision"] == pytest.approx(0.5)


def test_rle_roundtrip():
    masks = np.stack([M_SMALL, M_FULL])
    rles = masks_to_rle(masks)
    decoded = rle_to_masks(rles)
    np.testing.assert_array_equal(masks, decoded)
    # empty mask
    empty = np.zeros((6, 5), np.uint8)
    np.testing.assert_array_equal(rle_to_masks([mask_to_rle(empty)])[0], empty)
    # full mask (starts with foreground -> leading zero count)
    full = np.ones((3, 3), np.uint8)
    np.testing.assert_array_equal(rle_to_masks([mask_to_rle(full)])[0], full)


def test_validator_with_rle():
    gt = pack([M_SMALL], [0])
    pred = pack([M_SMALL], [0], [1.0])
    for s in (gt, pred):
        s["masks_rle"] = masks_to_rle(s.pop("masks"))
    m = run_case([gt], [pred])
    assert m["precision"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(1.0)


def test_coco_map_perfect_and_degraded():
    gt = [{"labels": np.array([0, 1]),
           "boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)}]
    perfect = [{"labels": np.array([0, 1]),
                "boxes": gt[0]["boxes"].copy(),
                "scores": np.array([0.9, 0.8], np.float32)}]
    m = coco_map(perfect, gt)
    assert m["map_50"] == pytest.approx(1.0)
    assert m["map"] == pytest.approx(1.0)

    # slightly offset boxes: perfect at iou 0.5 but not at 0.95
    off = [{"labels": np.array([0, 1]),
            "boxes": np.array([[1, 1, 11, 11], [22, 22, 42, 42]], np.float32),
            "scores": np.array([0.9, 0.8], np.float32)}]
    m2 = coco_map(off, gt)
    assert m2["map_50"] == pytest.approx(1.0)
    assert m2["map"] < 1.0

    # missing detection halves recall
    half = [{"labels": np.array([0]),
             "boxes": np.array([[0, 0, 10, 10]], np.float32),
             "scores": np.array([0.9], np.float32)}]
    m3 = coco_map(half, gt)
    assert m3["map_50"] == pytest.approx(0.5, abs=0.01)


def test_confusion_matrix_structure():
    gt = [pack([M_SMALL], [0])]
    pred = [pack([M_SMALL], [1], [1.0])]
    labels = {0: "a", 1: "b"}
    v = Validator(gt, pred, labels, compute_maps=False)
    v.compute_metrics()
    # misclassification: gt class 0 matched to pred class 1
    assert v.conf_matrix[0, 1] == 1
    assert v.conf_matrix.shape == (3, 3)


# --------- COCOeval-semantics fixtures (round-1 VERDICT item 8) -------------
# Hand-computed cases encoding the documented pycocotools behaviors that a
# naive AP implementation gets wrong: crowd absorption, area-range ignores,
# per-image-per-category maxDets truncation (pycocotools' evaluateImg
# `dt=dt[0:maxDet]`), and the non-ignored-first matching preference.


def _img(boxes, labels, scores=None, iscrowd=None):
    d = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
         "labels": np.asarray(labels, np.int32)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if iscrowd is not None:
        d["iscrowd"] = np.asarray(iscrowd, bool)
    return d


def test_coco_map_crowd_absorbs_duplicates():
    """Detections matched to a crowd GT are ignored (not FP), and the crowd
    GT itself does not count toward n_gt (COCOeval gtIg)."""
    gt = [_img([[0, 0, 50, 50], [100, 100, 150, 150]], [0, 0],
               iscrowd=[False, True])]
    # two high-scored dets on the crowd region OUTRANK the real TP: as crowd
    # matches they are ignored, so AP stays 1.0
    preds = [_img([[100, 100, 150, 150], [102, 102, 150, 150], [0, 0, 50, 50]],
                  [0, 0, 0], scores=[0.9, 0.8, 0.7])]
    m = coco_map(preds, gt)
    assert m["map_50"] == pytest.approx(1.0)  # crowd dets are NOT false positives

    # without the crowd flag only one of them can match; the duplicate is a
    # higher-ranked FP and drags AP below 1
    gt2 = [_img([[0, 0, 50, 50], [100, 100, 150, 150]], [0, 0])]
    m2 = coco_map(preds, gt2)
    assert m2["map_50"] < 1.0


def test_coco_map_area_range_ignores():
    """Out-of-range GTs are ignored; unmatched out-of-range detections are
    ignored rather than FP (COCOeval dtIg |= unmatched & outside aRng)."""
    # one small (20x20=400 < 32^2) and one large (200x200) object
    gt = [_img([[0, 0, 20, 20], [100, 100, 300, 300]], [0, 0])]
    preds = [_img([[0, 0, 20, 20], [100, 100, 300, 300]], [0, 0],
                  scores=[0.9, 0.8])]
    m = coco_map(preds, gt)
    assert m["map_small"] == pytest.approx(1.0)
    assert m["map_large"] == pytest.approx(1.0)
    assert m["map_medium"] == -1.0  # no medium GT -> COCOeval's -1

    # a stray TOP-scored small FP must not damage map_large (it is
    # area-ignored there), but it is a leading FP in the small bucket
    preds2 = [_img([[0, 0, 20, 20], [100, 100, 300, 300], [400, 400, 415, 415]],
                   [0, 0, 0], scores=[0.9, 0.8, 0.95])]
    m2 = coco_map(preds2, gt)
    assert m2["map_large"] == pytest.approx(1.0)
    assert m2["map_small"] < 1.0


def test_coco_map_maxdets_per_image_per_category():
    """pycocotools truncates to maxDets per (image, category) AFTER score
    sorting; a low-scored TP beyond the cut contributes nothing."""
    gt = [_img([[0, 0, 50, 50], [100, 0, 150, 50]], [0, 0])]
    # 3 dets: two junk high scores, the real ones ranked 3rd/4th
    preds = [_img([[200, 200, 250, 250], [300, 300, 350, 350],
                   [0, 0, 50, 50], [100, 0, 150, 50]],
                  [0, 0, 0, 0], scores=[0.95, 0.9, 0.8, 0.7])]
    full = coco_map(preds, gt, max_dets=100)
    cut = coco_map(preds, gt, max_dets=2)
    assert full["map_50"] > 0.4   # TPs exist at rank 3/4
    assert cut["map_50"] == 0.0   # truncation removed them

    # per-category: 2 dets of another class must not consume class-0 slots
    gt_mix = [_img([[0, 0, 50, 50]], [0])]
    preds_mix = [_img([[200, 200, 250, 250], [300, 300, 350, 350],
                       [0, 0, 50, 50]],
                      [1, 1, 0], scores=[0.95, 0.9, 0.8])]
    m_mix = coco_map(preds_mix, gt_mix, max_dets=2)
    # class-0 TP is rank 1 within its own category -> survives the cut
    assert m_mix["map_50"] > 0.4


def test_coco_map_prefers_non_ignored_gt():
    """A detection overlapping both a crowd GT (higher IoU) and a real GT
    (IoU above threshold) must match the REAL one (COCOeval iterates
    non-ignored GTs first and stops before ignored ones once matched)."""
    gt = [_img([[0, 0, 100, 100], [0, 0, 130, 130]], [0, 0],
               iscrowd=[False, True])]
    # detection closer to the crowd box but still >0.5 IoU with the real GT
    preds = [_img([[0, 0, 120, 120]], [0], scores=[0.9])]
    m = coco_map(preds, gt, area_ranges=("all",))
    assert m["map_50"] == pytest.approx(1.0)  # real GT matched -> TP


def test_coco_map_mar_100():
    gt = [_img([[0, 0, 50, 50], [100, 100, 200, 200]], [0, 0])]
    preds = [_img([[0, 0, 50, 50]], [0], scores=[0.9])]
    m = coco_map(preds, gt)
    assert m["mar_100"] == pytest.approx(0.5)
