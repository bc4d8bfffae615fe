"""Vectorized COCOeval matching: randomized differential test against the
scalar pycocotools-style reference scan, plus a throughput floor (the round-2
implementation was a per-(class,image) T*D*G pure-Python triple loop — VERDICT
round-2 weak item 3)."""

import time

import numpy as np

from custom_d_fine_tpu.eval.coco_map import IOU_THRESHOLDS, _match_image, coco_map


def _match_image_scalar(ious, gt_ignore, gt_crowd, dt_out_of_range):
    """The original pure-Python scan (pycocotools COCOeval.evaluateImg
    semantics, verbatim from the round-2 implementation) — kept as the oracle."""
    T = len(IOU_THRESHOLDS)
    D, G = ious.shape
    tp = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    for t, thr in enumerate(IOU_THRESHOLDS):
        gt_m = np.full(G, -1)
        for d in range(D):
            best = min(thr, 1.0 - 1e-10)
            m = -1
            for g in range(G):
                if gt_m[g] >= 0 and not gt_crowd[g]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                    break
                if ious[d, g] < best:
                    continue
                best = ious[d, g]
                m = g
            if m == -1:
                dt_ig[t, d] = dt_out_of_range[d]
                continue
            gt_m[m] = d
            dt_ig[t, d] = gt_ignore[m]
            tp[t, d] = not gt_ignore[m]
    return tp, dt_ig


def test_vectorized_matches_scalar_randomized():
    rng = np.random.default_rng(0)
    for trial in range(200):
        D = int(rng.integers(0, 12))
        G = int(rng.integers(0, 10))
        # quantized IoUs force plenty of exact ties (the tie-break rule)
        ious = rng.integers(0, 21, (D, G)).astype(np.float64) / 20.0
        crowd = rng.random(G) < 0.25
        ignore = crowd | (rng.random(G) < 0.25)
        # GTs must arrive ignored-last (coco_map sorts before calling)
        order = np.argsort(ignore, kind="mergesort")
        ious, ignore, crowd = ious[:, order], ignore[order], crowd[order]
        d_oor = rng.random(D) < 0.2

        tp_v, ig_v = _match_image(ious, ignore, crowd, d_oor)
        tp_s, ig_s = _match_image_scalar(ious, ignore, crowd, d_oor)
        np.testing.assert_array_equal(tp_v, tp_s, err_msg=f"tp trial {trial}")
        np.testing.assert_array_equal(ig_v, ig_s, err_msg=f"ig trial {trial}")


def test_coco_map_speed_realistic_eval():
    """1,000 images x 10 classes x 100 detections must finish in seconds
    (VERDICT round-2 done-criterion), not the minutes the triple loop took."""
    rng = np.random.default_rng(1)
    n_img, n_cls, n_det, n_gt = 1000, 10, 100, 12
    preds, gts = [], []
    for _ in range(n_img):
        xy = rng.uniform(0, 500, (n_det, 2))
        wh = rng.uniform(10, 100, (n_det, 2))
        preds.append({
            "boxes": np.concatenate([xy, xy + wh], 1),
            "labels": rng.integers(0, n_cls, n_det),
            "scores": rng.random(n_det),
        })
        gxy = rng.uniform(0, 500, (n_gt, 2))
        gwh = rng.uniform(10, 100, (n_gt, 2))
        gts.append({
            "boxes": np.concatenate([gxy, gxy + gwh], 1),
            "labels": rng.integers(0, n_cls, n_gt),
        })
    t0 = time.time()
    m = coco_map(preds, gts, area_ranges=("all",))
    dt = time.time() - t0
    assert np.isfinite(m["map"])
    assert dt < 30.0, f"coco_map too slow: {dt:.1f}s for 1000 imgs"
