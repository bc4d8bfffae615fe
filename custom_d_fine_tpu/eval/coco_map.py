"""COCO-style mean average precision (pure numpy).

Replaces the reference's torchmetrics MeanAveragePrecision(faster_coco_eval)
dependency (src/dl/validator.py:52-67,109-127) with a self-contained
implementation of the COCOeval protocol: per-(class, IoU-threshold) greedy
score-ordered matching, 101-point interpolated precision, IoU thresholds
0.50:0.05:0.95, maxDets=100. Supports box IoU and mask IoU ("segm").
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a [N,4], b [M,4] xyxy -> [N,M]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def _mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a [N,H,W], b [M,H,W] binary -> [N,M]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    af = a.reshape(len(a), -1).astype(np.float32)
    bf = b.reshape(len(b), -1).astype(np.float32)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def _ap_per_class(
    scores: np.ndarray,       # [D] detection scores (all images, one class)
    matched: np.ndarray,      # [T, D] bool: detection matched at iou threshold t
    n_gt: int,
) -> np.ndarray:
    """101-point interpolated AP per IoU threshold -> [T]."""
    T, D = matched.shape
    if n_gt == 0:
        return np.full((T,), np.nan)
    if D == 0:
        return np.zeros((T,))
    order = np.argsort(-scores, kind="stable")
    m = matched[:, order]
    tp = np.cumsum(m, axis=1)
    fp = np.cumsum(~m, axis=1)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    aps = np.zeros((T,))
    for t in range(T):
        # monotone non-increasing precision envelope
        pr = precision[t][::-1]
        pr = np.maximum.accumulate(pr)[::-1]
        rc = recall[t]
        # 101-point interpolation: precision at first recall >= r
        idx = np.searchsorted(rc, RECALL_POINTS, side="left")
        q = np.where(idx < len(pr), pr[np.minimum(idx, len(pr) - 1)], 0.0)
        q = np.where(idx < len(pr), q, 0.0)
        aps[t] = q.mean()
    return aps


def coco_map(
    preds: List[Dict],
    gts: List[Dict],
    iou_type: str = "bbox",
    max_dets: int = 100,
) -> Dict[str, float]:
    """preds/gts: per-image dicts with 'labels' [N], 'scores' [N] (preds only),
    and 'boxes' [N,4] xyxy (iou_type='bbox') or 'masks' [N,H,W] (iou_type='segm').
    Returns {"map": mAP@[.5:.95], "map_50": mAP@.5, "map_75": mAP@.75}.
    """
    assert len(preds) == len(gts)
    key = "masks" if iou_type == "segm" else "boxes"
    iou_fn = _mask_iou if iou_type == "segm" else _box_iou
    T = len(IOU_THRESHOLDS)

    classes = set()
    for g in gts:
        classes.update(np.asarray(g["labels"]).astype(int).tolist())
    for p in preds:
        classes.update(np.asarray(p["labels"]).astype(int).tolist())

    ap_all = []  # per class: [T]
    for cls in sorted(classes):
        cls_scores = []
        cls_matched = []
        n_gt = 0
        for p, g in zip(preds, gts):
            gl = np.asarray(g["labels"]).astype(int)
            pl = np.asarray(p["labels"]).astype(int)
            g_sel = np.flatnonzero(gl == cls)
            p_sel = np.flatnonzero(pl == cls)
            n_gt += len(g_sel)
            if len(p_sel) == 0:
                continue
            ps = np.asarray(p["scores"])[p_sel]
            order = np.argsort(-ps, kind="stable")[:max_dets]
            p_sel = p_sel[order]
            ps = ps[order]

            p_items = np.asarray(p[key])[p_sel]
            g_items = np.asarray(g[key])[g_sel] if len(g_sel) else np.zeros((0,) + np.asarray(p[key]).shape[1:])
            ious = iou_fn(p_items, g_items)  # [D, G]

            D = len(p_sel)
            m = np.zeros((T, D), bool)
            for t, thr in enumerate(IOU_THRESHOLDS):
                g_used = np.zeros(len(g_sel), bool)
                for d in range(D):  # score order already
                    if len(g_sel) == 0:
                        break
                    cand = ious[d] * (~g_used)
                    j = int(np.argmax(cand))
                    if cand[j] >= thr:
                        g_used[j] = True
                        m[t, d] = True
            cls_scores.append(ps)
            cls_matched.append(m)

        scores = np.concatenate(cls_scores) if cls_scores else np.zeros((0,))
        matched = np.concatenate(cls_matched, axis=1) if cls_matched else np.zeros((T, 0), bool)
        ap_all.append(_ap_per_class(scores, matched, n_gt))

    if not ap_all:
        return {"map": 0.0, "map_50": 0.0, "map_75": 0.0}
    ap = np.stack(ap_all)  # [C, T]
    with np.errstate(invalid="ignore"):
        map_all = float(np.nanmean(ap))
        map_50 = float(np.nanmean(ap[:, 0]))
        map_75 = float(np.nanmean(ap[:, 5]))
    return {
        "map": 0.0 if np.isnan(map_all) else map_all,
        "map_50": 0.0 if np.isnan(map_50) else map_50,
        "map_75": 0.0 if np.isnan(map_75) else map_75,
    }
