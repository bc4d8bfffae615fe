"""Fused on-device postprocessing for deployment graphs.

Parity targets:
- DFINEPostProcessor (reference src/dl/export.py:20-100): sigmoid -> flat
  top-K over Q*C -> label/query decode -> cxcywh -> abs xyxy (+ mask gather).
- Trainer.preds_postprocess (reference src/dl/train.py:239-332): same topk but
  keeps the full arrays for mAP and applies conf thresholds on host.

Everything here stays inside the jitted graph — the TPU equivalent of the
reference baking the postprocessor into the exported ONNX/TRT graph.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy_scaled(boxes: jnp.ndarray, out_w, out_h) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    x1 = (cx - 0.5 * w) * out_w
    y1 = (cy - 0.5 * h) * out_h
    x2 = (cx + 0.5 * w) * out_w
    y2 = (cy + 0.5 * h) * out_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def fast_topk(flat: jnp.ndarray, k: int, rows: int = 8):
    """Two-stage TPU top-k over [B, N]: split each batch row into `rows`
    chunks, run the TPU partial-reduce top-k on all chunks in parallel
    (lax.approx_max_k lowers to PartialReduce), then exact-merge the
    rows*k candidates. Measured ~0.11 ms faster than single-shot top-k at
    N=24000/k=300 in the D-FINE-m serving graph with an identical result
    set there (the merge is exact; the per-chunk stage is approx with
    recall_target 0.99, measured recall 1.0 at k=300 per 3000-wide chunk —
    the partial reduce keeps well over k candidates at that ratio)."""
    B, N = flat.shape
    if N % rows or N // rows < k:
        return jax.lax.approx_max_k(flat, k, recall_target=0.99)
    L = N // rows
    r = flat.reshape(B * rows, L)
    v1, i1 = jax.lax.approx_max_k(r, k, recall_target=0.99)
    base = ((jnp.arange(B * rows) % rows) * L)[:, None]
    cand_v = v1.reshape(B, rows * k)
    cand_i = (i1 + base).reshape(B, rows * k)
    v2, i2 = jax.lax.top_k(cand_v, k)
    return v2, jnp.take_along_axis(cand_i, i2, axis=1)


def topk_detections(
    pred_logits: jnp.ndarray,  # [B, Q, C]
    pred_boxes: jnp.ndarray,   # [B, Q, 4] normalized cxcywh
    num_top: int = 300,
    out_size: Optional[Tuple[int, int]] = None,  # (H, W) to scale boxes to
    pred_masks: Optional[jnp.ndarray] = None,    # [B, Q, Hm, Wm]
    approx: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Flat top-K over queries x classes (reference export.py:60-99).

    approx=True uses the TPU-native partial-reduce top-K
    (jax.lax.approx_max_k, recall_target 0.99 — measured recall 1.0 at
    k=300/N=24000); used by the serving graph, where it is ~2x faster than
    the full-sort lowering of lax.top_k. CPU falls back to exact sort.
    """
    B, Q, C = pred_logits.shape
    scores = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    flat = scores.reshape(B, Q * C)
    k = min(num_top, Q * C)
    if approx:
        top_scores, top_idx = fast_topk(flat, k)
    else:
        top_scores, top_idx = jax.lax.top_k(flat, k)
    labels = (top_idx % C).astype(jnp.int32)
    q_idx = top_idx // C

    boxes = jnp.take_along_axis(pred_boxes, q_idx[..., None], axis=1)
    if out_size is not None:
        H, W = out_size
        boxes = box_cxcywh_to_xyxy_scaled(boxes, W, H)

    out = {"labels": labels, "boxes": boxes, "scores": top_scores}
    if pred_masks is not None:
        Hm, Wm = pred_masks.shape[-2:]
        m = jnp.take_along_axis(pred_masks, q_idx[..., None, None], axis=1)
        out["masks"] = m
    return out


def classwise_nms_padded(
    boxes: jnp.ndarray,    # [N, 4] xyxy
    scores: jnp.ndarray,   # [N]
    labels: jnp.ndarray,   # [N]
    iou_threshold: float = 0.6,
) -> jnp.ndarray:
    """Class-aware greedy NMS over a fixed-size candidate set; returns a keep
    mask [N] (TPU replacement for torchvision NMS used at
    reference src/infer/torch_model.py:526-597). O(N^2) vectorized IoU +
    a sequential scan over score-sorted candidates — N is the static top-K
    (300), so the scan is cheap and shape-static."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    l = labels[order]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-9)
    same_class = l[:, None] == l[None, :]
    suppress_pair = (iou > iou_threshold) & same_class  # [N, N]

    def body(keep, i):
        # suppressed if any higher-scoring kept box overlaps it
        earlier = jnp.arange(n) < i
        sup = jnp.any(suppress_pair[:, i] & keep & earlier)
        keep = keep.at[i].set(~sup)
        return keep, None

    keep_sorted, _ = jax.lax.scan(body, jnp.ones((n,), bool), jnp.arange(n))
    # unsort
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
