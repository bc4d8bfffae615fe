"""Box utilities (JAX): conversions, IoU, GIoU.

Parity targets: reference src/d_fine/arch/utils.py:12-73 (box_iou,
generalized_box_iou, conversions) — re-expressed as pure jnp functions that
are safe for padded/degenerate boxes (no asserts; masked callers decide).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    w = jnp.maximum(w, 0.0)
    h = jnp.maximum(h, 0.0)
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.0):
    """Pairwise IoU: boxes1 [..., N, 4] x boxes2 [..., M, 4] -> [..., N, M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / (union + eps)
    return iou, union


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9):
    """IoU of aligned pairs: [..., 4] x [..., 4] -> [...]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + eps)


def generalized_box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9):
    """Pairwise GIoU [..., N, M] (reference arch/utils.py:28-51, minus asserts —
    padded rows are masked by the caller)."""
    iou, union = box_iou_pairwise(boxes1, boxes2, eps=eps)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / (area + eps)


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9):
    """GIoU of aligned pairs [...]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + eps)
    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0)
    area_e = wh_e[..., 0] * wh_e[..., 1]
    return iou - (area_e - union) / (area_e + eps)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1.0 - x, eps))
