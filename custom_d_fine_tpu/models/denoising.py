"""Contrastive denoising (CDN) query construction with static shapes.

Parity target: reference src/d_fine/arch/utils.py:357-467
(get_contrastive_denoising_training_group). The torch version sizes the
denoising layout dynamically per batch (num_group = num_denoising //
max_gt_num); that is shape-dynamic and would retrace XLA every step. The TPU
redesign fixes the layout at trace time from a static per-image GT capacity
`dn_max_gt` (config), pads every image's GT to that capacity with validity
masks, and masks invalid slots out of the loss. The group-blind attention-mask
structure and noise model (label flip p=ratio/2, 1x pos / 1-2x neg box jitter)
are identical.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh, inverse_sigmoid


def dn_layout(num_denoising: int, dn_max_gt: int, num_queries: int):
    """Static layout: (num_group, num_dn_slots, total queries)."""
    num_group = max(1, num_denoising // dn_max_gt)
    num_dn = 2 * num_group * dn_max_gt
    return num_group, num_dn, num_dn + num_queries


def build_dn_attn_mask(num_group: int, dn_max_gt: int, num_queries: int) -> np.ndarray:
    """Block mask (True = blocked): match queries cannot see DN queries; DN
    groups cannot see each other (reference arch/utils.py:437-455). Static
    numpy constant — folded into the compiled graph."""
    pair = 2 * dn_max_gt
    num_dn = num_group * pair
    tgt = num_dn + num_queries
    mask = np.zeros((tgt, tgt), dtype=bool)
    mask[num_dn:, :num_dn] = True
    for g in range(num_group):
        s, e = g * pair, (g + 1) * pair
        mask[s:e, :s] = True
        mask[s:e, e:num_dn] = True
    return mask


def build_cdn_group(
    rng: jax.Array,
    labels: jnp.ndarray,   # [B, G] int32, padded with num_classes
    boxes: jnp.ndarray,    # [B, G, 4] normalized cxcywh
    valid: jnp.ndarray,    # [B, G] bool
    *,
    num_classes: int,
    num_group: int,
    dn_max_gt: int,
    label_noise_ratio: float,
    box_noise_scale: float,
) -> Dict[str, jnp.ndarray]:
    """Returns noisy class labels + unactivated boxes for the DN slots, plus the
    per-slot validity/positivity masks the criterion needs.

    Output slot order per group: [dn_max_gt positive | dn_max_gt negative],
    groups concatenated — identical to the reference tiling (:394-400).
    """
    B, G = labels.shape
    Gd = dn_max_gt

    # --- cycle-fill the static capacity with real GTs ---------------------
    # The torch reference sizes num_group = num_denoising // max_gt_in_batch
    # PER BATCH (:373-379), so its positive-query budget is always
    # ~num_denoising regardless of how few GTs an image has. A static layout
    # that merely padded each group to dn_max_gt with INVALID slots would
    # shrink that budget by a factor of dn_max_gt / n for images with n GTs
    # (measured: -0.18 val mAP@50 on the 120-step convergence A/B,
    # tools/trained_parity.py eval_conv). Instead we fill every slot of every
    # group by cycling the image's valid GTs (slot j of a group holds GT
    # j % n, each repetition independently noised) — the same supervision
    # budget as the reference with identical static shapes. Images with zero
    # GTs keep fully-invalid slots.
    order = jnp.argsort(~valid, axis=1, stable=True)  # valid GTs first
    n = jnp.minimum(valid.sum(axis=1), Gd).astype(jnp.int32)  # usable GTs
    slot = jnp.arange(Gd, dtype=jnp.int32)[None] % jnp.maximum(n, 1)[:, None]
    gt_index = jnp.take_along_axis(order.astype(jnp.int32), slot, axis=1)  # [B, Gd] -> rows of the ORIGINAL [B, G] targets
    labels = jnp.take_along_axis(labels, gt_index, axis=1)
    boxes = jnp.take_along_axis(boxes, gt_index[..., None], axis=1)
    valid = jnp.broadcast_to((n > 0)[:, None], (B, Gd))
    labels = jnp.where(valid, labels, num_classes)
    boxes = jnp.where(valid[..., None], boxes, 0.0)

    reps = 2 * num_group
    q_labels = jnp.tile(labels, (1, reps))            # [B, reps*Gd]
    q_boxes = jnp.tile(boxes, (1, reps, 1))
    q_valid = jnp.tile(valid, (1, reps))

    # negative half of each group pair
    neg = jnp.tile(
        jnp.concatenate([jnp.zeros((Gd,), bool), jnp.ones((Gd,), bool)]), (num_group,)
    )  # [reps*Gd]
    neg = jnp.broadcast_to(neg[None, :], q_labels.shape)

    k_label, k_sign, k_part = jax.random.split(rng, 3)

    if label_noise_ratio > 0:
        flip = jax.random.uniform(k_label, q_labels.shape) < (label_noise_ratio * 0.5)
        new_label = jax.random.randint(k_label, q_labels.shape, 0, num_classes, dtype=q_labels.dtype)
        q_labels = jnp.where(flip & q_valid, new_label, q_labels)

    if box_noise_scale > 0:
        known = box_cxcywh_to_xyxy(q_boxes)
        diff = jnp.tile(q_boxes[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        rand_sign = jax.random.randint(k_sign, known.shape, 0, 2).astype(known.dtype) * 2.0 - 1.0
        rand_part = jax.random.uniform(k_part, known.shape)
        rand_part = jnp.where(neg[..., None], rand_part + 1.0, rand_part)
        known = jnp.clip(known + rand_sign * rand_part * diff, 0.0, 1.0)
        q_boxes = jnp.abs(box_xyxy_to_cxcywh(known))

    dn_bbox_unact = inverse_sigmoid(q_boxes)

    # positive slots: first half of each pair AND valid — the criterion matches
    # positive slot (g, j) to gt j (reference get_cdn_matched_indices,
    # dfine_criterion.py:809-831).
    positive = q_valid & (~neg)

    return {
        "labels": q_labels,             # [B, num_dn]
        "bbox_unact": dn_bbox_unact,    # [B, num_dn, 4]
        "valid": q_valid,               # [B, num_dn]
        "positive": positive,           # [B, num_dn]
        "gt_index": gt_index,           # [B, Gd] slot j -> original GT row
    }
