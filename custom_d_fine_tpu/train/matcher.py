"""Device-side Hungarian cost computation over padded targets.

Parity target: reference src/d_fine/matcher.py:110-247 (HungarianMatcher).
TPU redesign: instead of one CPU round-trip per (output set, image), the cost
matrices for every output set are computed on device as batched [B, Q, G]
tensors (focal class + L1 + GIoU, reference :150-169), stacked to [S, B, Q, G]
and solved entirely ON DEVICE by the exact batched JV auction solver
(ops/lapjv.py:batched_assignment — host callbacks are unavailable on this
runtime). Invalid (padded) target columns are masked to a high cost and their
assignments dropped via the per-image valid count.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..configs.registry import MatcherConfig
from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou_pairwise
from ..ops.lapjv import batched_assignment, go_union


def matching_cost(
    pred_logits: jnp.ndarray,  # [B, Q, C]
    pred_boxes: jnp.ndarray,   # [B, Q, 4] cxcywh
    tgt_labels: jnp.ndarray,   # [B, G]
    tgt_boxes: jnp.ndarray,    # [B, G, 4] cxcywh
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Batched cost matrix [B, Q, G] (reference matcher.py:131-169)."""
    f32 = jnp.float32
    logits = pred_logits.astype(f32)
    pb = pred_boxes.astype(f32)
    tb = tgt_boxes.astype(f32)

    # class prob at each gt column, [B, Q, G]. One-hot MXU contraction instead
    # of take_along_axis: the row-gather lowers to a ~3 ms fusion PER OUTPUT
    # SET on TPU (6 sets = 17.5 ms/step, profile 2026-08-17) while the matmul
    # is microseconds. Exact: each output picks a single element, and HIGHEST
    # keeps full-f32 MXU passes.
    num_classes = logits.shape[-1]
    lbl = jnp.clip(tgt_labels, 0, num_classes - 1)
    oh = jax.nn.one_hot(lbl, num_classes, dtype=f32)  # [B, G, C]

    def pick(prob):
        return jnp.einsum("bqc,bgc->bqg", prob, oh,
                          precision=jax.lax.Precision.HIGHEST)

    if cfg.use_focal_loss:
        p = pick(jax.nn.sigmoid(logits))
        neg_cost = (1 - cfg.alpha) * (p ** cfg.gamma) * (-jnp.log(1 - p + 1e-8))
        pos_cost = cfg.alpha * ((1 - p) ** cfg.gamma) * (-jnp.log(p + 1e-8))
        cost_class = pos_cost - neg_cost
    else:
        cost_class = -pick(jax.nn.softmax(logits, axis=-1))

    cost_bbox = jnp.abs(pb[:, :, None, :] - tb[:, None, :, :]).sum(-1)  # L1 [B,Q,G]
    cost_giou = -generalized_box_iou_pairwise(box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(tb))

    C = cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class + cfg.cost_giou * cost_giou
    return jnp.nan_to_num(C, nan=1.0)


def mask_matching_cost(
    pred_masks: jnp.ndarray,  # [B, Q, Hm, Wm] logits
    tgt_masks: jnp.ndarray,   # [B, G, Hm, Wm] {0,1}
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Pairwise focal + Dice mask costs [B, Q, G] (reference matcher.py:19-71,
    :175-237). Batched with lax.map over images to bound the [Q, H*W]
    temporary memory (the reference loops images in Python for the same
    reason)."""

    def per_image(args):
        pm, tm = args  # [Q,Hm,Wm], [G,Hm,Wm]
        Q = pm.shape[0]
        G = tm.shape[0]
        p = pm.reshape(Q, -1).astype(jnp.float32)
        t = tm.reshape(G, -1).astype(jnp.float32)
        prob = jax.nn.sigmoid(p)
        cost = jnp.zeros((Q, G), jnp.float32)
        if cfg.cost_mask_dice > 0:
            num = 2.0 * (prob @ t.T)
            den = prob.sum(1, keepdims=True) + t.sum(1)[None, :]
            dice = (num + 1e-6) / (den + 1e-6)
            cost = cost + cfg.cost_mask_dice * (1.0 - dice)
        if cfg.cost_mask > 0:
            neg = (1 - cfg.alpha) * (prob ** cfg.gamma) * (-jnp.log(1 - prob + 1e-8))
            pos = cfg.alpha * ((1 - prob) ** cfg.gamma) * (-jnp.log(prob + 1e-8))
            focal = (pos @ t.T + neg @ (1.0 - t).T) / p.shape[1]
            cost = cost + cfg.cost_mask * focal
        return cost

    return jax.lax.map(per_image, (pred_masks, tgt_masks))


def match_topk(cost: jnp.ndarray, gt_valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """One-to-many assignment (reference get_top_k_matches, matcher.py:259-285):
    k rounds of exact assignment; after each round the matched queries are
    masked out (cost 1e6), so every gt accumulates k DISTINCT queries.

    cost [B, Q, G], gt_valid [B, G] -> assign [k, B, G] (query per gt slot,
    round-major; invalid gt slots carry arbitrary indices — gate with gt_valid
    exactly as for the one-to-one matcher output).
    """
    B, Q, _ = cost.shape
    n_valid = gt_valid.sum(-1).astype(jnp.int32)
    c = jnp.where(gt_valid[:, None, :], cost, 1e6)
    rounds = []
    for _ in range(k):
        a = batched_assignment(c[None], n_valid)[0]  # [B, G]
        rounds.append(a)
        hit = gt_valid & (a >= 0) & (a < Q)
        q = jnp.where(hit, a, 0)
        taken = jnp.zeros((B, Q), bool).at[
            jnp.arange(B)[:, None], q
        ].max(hit)
        c = jnp.where(taken[:, :, None], 1e6, c)
    return jnp.stack(rounds, axis=0)


def match_all_sets(
    output_sets: List[Dict[str, jnp.ndarray]],  # set 0 MUST be the final layer
    targets: Dict[str, jnp.ndarray],
    cfg: MatcherConfig,
):
    """Compute costs for every output set and solve them ON DEVICE with the
    exact LAPJV solver (ops/lapjv.py) — no host round-trip (the TPU runtime
    here does not support callbacks, and a sync would stall the step anyway).

    Returns:
      assign [S, B, G]  — query index matched to each gt slot (-1 invalid),
      go_g [B, Q]       — per-query GO-union gt index,
      go_valid [B, Q]   — per-query GO-union validity.
    """
    def set_cost(o):
        c = matching_cost(o["pred_logits"], o["pred_boxes"], targets["labels"],
                          targets["boxes"], cfg)
        # mask costs for sets that carry mask predictions (reference
        # matcher.py:175-237); invalid gt mask columns zeroed by validity below
        if (
            "pred_masks" in o and o["pred_masks"] is not None
            and targets.get("masks") is not None
            and (cfg.cost_mask > 0 or cfg.cost_mask_dice > 0)
        ):
            c = c + mask_matching_cost(o["pred_masks"], targets["masks"], cfg)
        return c

    costs = jnp.stack([set_cost(o) for o in output_sets], axis=0)  # [S, B, Q, G]
    n_valid = targets["valid"].sum(-1).astype(jnp.int32)
    costs = jax.lax.stop_gradient(costs)
    # mask invalid gt columns so they never attract a query
    costs = jnp.where(targets["valid"][None, :, None, :], costs, 1e6)
    assign = batched_assignment(costs, n_valid)  # [S, B, G]
    num_queries = output_sets[0]["pred_logits"].shape[1]
    go_g, go_valid = go_union(assign, targets["valid"], num_queries)
    return assign, go_g, go_valid
