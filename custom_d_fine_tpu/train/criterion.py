"""D-FINE criterion: VFL + box L1/GIoU + FGL/DDF (+ cropped mask losses),
computed over padded/masked matches with static shapes.

Parity target: reference src/d_fine/dfine_criterion.py —
loss_labels_vfl (:92-122), loss_boxes (:124-143), loss_local FGL+DDF
(:145-237), loss_masks cropped BCE/Dice (:335-556), forward fan-out over
final/aux/pre/enc/dn sets (:609-777), GO-union indices (:570-591),
CDN matched indices (:809-831), unimodal distribution focal loss (:837-858).

TPU redesign:
- boolean indexing -> gather/scatter with validity masks (static shapes);
- all Hungarian solves batched and solved ON DEVICE by the exact JV
  auction/augmenting-path solver (ops/lapjv.py via train/matcher.py) — zero
  host callbacks in the train step;
- `num_boxes` normalizers are global sums — under pjit/GSPMD, XLA inserts the
  cross-device reduction, replacing the reference's explicit all_reduce
  (:639-652);
- the FGL target cache (:62-66) becomes explicit: ref_points are constant
  across decoder layers (layer-0 pre_bboxes, dfine_decoder.py:487), so FGL
  targets are computed once per (GO, dn) index set and reused.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.registry import CriterionConfig, MatcherConfig
from ..models.denoising import dn_layout
from ..ops.boxes import (
    box_cxcywh_to_xyxy,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
)
from ..ops.fdr import bbox2distance
from .matcher import match_all_sets

Match = Dict[str, jnp.ndarray]  # {"q": [B,M], "g": [B,M], "valid": [B,M]}


def _gather_q(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """x [B,Q,...] gathered at query indices q [B,M] -> [B,M,...].

    Wide float rows go through a one-hot MXU contraction instead of
    take_along_axis: the TPU lowering of the row gather is per-row DMAs
    (profiled 3.8 ms per aux layer for [8,300,132] corner logits,
    2026-08-17), while the one-hot batched matmul is ~100x cheaper and its
    transpose (the gradient) is a matmul too, replacing an even slower
    scatter. Exact: one-hot selects exactly one element per output row."""
    qc = jnp.clip(q, 0, x.shape[1] - 1)
    if x.ndim == 3 and x.shape[-1] >= 8 and jnp.issubdtype(x.dtype, jnp.floating):
        onehot = (qc[..., None] == jnp.arange(x.shape[1])).astype(x.dtype)
        return jax.lax.dot_general(
            onehot, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    idx = qc.reshape(qc.shape + (1,) * (x.ndim - 2))
    idx = jnp.broadcast_to(idx, qc.shape + x.shape[2:])
    return jnp.take_along_axis(x, idx, axis=1)


def _gather_g(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    return _gather_q(x, g)


def _scatter_q(base: jnp.ndarray, q: jnp.ndarray, vals, valid: jnp.ndarray) -> jnp.ndarray:
    """Scatter vals [B,M,...] into base [B,Q,...] at query idx; invalid dropped."""
    B, Q = base.shape[:2]
    q_safe = jnp.where(valid, q, Q)  # out-of-bounds -> dropped
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], q.shape)
    return base.at[b_idx, q_safe].set(vals, mode="drop")


def _bce_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy_with_logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _matched_ious(pred_boxes, targets, match) -> jnp.ndarray:
    src = _gather_q(pred_boxes, match["q"])
    tgt = _gather_g(targets["boxes"], match["g"])
    iou = elementwise_box_iou(box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt))
    return jax.lax.stop_gradient(iou) * match["valid"]


def loss_labels_vfl(outputs, targets, match: Match, num_boxes, num_classes: int,
                    alpha: float, gamma: float) -> Dict[str, jnp.ndarray]:
    """IoU-weighted varifocal loss (reference :92-122).
    Note loss.mean(1).sum()*Q == loss.sum(), so the reduction is sum/num_boxes."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    B, Q, C = logits.shape
    ious = _matched_ious(outputs["pred_boxes"], targets, match)

    labels_m = _gather_g(targets["labels"], match["g"])
    target_classes = _scatter_q(
        jnp.full((B, Q), num_classes, jnp.int32), match["q"], labels_m, match["valid"]
    )
    target = jax.nn.one_hot(target_classes, C, dtype=jnp.float32)  # row C -> zeros
    target_score = _scatter_q(jnp.zeros((B, Q), jnp.float32), match["q"], ious, match["valid"])
    target_score = target_score[..., None] * target

    pred_score = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    weight = alpha * (pred_score ** gamma) * (1.0 - target) + target_score
    elem = _bce_logits(logits, target_score) * weight
    iv = targets.get("image_valid")
    if iv is not None:  # mask padded tail-batch images (all-query negatives)
        elem = elem * iv.astype(jnp.float32)[:, None, None]
    loss = elem.sum() / num_boxes
    return {"loss_vfl": loss}


def loss_labels_focal(outputs, targets, match: Match, num_boxes, num_classes: int,
                      alpha: float, gamma: float, label_smoothing: float = 0.0):
    """Sigmoid focal classification loss (reference :68-90)."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    B, Q, C = logits.shape
    labels_m = _gather_g(targets["labels"], match["g"])
    target_classes = _scatter_q(
        jnp.full((B, Q), num_classes, jnp.int32), match["q"], labels_m, match["valid"]
    )
    target = jax.nn.one_hot(target_classes, C, dtype=jnp.float32)
    if label_smoothing > 0:
        target = target * (1 - label_smoothing) + label_smoothing / C
    p = jax.nn.sigmoid(logits)
    ce = _bce_logits(logits, target)
    p_t = p * target + (1 - p) * (1 - target)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * target + (1 - alpha) * (1 - target)
        loss = alpha_t * loss
    iv = targets.get("image_valid")
    if iv is not None:  # mask padded tail-batch images (all-query negatives)
        loss = loss * iv.astype(jnp.float32)[:, None, None]
    return {"loss_focal": loss.sum() / num_boxes}


def loss_boxes(outputs, targets, match: Match, num_boxes) -> Dict[str, jnp.ndarray]:
    """L1 + GIoU on matched pairs (reference :124-143)."""
    src = _gather_q(outputs["pred_boxes"].astype(jnp.float32), match["q"])
    tgt = _gather_g(targets["boxes"], match["g"])
    v = match["valid"][..., None]
    l1 = (jnp.abs(src - tgt) * v).sum() / num_boxes
    giou = elementwise_generalized_box_iou(box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt))
    lg = ((1.0 - giou) * match["valid"]).sum() / num_boxes
    return {"loss_bbox": l1, "loss_giou": lg}


def compute_fgl_targets(outputs, targets, match: Match, reg_max: int):
    """FGL bin targets from (constant-across-layers) ref points + matched GT
    (reference :156-172 caching + arch/utils.py:330-354)."""
    ref = jax.lax.stop_gradient(_gather_q(outputs["ref_points"].astype(jnp.float32), match["q"]))
    tgt = _gather_g(targets["boxes"], match["g"])
    B, M = match["q"].shape
    idx, wr, wl = bbox2distance(
        ref.reshape(-1, 4), box_cxcywh_to_xyxy(tgt).reshape(-1, 4),
        reg_max, outputs["reg_scale"], outputs["up"],
    )
    return idx.reshape(B, M, 4), wr.reshape(B, M, 4), wl.reshape(B, M, 4)


def _ce_int(pred_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy of int labels, last-dim classes. pred [..., K], labels [...]."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def loss_local(
    outputs, targets, match: Match, num_boxes, reg_max: int,
    fgl_targets=None, num_pos_neg=None, is_dn: bool = False, T: float = 5.0,
):
    """FGL + DDF (reference :145-237). Returns (losses, fgl_targets, num_pos_neg)."""
    losses: Dict[str, jnp.ndarray] = {}
    if "pred_corners" not in outputs:
        return losses, fgl_targets, num_pos_neg

    B, Q = outputs["pred_corners"].shape[:2]
    M = match["q"].shape[1]
    K1 = reg_max + 1

    pred_corners_m = _gather_q(outputs["pred_corners"].astype(jnp.float32), match["q"])
    pred_corners_m = pred_corners_m.reshape(B, M, 4, K1)

    if fgl_targets is None:
        fgl_targets = compute_fgl_targets(outputs, targets, match, reg_max)
    t_idx, wr, wl = fgl_targets

    ious = _matched_ious(outputs["pred_boxes"], targets, match)  # [B,M]
    w4 = jnp.broadcast_to(ious[..., None], (B, M, 4)) * match["valid"][..., None]

    dis_left = t_idx.astype(jnp.int32)
    dis_right = dis_left + 1
    ce = _ce_int(pred_corners_m, dis_left) * wl + _ce_int(pred_corners_m, dis_right) * wr
    losses["loss_fgl"] = (ce * w4).sum() / num_boxes

    if "teacher_corners" in outputs and outputs["teacher_corners"] is not None:
        pred = outputs["pred_corners"].astype(jnp.float32).reshape(B, Q, 4, K1)
        teacher = jax.lax.stop_gradient(
            outputs["teacher_corners"].astype(jnp.float32).reshape(B, Q, 4, K1)
        )
        wt = jax.nn.sigmoid(outputs["teacher_logits"].astype(jnp.float32)).max(-1)  # [B,Q]
        wt = _scatter_q(wt, match["q"], ious, match["valid"])
        wt = jax.lax.stop_gradient(wt)
        mask = _scatter_q(
            jnp.zeros((B, Q), bool), match["q"],
            jnp.ones(match["q"].shape, bool), match["valid"],
        )
        mask4 = jnp.broadcast_to(mask[..., None], (B, Q, 4))
        wt4 = jnp.broadcast_to(wt[..., None], (B, Q, 4))
        iv = targets.get("image_valid")
        if iv is not None:  # padded tail-batch images are neither pos nor neg
            imgb4 = jnp.broadcast_to(iv.astype(bool)[:, None, None], (B, Q, 4))
            mask4 = mask4 & imgb4
            neg4 = (~mask4) & imgb4
            n_img = jnp.maximum(iv.astype(jnp.float32).sum(), 1.0)
        else:
            neg4 = ~mask4
            n_img = B

        logp_s = jax.nn.log_softmax(pred / T, axis=-1)
        p_t = jax.nn.softmax(teacher / T, axis=-1)
        logp_t = jax.nn.log_softmax(teacher / T, axis=-1)
        kl = (p_t * (logp_t - logp_s)).sum(-1)  # [B,Q,4]
        loss_elem = wt4 * (T ** 2) * kl

        if not is_dn or num_pos_neg is None:
            batch_scale = 8.0 / n_img
            num_pos = jnp.sqrt(mask4.sum() * batch_scale)
            num_neg = jnp.sqrt(neg4.sum() * batch_scale)
            if not is_dn:
                num_pos_neg = (num_pos, num_neg)
        num_pos, num_neg = num_pos_neg

        pos_cnt = jnp.maximum(mask4.sum(), 1)
        neg_cnt = jnp.maximum(neg4.sum(), 1)
        l_pos = jnp.where(mask4, loss_elem, 0.0).sum() / pos_cnt
        l_neg = jnp.where(neg4, loss_elem, 0.0).sum() / neg_cnt
        losses["loss_ddf"] = (l_pos * num_pos + l_neg * num_neg) / (num_pos + num_neg + 1e-12)

    return losses, fgl_targets, num_pos_neg


# ----------------------------- mask losses -----------------------------------


def _inside_box_mask(boxes: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[.., M, 4] xyxy (mask-space) -> [.., M, H, W] {0,1} crop mask
    (reference _cropped_bce_loss :353-369)."""
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x1 = boxes[..., 0][..., None, None]
    y1 = boxes[..., 1][..., None, None]
    x2 = boxes[..., 2][..., None, None]
    y2 = boxes[..., 3][..., None, None]
    inside = ((xs >= x1) & (xs < x2)).astype(jnp.float32) * ((ys >= y1) & (ys < y2)).astype(
        jnp.float32
    )
    return inside


def loss_masks(outputs, targets, match: Match, num_boxes) -> Dict[str, jnp.ndarray]:
    """Box-cropped focal-free BCE + Dice, normalized by box area
    (reference loss_masks :504-556, _cropped_bce_loss :335-386,
    _cropped_dice_loss :404-450). targets["masks"] must already be at the
    prediction resolution [B, G, Hm, Wm] (the data pipeline downsamples —
    cheaper than the reference's per-step GT interpolate)."""
    if "pred_masks" not in outputs or "masks" not in targets or targets["masks"] is None:
        return {}
    pm = outputs["pred_masks"].astype(jnp.float32)  # [B,Q,Hm,Wm]
    B, Q, Hm, Wm = pm.shape

    pred_sel = _gather_q(pm, match["q"])                  # [B,M,Hm,Wm]
    tgt_sel = _gather_g(targets["masks"].astype(jnp.float32), match["g"])
    v = match["valid"].astype(jnp.float32)

    tb = _gather_g(targets["boxes"], match["g"])  # normalized cxcywh
    cx, cy, w, h = tb[..., 0], tb[..., 1], tb[..., 2], tb[..., 3]
    x1 = jnp.clip((cx - w / 2) * Wm, 0, Wm - 1)
    y1 = jnp.clip((cy - h / 2) * Hm, 0, Hm - 1)
    x2 = jnp.clip((cx + w / 2) * Wm, 1, Wm)
    y2 = jnp.clip((cy + h / 2) * Hm, 1, Hm)
    boxes_m = jnp.stack([x1, y1, x2, y2], axis=-1)

    inside = _inside_box_mask(boxes_m, Hm, Wm)  # [B,M,Hm,Wm]
    area = jnp.clip((x2 - x1) * (y2 - y1), 1.0)

    bce = _bce_logits(pred_sel, tgt_sel) * inside
    per_inst_bce = bce.sum((-2, -1)) / area  # [B,M]
    n_valid = jnp.maximum(v.sum(), 1.0)
    l_bce = (per_inst_bce * v).sum() / n_valid

    pred = jax.nn.sigmoid(pred_sel) * inside
    tgt = tgt_sel * inside
    inter = (pred * tgt).sum((-2, -1))
    denom = pred.sum((-2, -1)) + tgt.sum((-2, -1)) + 1e-6
    dice = 1.0 - (2.0 * inter + 1e-6) / denom
    l_dice = (dice * v).sum() / n_valid

    return {"loss_mask_bce": l_bce, "loss_mask_dice": l_dice}


# ----------------------------- criterion forward ------------------------------


class DFINECriterion:
    """Functional criterion; call with train-mode model outputs + padded targets."""

    def __init__(
        self,
        cfg: CriterionConfig,
        matcher_cfg: MatcherConfig,
        num_classes: int,
        num_queries: int = 300,
        go_cap: Optional[int] = None,
    ):
        self.cfg = cfg
        self.mcfg = matcher_cfg
        self.num_classes = num_classes
        self.num_queries = num_queries
        self.go_cap = go_cap

    def _dn_match(self, dn_meta, targets) -> Match:
        """Static CDN matched indices (reference :809-831): positive slot
        (group g, slot j) <-> the GT that slot was cycle-filled with
        (denoising.py build_cdn_group: gt_index[b, j] = j-th valid GT mod n,
        so every slot of every group carries a real GT — the reference's
        per-batch dynamic num_group supervision budget with static shapes)."""
        positive = dn_meta["positive"]  # [B, num_dn]
        B, num_dn = positive.shape
        num_group = dn_meta["num_group"]
        Gd = num_dn // (2 * num_group)
        # positive slots per group: [g*2*Gd + j for j < Gd]
        q_idx = np.concatenate(
            [np.arange(Gd, dtype=np.int32) + g * 2 * Gd for g in range(num_group)]
        )
        q = jnp.broadcast_to(jnp.asarray(q_idx)[None], (B, num_group * Gd))
        g = jnp.tile(dn_meta["gt_index"].astype(jnp.int32), (1, num_group))
        valid = positive[:, q_idx]
        if "image_valid" in targets:  # mesh-padding rows contribute nothing
            valid = valid & targets["image_valid"][:, None]
        return {"q": q, "g": g, "valid": valid}

    def __call__(self, outputs: Dict[str, Any], targets: Dict[str, jnp.ndarray]):
        cfg, mcfg = self.cfg, self.mcfg
        wd = cfg.weight_dict
        nc = self.num_classes

        # ---- batched matching over every output set (reference :616-633) ----
        aux_sets = list(outputs.get("aux_outputs", []))
        sets = [outputs] + aux_sets + [outputs["pre_outputs"]] + list(outputs["enc_aux_outputs"])
        G = targets["labels"].shape[1]
        assign, go_g, go_valid = match_all_sets(sets, targets, mcfg)

        B = targets["labels"].shape[0]
        Q = outputs["pred_logits"].shape[1]
        g_base = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None], (B, G))

        def to_match(a):  # a [B,G]
            return {"q": a, "g": g_base, "valid": (a >= 0) & targets["valid"]}

        n_aux = len(aux_sets)
        match_final = to_match(assign[0])
        match_aux = [to_match(assign[1 + i]) for i in range(n_aux)]
        match_pre = to_match(assign[1 + n_aux])
        match_enc = [to_match(assign[2 + n_aux + i]) for i in range(len(outputs["enc_aux_outputs"]))]
        q_iota = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q))
        match_go = {"q": q_iota, "g": go_g, "valid": go_valid}

        # normalizers: global sums (GSPMD reduces across devices automatically)
        num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)
        num_boxes_go = jnp.maximum(go_valid.sum().astype(jnp.float32), 1.0)

        losses: Dict[str, jnp.ndarray] = {}

        def add(ldict, suffix=""):
            for k, val in ldict.items():
                if k in wd:
                    losses[k + suffix] = val * wd[k]

        fgl_go = None
        num_pos_neg = None

        # ---- final layer (reference :654-662) ----
        for loss in cfg.losses:
            if loss == "vfl":
                add(loss_labels_vfl(outputs, targets, match_final, num_boxes, nc, cfg.alpha, cfg.gamma))
            elif loss == "boxes":
                add(loss_boxes(outputs, targets, match_go, num_boxes_go))
            elif loss == "local":
                ld, fgl_go, num_pos_neg = loss_local(
                    outputs, targets, match_go, num_boxes_go, cfg.reg_max, fgl_go, num_pos_neg
                )
                add(ld)
            elif loss == "masks":
                add(loss_masks(outputs, targets, match_final, num_boxes))

        # ---- aux decoder layers (reference :665-680) ----
        for i, aux in enumerate(aux_sets):
            aux = dict(aux)
            aux["up"], aux["reg_scale"] = outputs["up"], outputs["reg_scale"]
            for loss in cfg.losses:
                if loss == "vfl":
                    add(loss_labels_vfl(aux, targets, match_aux[i], num_boxes, nc, cfg.alpha, cfg.gamma), f"_aux_{i}")
                elif loss == "boxes":
                    add(loss_boxes(aux, targets, match_go, num_boxes_go), f"_aux_{i}")
                elif loss == "local":
                    ld, fgl_go, num_pos_neg = loss_local(
                        aux, targets, match_go, num_boxes_go, cfg.reg_max, fgl_go, num_pos_neg
                    )
                    add(ld, f"_aux_{i}")
                elif loss == "masks":
                    add(loss_masks(aux, targets, match_aux[i], num_boxes), f"_aux_{i}")

        # ---- pre outputs (reference :683-695) ----
        pre = outputs["pre_outputs"]
        for loss in cfg.losses:
            if loss == "vfl":
                add(loss_labels_vfl(pre, targets, match_pre, num_boxes, nc, cfg.alpha, cfg.gamma), "_pre")
            elif loss == "boxes":
                add(loss_boxes(pre, targets, match_go, num_boxes_go), "_pre")
            # local/masks: pre head has no corners/masks

        # ---- encoder aux (reference :698-725) ----
        class_agnostic = outputs.get("enc_meta", {}).get("class_agnostic", False)
        enc_targets = targets
        enc_nc = nc
        if class_agnostic:
            enc_targets = dict(targets)
            enc_targets["labels"] = jnp.zeros_like(targets["labels"])
            enc_nc = 1
        for i, enc in enumerate(outputs["enc_aux_outputs"]):
            for loss in cfg.losses:
                if loss == "vfl":
                    add(loss_labels_vfl(enc, enc_targets, match_enc[i], num_boxes, enc_nc, cfg.alpha, cfg.gamma), f"_enc_{i}")
                elif loss == "boxes":
                    add(loss_boxes(enc, enc_targets, match_go, num_boxes_go), f"_enc_{i}")

        # ---- denoising (reference :727-773) ----
        if "dn_outputs" in outputs and outputs.get("dn_meta") is not None:
            dn_meta = outputs["dn_meta"]
            match_dn = self._dn_match(dn_meta, targets)
            # reference divisor num_boxes * dn_num_group (:652) IS its count of
            # valid positive dn slots; with cycle-filled groups ours is the
            # actual positive-slot count (identical when every slot is real)
            dn_positive = dn_meta["positive"]
            if "image_valid" in targets:
                dn_positive = dn_positive & targets["image_valid"][:, None]
            dn_num_boxes = jnp.maximum(
                dn_positive.sum().astype(jnp.float32), 1.0)
            fgl_dn = None
            for i, dn_out in enumerate(outputs["dn_outputs"]):
                dn_out = dict(dn_out)
                dn_out["up"], dn_out["reg_scale"] = outputs["up"], outputs["reg_scale"]
                for loss in cfg.losses:
                    if loss == "vfl":
                        add(loss_labels_vfl(dn_out, targets, match_dn, dn_num_boxes, nc, cfg.alpha, cfg.gamma), f"_dn_{i}")
                    elif loss == "boxes":
                        add(loss_boxes(dn_out, targets, match_dn, dn_num_boxes), f"_dn_{i}")
                    elif loss == "local":
                        ld, fgl_dn, _ = loss_local(
                            dn_out, targets, match_dn, dn_num_boxes, cfg.reg_max,
                            fgl_dn, num_pos_neg, is_dn=True,
                        )
                        add(ld, f"_dn_{i}")
                    elif loss == "masks" and "pred_masks" in dn_out:
                        add(loss_masks(dn_out, targets, match_dn, dn_num_boxes), f"_dn_{i}")

            if "dn_pred_masks" in outputs and "masks" in cfg.losses:
                dn_final = {
                    "pred_masks": outputs["dn_pred_masks"],
                    "pred_boxes": outputs["dn_outputs"][-1]["pred_boxes"],
                }
                add(loss_masks(dn_final, targets, match_dn, dn_num_boxes), "_dn_final")

            if "dn_pre_outputs" in outputs:
                dn_pre = outputs["dn_pre_outputs"]
                for loss in cfg.losses:
                    if loss == "vfl":
                        add(loss_labels_vfl(dn_pre, targets, match_dn, dn_num_boxes, nc, cfg.alpha, cfg.gamma), "_dn_pre")
                    elif loss == "boxes":
                        add(loss_boxes(dn_pre, targets, match_dn, dn_num_boxes), "_dn_pre")

        # final NaN scrub (reference :776)
        return {k: jnp.nan_to_num(v, nan=0.0) for k, v in losses.items()}
