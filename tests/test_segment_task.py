"""Segment-task coverage: mask head forward, mask losses, mask matching costs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.dfine import build_model
from custom_d_fine_tpu.train.criterion import DFINECriterion
from custom_d_fine_tpu.train.matcher import mask_matching_cost

from helpers import make_targets, tiny_config

IMG = 160


@pytest.fixture(scope="module")
def seg_model():
    cfg = tiny_config(enable_mask_head=True)
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=2)
    return cfg, model, variables


MASK_DS = 8  # tiny config's finest level is stride 16 -> mask head outputs H/8


def _seg_targets(cfg, rng):
    t = make_targets(2, cfg.max_gt, 4, rng)
    mh = mw = IMG // MASK_DS
    masks = np.zeros((2, cfg.max_gt, mh, mw), np.uint8)
    boxes = np.asarray(t["boxes"])
    for b in range(2):
        for g in range(3):
            cx, cy, w, h = boxes[b, g]
            x1, y1 = int((cx - w / 2) * mw), int((cy - h / 2) * mh)
            x2, y2 = int((cx + w / 2) * mw), int((cy + h / 2) * mh)
            masks[b, g, y1:y2, x1:x2] = 1
    t["masks"] = jnp.asarray(masks)
    return t


def test_mask_head_eval_outputs(seg_model):
    cfg, model, variables = seg_model
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    Q = cfg.decoder.num_queries
    assert out["pred_masks"].shape == (1, Q, IMG // MASK_DS, IMG // MASK_DS)
    m = np.asarray(out["pred_masks"])
    assert (m >= 0).all() and (m <= 1).all()  # eval path applies sigmoid


def test_mask_losses_in_train_step(seg_model):
    cfg, model, variables = seg_model
    rng = np.random.default_rng(0)
    targets = _seg_targets(cfg, rng)
    x = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)), jnp.float32)

    crit_cfg = dataclasses.replace(
        cfg.criterion, losses=tuple(cfg.criterion.losses) + ("masks",)
    )
    criterion = DFINECriterion(crit_cfg, cfg.matcher, num_classes=4,
                               num_queries=cfg.decoder.num_queries)

    def loss_fn(v):
        out, _ = model.apply(v, x, targets=targets, train=True,
                             rngs={"dn": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        losses = criterion(out, targets)
        return sum(losses.values()), losses

    (total, losses) = jax.jit(loss_fn)(variables)
    assert np.isfinite(float(total))
    keys = set(losses.keys())
    assert "loss_mask_bce" in keys and "loss_mask_dice" in keys
    assert "loss_mask_bce_dn_final" in keys or any("mask" in k and "dn" in k for k in keys)
    assert float(losses["loss_mask_bce"]) > 0


def test_mask_matching_cost_prefers_matching_mask():
    cfg = tiny_config()
    Q, G, H, W = 4, 2, 8, 8
    tgt = np.zeros((1, G, H, W), np.float32)
    tgt[0, 0, :4, :4] = 1
    tgt[0, 1, 4:, 4:] = 1
    pred = np.full((1, Q, H, W), -10.0, np.float32)
    pred[0, 0, :4, :4] = 10.0   # query 0 matches gt 0
    pred[0, 1, 4:, 4:] = 10.0   # query 1 matches gt 1
    c = np.asarray(mask_matching_cost(jnp.asarray(pred), jnp.asarray(tgt), cfg.matcher))
    assert c[0, 0, 0] < c[0, 0, 1]
    assert c[0, 1, 1] < c[0, 1, 0]
    assert c[0, 0, 0] < c[0, 2, 0]  # empty-pred query costs more than the match
