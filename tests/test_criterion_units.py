"""Unit tests for individual criterion loss functions."""

import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.train.criterion import (
    _bce_logits,
    loss_boxes,
    loss_labels_focal,
    loss_labels_vfl,
)


def _match(q, g, valid):
    return {"q": jnp.asarray(q), "g": jnp.asarray(g), "valid": jnp.asarray(valid)}


def test_bce_logits_matches_definition():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50,)).astype(np.float32) * 3
    z = rng.uniform(0, 1, 50).astype(np.float32)
    got = np.asarray(_bce_logits(jnp.asarray(x), jnp.asarray(z)))
    p = 1 / (1 + np.exp(-x))
    want = -(z * np.log(p) + (1 - z) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_focal_loss_perfect_prediction_near_zero():
    B, Q, C, G = 1, 4, 3, 2
    logits = np.full((B, Q, C), -20.0, np.float32)
    logits[0, 0, 1] = 20.0  # query 0 predicts class 1 perfectly
    targets = {
        "labels": jnp.asarray([[1, 0]]),
        "boxes": jnp.asarray(np.full((B, G, 4), 0.5, np.float32)),
        "valid": jnp.asarray([[True, False]]),
    }
    match = _match([[0, -1]], [[0, 1]], [[True, False]])
    out = {"pred_logits": jnp.asarray(logits)}
    l = loss_labels_focal(out, targets, match, 1.0, C, alpha=0.25, gamma=2.0)
    assert float(l["loss_focal"]) < 1e-4

    # wrong class -> large loss
    logits2 = np.full((B, Q, C), -20.0, np.float32)
    logits2[0, 0, 2] = 20.0
    l2 = loss_labels_focal({"pred_logits": jnp.asarray(logits2)}, targets, match,
                           1.0, C, alpha=0.25, gamma=2.0)
    assert float(l2["loss_focal"]) > 1.0


def test_vfl_rewards_matching_box():
    B, Q, C, G = 1, 2, 2, 1
    boxes = np.array([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]]], np.float32)
    logits_good = np.full((B, Q, C), -10.0, np.float32)
    logits_good[0, 0, 0] = 10.0  # matched query confident on right class
    targets = {
        "labels": jnp.asarray([[0]]),
        "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]]),
        "valid": jnp.asarray([[True]]),
    }
    match = _match([[0]], [[0]], [[True]])
    good = loss_labels_vfl({"pred_logits": jnp.asarray(logits_good),
                            "pred_boxes": jnp.asarray(boxes)},
                           targets, match, 1.0, C, 0.75, 2.0)
    logits_bad = np.full((B, Q, C), -10.0, np.float32)  # no confidence anywhere
    bad = loss_labels_vfl({"pred_logits": jnp.asarray(logits_bad),
                           "pred_boxes": jnp.asarray(boxes)},
                          targets, match, 1.0, C, 0.75, 2.0)
    assert float(good["loss_vfl"]) < float(bad["loss_vfl"])


def test_loss_boxes_zero_for_exact_match():
    targets = {
        "labels": jnp.asarray([[0]]),
        "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]]),
        "valid": jnp.asarray([[True]]),
    }
    out = {"pred_boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]]])}
    match = _match([[0]], [[0]], [[True]])
    l = loss_boxes(out, targets, match, 1.0)
    assert float(l["loss_bbox"]) == pytest.approx(0.0, abs=1e-7)
    assert float(l["loss_giou"]) == pytest.approx(0.0, abs=1e-5)
