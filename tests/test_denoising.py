"""Static CDN layout: attention-mask parity with the reference builder and
noise-model invariants."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.denoising import (
    build_cdn_group,
    build_dn_attn_mask,
    dn_layout,
)


def _reference_attn_mask(num_group, max_gt, num_queries):
    """Port of the reference mask-building loop (arch/utils.py:437-455),
    evaluated for a batch whose max GT count equals the static capacity."""
    num_dn = max_gt * 2 * num_group
    tgt = num_dn + num_queries
    m = np.zeros((tgt, tgt), bool)
    m[num_dn:, :num_dn] = True
    for i in range(num_group):
        if i == 0:
            m[max_gt * 2 * i: max_gt * 2 * (i + 1), max_gt * 2 * (i + 1): num_dn] = True
        if i == num_group - 1:
            m[max_gt * 2 * i: max_gt * 2 * (i + 1), : max_gt * i * 2] = True
        else:
            m[max_gt * 2 * i: max_gt * 2 * (i + 1), max_gt * 2 * (i + 1): num_dn] = True
            m[max_gt * 2 * i: max_gt * 2 * (i + 1), : max_gt * 2 * i] = True
    return m


@pytest.mark.parametrize("num_group,max_gt,q", [(1, 10, 30), (2, 5, 20), (5, 4, 60)])
def test_attn_mask_matches_reference(num_group, max_gt, q):
    got = build_dn_attn_mask(num_group, max_gt, q)
    want = _reference_attn_mask(num_group, max_gt, q)
    np.testing.assert_array_equal(got, want)


def test_dn_layout():
    g, num_dn, total = dn_layout(num_denoising=100, dn_max_gt=50, num_queries=300)
    assert (g, num_dn, total) == (2, 200, 500)
    g, num_dn, total = dn_layout(100, 100, 300)
    assert (g, num_dn, total) == (1, 200, 500)


def test_cdn_group_invariants():
    """Cycle-filled static layout: every slot of every group carries a real
    (independently noised) GT — slot j holds GT j % n — so the positive-query
    budget matches the reference's per-batch dynamic num_group
    (arch/utils.py:373-379) regardless of how few GTs an image has. Images
    with zero GTs keep fully-invalid slots."""
    rng = jax.random.PRNGKey(0)
    B, G = 3, 6
    labels = jnp.asarray(np.tile(np.arange(G, dtype=np.int32), (B, 1)))
    boxes = jnp.asarray(np.tile(
        np.array([0.5, 0.5, 0.2, 0.2], np.float32), (B, G, 1)))
    valid = np.repeat(np.arange(G)[None] < 2, B, 0)
    valid[2] = False  # image 2 has no GTs at all
    valid = jnp.asarray(valid)

    out = build_cdn_group(
        rng, labels, boxes, valid, num_classes=10, num_group=3, dn_max_gt=G,
        label_noise_ratio=0.5, box_noise_scale=1.0,
    )
    num_dn = 2 * 3 * G
    assert out["labels"].shape == (B, num_dn)
    assert out["bbox_unact"].shape == (B, num_dn, 4)
    # positivity: the ENTIRE first half of each group pair for images with
    # GTs (cycle-filled), nothing for the zero-GT image
    pos = np.asarray(out["positive"])
    assert pos.sum() == 2 * 3 * G  # 2 images x 3 groups x G cycle-filled slots
    for g in range(3):
        s = g * 2 * G
        assert pos[:2, s:s + G].all()             # full positive half
        assert not pos[:, s + G:s + 2 * G].any()  # negative half never positive
    assert not pos[2].any()
    # valid mask: everything for images with GTs, nothing for the empty image
    v = np.asarray(out["valid"])
    assert v[:2].all() and not v[2].any()
    # cycling: slot j carries GT j % 2 -> its original row index
    gi = np.asarray(out["gt_index"])
    np.testing.assert_array_equal(gi[:2], np.tile(np.arange(G) % 2, (2, 1)))
    # noisy boxes stay in [0, 1] cxcywh with non-negative wh
    b = jax.nn.sigmoid(out["bbox_unact"])
    assert np.isfinite(np.asarray(b)).all()
    # negative-half boxes are jittered MORE than positive-half on average
    bb = np.asarray(jax.nn.sigmoid(out["bbox_unact"]))
    ref = np.asarray(boxes)[:, :G]
    pos_err = np.abs(bb[:2, :2] - ref[:2, :2]).mean()
    neg_err = np.abs(bb[:2, G:G + 2] - ref[:2, :2]).mean()
    assert neg_err > pos_err


def test_cdn_cycle_labels_deterministic():
    """With label noise off, cycled slots carry exactly the label/box of GT
    j % n, and a full-capacity image (n == Gd) reproduces the identity layout
    (the regime the torch criterion-parity comparison runs in)."""
    rng = jax.random.PRNGKey(1)
    B, G = 2, 4
    labels = jnp.asarray(np.array([[7, 3, 5, 2], [4, 1, 9, 8]], np.int32))
    boxes = jnp.asarray(
        np.linspace(0.2, 0.8, B * G * 4).astype(np.float32).reshape(B, G, 4))
    valid = jnp.asarray(np.array([[True, True, True, False],
                                  [True, True, True, True]]))
    out = build_cdn_group(
        rng, labels, boxes, valid, num_classes=10, num_group=2, dn_max_gt=G,
        label_noise_ratio=0.0, box_noise_scale=0.0,
    )
    lab = np.asarray(out["labels"])
    # image 0: n=3 -> slots [0,1,2,3] hold GTs [0,1,2,0]
    want0 = np.asarray(labels)[0][[0, 1, 2, 0]]
    # image 1: n=4=Gd -> identity
    want1 = np.asarray(labels)[1]
    for g in range(2):
        s = g * 2 * G
        np.testing.assert_array_equal(lab[0, s:s + G], want0)
        np.testing.assert_array_equal(lab[1, s:s + G], want1)
    # gt_index mirrors the same cycling
    np.testing.assert_array_equal(np.asarray(out["gt_index"]),
                                  [[0, 1, 2, 0], [0, 1, 2, 3]])
