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
    rng = jax.random.PRNGKey(0)
    B, G = 3, 6
    labels = jnp.asarray(np.tile(np.arange(G, dtype=np.int32), (B, 1)))
    boxes = jnp.asarray(np.tile(
        np.array([0.5, 0.5, 0.2, 0.2], np.float32), (B, G, 1)))
    valid = jnp.asarray(np.arange(G)[None] < 2).repeat(B, 0)

    out = build_cdn_group(
        rng, labels, boxes, valid, num_classes=10, num_group=3, dn_max_gt=G,
        label_noise_ratio=0.5, box_noise_scale=1.0,
    )
    num_dn = 2 * 3 * G
    assert out["labels"].shape == (B, num_dn)
    assert out["bbox_unact"].shape == (B, num_dn, 4)
    # positivity: first half of each group pair, valid slots only
    pos = np.asarray(out["positive"])
    assert pos.sum() == B * 3 * 2  # 2 valid gts x 3 groups
    for g in range(3):
        s = g * 2 * G
        assert pos[:, s:s + 2].all()           # valid positive slots
        assert not pos[:, s + G:s + 2 * G].any()  # negative half never positive
    # valid mask tiles the gt validity
    v = np.asarray(out["valid"])
    assert v.sum() == B * 3 * 2 * 2
    # noisy boxes stay in [0, 1] cxcywh with non-negative wh
    b = jax.nn.sigmoid(out["bbox_unact"])
    assert np.isfinite(np.asarray(b)).all()
    # negative-half boxes are jittered MORE than positive-half on average
    bb = np.asarray(jax.nn.sigmoid(out["bbox_unact"]))
    ref = np.asarray(boxes)[:, :G]
    pos_err = np.abs(bb[:, :2] - ref[:, :2]).mean()
    neg_err = np.abs(bb[:, G:G + 2] - ref[:, :2]).mean()
    assert neg_err > pos_err
