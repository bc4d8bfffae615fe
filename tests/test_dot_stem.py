"""Tap-dot stem convs (layers.dot_conv) == nn.Conv path, values and grads.

The train-graph stem can run its convs as sums of per-tap channel dots
(models/layers.py:dot_conv) so that autodiff emits MXU reduction dots for
d/dW instead of XLA's conv-backward-filter emitter (bs16 profile 2026-08-19:
~6.4 ms/step for <1% of FLOPs). These tests pin the rewrite to the conv
path exactly: same variable tree, same forward values, same batch-stats
updates, same parameter gradients. (Reference stem semantics:
/root/reference/src/d_fine/arch/hgnetv2.py:115-166.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.hgnetv2 import StemBlock
from custom_d_fine_tpu.models.layers import ConvBNAct, dot_conv


@pytest.mark.parametrize("k,stride,pad,hw,ci,co", [
    (3, 2, [(1, 1), (1, 1)], (17, 17), 3, 8),   # stem1 geometry (odd in)
    (3, 2, [(1, 1), (1, 1)], (16, 16), 6, 8),   # stem3 geometry (even in)
    (2, 1, [(0, 1), (0, 1)], (9, 9), 8, 4),     # stem2a "same2" geometry
    (1, 1, [(0, 0), (0, 0)], (8, 8), 8, 16),    # stem4 pointwise
])
def test_dot_conv_matches_lax_conv(k, stride, pad, hw, ci, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, ci), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, ci, co), dtype=np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [tuple(p) for p in pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = dot_conv(x, w, stride, pad, None)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _stem_variants(use_lab):
    conv = StemBlock(8, 16, use_lab=use_lab, conv_impl="conv")
    dots = StemBlock(8, 16, use_lab=use_lab, conv_impl="dots")
    return conv, dots


@pytest.mark.parametrize("use_lab", [False, True])
def test_stem_dots_forward_and_stats_match(use_lab):
    conv, dots = _stem_variants(use_lab)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3),
                                                             dtype=np.float32))
    v_conv = conv.init(jax.random.PRNGKey(0), x, train=True)
    v_dots = dots.init(jax.random.PRNGKey(0), x, train=True)
    # identical variable trees (paths, shapes, values): checkpoints unchanged
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_conv, v_dots)

    y_c, m_c = conv.apply(v_conv, x, train=True, mutable=["batch_stats"])
    y_d, m_d = dots.apply(v_conv, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_c), rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        m_c["batch_stats"], m_d["batch_stats"])
    # eval mode ignores conv_impl="dots" entirely (same graph as conv path)
    e_c = conv.apply(v_conv, x, train=False)
    e_d = dots.apply(v_conv, x, train=False)
    np.testing.assert_array_equal(np.asarray(e_c), np.asarray(e_d))


def test_stem_dots_grads_match():
    conv, dots = _stem_variants(False)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 32, 32, 3),
                                                             dtype=np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x, train=True)
    cotan = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8, 8, 16),
                                                                 dtype=np.float32))

    def loss(block):
        def f(params):
            y, _ = block.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * cotan)
        return f

    g_c = jax.grad(loss(conv))(variables["params"])
    g_d = jax.grad(loss(dots))(variables["params"])
    flat_c = jax.tree_util.tree_leaves_with_path(g_c)
    flat_d = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_d)}
    for path, vc in flat_c:
        vd = flat_d[jax.tree_util.keystr(path)]
        # f32 reassociation only: per-tap dot partials vs one conv accumulator
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vc),
                                   rtol=1e-3, atol=3e-5,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("hw,ci,co", [
    ((17, 17), 3, 8),   # stem1 geometry (odd in)
    ((16, 16), 6, 8),   # stem3 geometry (even in)
    ((15, 21), 3, 8),   # non-square odd
])
def test_s2d_conv_matches_lax_conv(hw, ci, co):
    from custom_d_fine_tpu.models.layers import s2d_conv

    rng = np.random.default_rng(4)
    pad = [(1, 1), (1, 1)]
    x = jnp.asarray(rng.standard_normal((2, *hw, ci), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co), dtype=np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [tuple(p) for p in pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_conv(x, w, pad, None)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["s2d", "s2d_all"])
def test_stem_s2d_forward_stats_and_grads_match(impl):
    """conv_impl="s2d" rewrites the stride-2 k3 stem convs (stem1 only for
    "s2d" via the ci<=4 gate; +stem3 for "s2d_all") on the space-to-depth
    view — same variable tree, values, batch stats, and grads as conv."""
    conv = StemBlock(8, 16, conv_impl="conv")
    s2d = StemBlock(8, 16, conv_impl=impl)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 32, 32, 3),
                                                             dtype=np.float32))
    v_conv = conv.init(jax.random.PRNGKey(0), x, train=True)
    v_s2d = s2d.init(jax.random.PRNGKey(0), x, train=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v_conv, v_s2d)

    y_c, m_c = conv.apply(v_conv, x, train=True, mutable=["batch_stats"])
    y_s, m_s = s2d.apply(v_conv, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        m_c["batch_stats"], m_s["batch_stats"])

    cotan = jnp.asarray(np.random.default_rng(6).standard_normal((2, 8, 8, 16),
                                                                 dtype=np.float32))

    def loss(block):
        def f(params):
            y, _ = block.apply({"params": params,
                                "batch_stats": v_conv["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * cotan)
        return f

    g_c = jax.grad(loss(conv))(v_conv["params"])
    g_s = jax.grad(loss(s2d))(v_conv["params"])
    flat_s = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_s)}
    for path, vc in jax.tree_util.tree_leaves_with_path(g_c):
        np.testing.assert_allclose(
            np.asarray(flat_s[jax.tree_util.keystr(path)]), np.asarray(vc),
            rtol=1e-3, atol=3e-5, err_msg=jax.tree_util.keystr(path))
    # eval mode ignores the impl entirely
    np.testing.assert_array_equal(
        np.asarray(conv.apply(v_conv, x, train=False)),
        np.asarray(s2d.apply(v_conv, x, train=False)))


def test_convbnact_dots_is_noop_for_grouped_conv():
    # grouped convs (HGStage downsample) must never take the dot path
    m = ConvBNAct(8, 3, stride=2, groups=8, conv_impl="dots")
    x = jnp.ones((1, 8, 8, 8), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (1, 4, 4, 8)
