"""Deformable-attention sampling: patch-gather vs naive reference, incl. borders."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_d_fine_tpu.ops.deform_attn import ms_deform_attn_xla


def naive_bilinear(value, shapes, loc, w, points):
    """Straightforward numpy grid_sample(zeros, align_corners=False) reference."""
    B, Lv, nh, c = value.shape
    _, Lq, _, P, _ = loc.shape
    out = np.zeros((B, Lq, nh, c), np.float32)
    off_v = 0
    off_p = 0
    for (H, W), Pl in zip(shapes, points):
        vl = value[:, off_v:off_v + H * W].reshape(B, H, W, nh, c)
        for b in range(B):
            for q in range(Lq):
                for h in range(nh):
                    for p in range(Pl):
                        x = loc[b, q, h, off_p + p, 0] * W - 0.5
                        y = loc[b, q, h, off_p + p, 1] * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        tx, ty = x - x0, y - y0
                        acc = np.zeros(c, np.float32)
                        for dy, wy in ((0, 1 - ty), (1, ty)):
                            for dx, wx in ((0, 1 - tx), (1, tx)):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < W and 0 <= yi < H:
                                    acc += wy * wx * vl[b, yi, xi, h]
                        out[b, q, h] += acc * w[b, q, h, off_p + p]
        off_v += H * W
        off_p += Pl
    return out.reshape(B, Lq, nh * c)


def test_patch_gather_matches_naive_with_borders():
    rng = np.random.default_rng(0)
    B, Lq, nh, c = 2, 7, 2, 4
    shapes = [(6, 8), (3, 4)]
    points = [2, 2]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, Lv, nh, c)).astype(np.float32)
    # locations deliberately include far-out-of-bounds, border, and interior
    loc = rng.uniform(-0.4, 1.4, size=(B, Lq, nh, P, 2)).astype(np.float32)
    loc[0, 0, 0, 0] = [0.0, 0.0]     # top-left corner
    loc[0, 1, 0, 0] = [1.0, 1.0]     # bottom-right edge
    loc[0, 2, 0, 0] = [-0.2, 0.5]    # partially out left
    loc[0, 3, 0, 0] = [0.999, 0.001]
    w = rng.uniform(0, 1, size=(B, Lq, nh, P)).astype(np.float32)

    got = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w), points
    ))
    want = naive_bilinear(value, shapes, loc, w, points)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_patch_gather_grad_finite():
    rng = np.random.default_rng(1)
    B, Lq, nh, c = 1, 5, 2, 4
    shapes = [(5, 5)]
    points = [3]
    value = jnp.asarray(rng.normal(size=(B, 25, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, 3, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, 3)), jnp.float32)

    def f(v, l, w):
        return ms_deform_attn_xla(v, shapes, l, w, points).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gv).sum()) > 0
    assert float(jnp.abs(gl).sum()) > 0


def test_onehot_impl_matches_gather():
    from custom_d_fine_tpu.ops.deform_attn import ms_deform_attn_onehot

    rng = np.random.default_rng(2)
    B, Lq, nh, c = 2, 6, 2, 4
    shapes = [(6, 8), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    a = np.asarray(ms_deform_attn_xla(value, shapes, loc, w, points))
    b = np.asarray(ms_deform_attn_onehot(value, shapes, loc, w, points))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pallas_impl_matches_gather_interpret():
    """Pallas kernel vs gather reference (interpreter mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.default_rng(4)
    B, Lq, nh, c = 2, 6, 2, 8
    shapes = [(6, 8), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)

    want = np.asarray(ms_deform_attn_xla(value, shapes, loc, w, points))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, w, points))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_backward_kernel_matches_xla_grads():
    """Handwritten Pallas bwd (dV via S^T matmul, dW via masked row-reduce,
    chain rule to loc/attn) vs jax.grad of the gather implementation —
    multi-level, weighted cotangent, including border/out-of-bounds points."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.default_rng(5)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(6, 8), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Lq, nh * c)), jnp.float32)

    def f_pallas(v, l, a):
        return (ms_deform_attn_pallas(v, shapes, l, a, points) * cot).sum()

    def f_xla(v, l, a):
        return (ms_deform_attn_xla(v, shapes, l, a, points) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(value, loc, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dattn"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_pallas_sep_matches_gather_interpret():
    """Separable (v2) kernel vs gather reference, incl. out-of-border points."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas.msda_sep import ms_deform_attn_sep

    rng = np.random.default_rng(7)
    B, Lq, nh, c = 2, 6, 2, 8
    shapes = [(6, 8), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)

    want = np.asarray(ms_deform_attn_xla(value, shapes, loc, w, points))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_sep(value, shapes, loc, w, points))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_sep_backward_matches_xla_grads():
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas.msda_sep import ms_deform_attn_sep

    rng = np.random.default_rng(8)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(6, 8), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Lq, nh * c)), jnp.float32)

    def f_sep(v, l, a):
        return (ms_deform_attn_sep(v, shapes, l, a, points) * cot).sum()

    def f_xla(v, l, a):
        return (ms_deform_attn_xla(v, shapes, l, a, points) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_sep, argnums=(0, 1, 2))(value, loc, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dattn"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_pallas_sep_large_level_branch_interpret():
    """Shapes that cross _SEP_MIN_HW exercise the separable MXU branch
    (small levels route to the compare-accumulate kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas.msda_sep import ms_deform_attn_sep

    rng = np.random.default_rng(9)
    B, Lq, nh, c = 1, 6, 2, 8
    shapes = [(64, 64), (3, 4)]  # 4096 -> separable; 12 -> onehot
    points = [2, 2]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)

    want = np.asarray(ms_deform_attn_xla(value, shapes, loc, w, points))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_sep(value, shapes, loc, w, points))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_sep_backward_large_level_matches_xla_grads():
    """Grads through the separable BWD kernel branch (HW >= _SEP_BWD_MIN_HW)
    vs jax.grad of the gather reference, incl. border/out-of-range points."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas import msda_sep

    rng = np.random.default_rng(11)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(40, 40), (3, 4)]  # 1600 -> separable bwd; 12 -> compare bwd
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    assert shapes[0][0] * shapes[0][1] >= msda_sep._SEP_BWD_MIN_HW
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Lq, nh * c)), jnp.float32)

    def f_sep(v, l, a):
        return (msda_sep.ms_deform_attn_sep(v, shapes, l, a, points) * cot).sum()

    def f_xla(v, l, a):
        return (ms_deform_attn_xla(v, shapes, l, a, points) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_sep, argnums=(0, 1, 2))(value, loc, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dattn"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_pallas_sep_backward_small_level_threshold_override(monkeypatch):
    """The 20x20=400 level routed through the separable MXU BWD kernel —
    exactly what MSDA_SEP_BWD_MIN_HW=256 does on device (PERF.md §6 open
    item) — must match jax.grad of the gather reference."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas import msda_sep

    monkeypatch.setattr(msda_sep, "_SEP_BWD_MIN_HW", 256)
    rng = np.random.default_rng(13)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(20, 20)]
    points = [4]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Lq, nh * c)), jnp.float32)

    def f_sep(v, l, a):
        return (msda_sep.ms_deform_attn_sep(v, shapes, l, a, points) * cot).sum()

    def f_xla(v, l, a):
        return (ms_deform_attn_xla(v, shapes, l, a, points) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_sep, argnums=(0, 1, 2))(value, loc, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dattn"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_bwd_pick_tile_contract():
    """_pick_tile must return a multiple of 128 within cap that never pads
    worse than the old min(round_up(HW,128), 1024) policy, and hits the two
    production level sizes exactly as documented (640x? see msda.py)."""
    from custom_d_fine_tpu.ops.pallas.msda import _pick_tile, _round_up

    for hw in (12, 100, 1600, 6400, 25600, 160 * 160):
        t = _pick_tile(hw)
        assert t % 128 == 0 and 128 <= t <= 1024
        old = min(_round_up(hw, 128), 1024)
        assert _round_up(hw, t) <= _round_up(hw, old)
    # production 640^2 levels: 80x80 tiles exactly, 40x40 pads +12% not +28%
    assert _round_up(6400, _pick_tile(6400)) == 6400
    assert _round_up(1600, _pick_tile(1600)) <= 1792


def test_pallas_sep_backward_bf16_operand_path():
    """AMP backward (bf16 value => exact=False): the separable bwd kernel
    runs with bf16 operands and a doubled W-tile; grads must stay within
    bf16 accuracy of the f32 gather reference."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas import msda_sep

    rng = np.random.default_rng(13)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(40, 40), (3, 4)]
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Lq, nh * c)), jnp.float32)

    def f_sep(v, l, a):
        return (msda_sep.ms_deform_attn_sep(
            v, shapes, l, a, points, fast=True) * cot).sum()

    def f_xla(v, l, a):
        return (ms_deform_attn_xla(v, shapes, l, a, points) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_sep, argnums=(0, 1, 2))(value.astype(jnp.bfloat16),
                                                loc, w)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dattn"), gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=0.02,
                                   err_msg=name)


def test_pallas_sep_fwd_psum_in_kernel_matches(monkeypatch):
    """MSDA_FWD_PSUM variant (P-sum inside the fwd kernel, P-major factors)
    must reproduce the standard separable forward exactly (f32) and within
    bf16 accuracy (fast)."""
    from jax.experimental.pallas import tpu as pltpu

    from custom_d_fine_tpu.ops.pallas import msda_sep

    rng = np.random.default_rng(17)
    B, Lq, nh, c = 2, 5, 2, 8
    shapes = [(64, 64), (3, 4)]  # 4096 -> separable branch in exact mode too
    points = [2, 3]
    P = sum(points)
    Lv = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, Lv, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, size=(B, Lq, nh, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Lq, nh, P)), jnp.float32)

    for fast in (False, True):
        with pltpu.force_tpu_interpret_mode():
            ref = np.asarray(msda_sep._msda_sep_fwd_impl(
                value, shapes, loc, w, points, fast=fast))
        monkeypatch.setattr(msda_sep, "_FWD_PSUM", True)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(msda_sep._msda_sep_fwd_impl(
                value, shapes, loc, w, points, fast=fast))
        monkeypatch.setattr(msda_sep, "_FWD_PSUM", False)
        tol = 1e-6 if not fast else 3e-2
        np.testing.assert_allclose(got, ref, rtol=0, atol=tol,
                                   err_msg=f"fast={fast}")
