"""Separable Pallas TPU kernel for multi-scale deformable attention (v2).

The v1 kernel (ops/pallas/msda.py) builds the combined one-hot sampling
matrix S[q, hw] by compare-accumulate — O(Lq * HW * 4P) VPU work, which
profiles at ~400us/decoder-layer on D-FINE-m 640 (the single largest cost in
the whole inference graph).

v2 exploits that bilinear interpolation is SEPARABLE: with one-hot-interp
factors over rows and columns,

    out[q,p,c] = sum_y sum_x Sy[qp,y] * Sx[qp,x] * V[y,x,c]
               = sum_x Sx[qp,x] * (Sy @ V)[qp, x, c]

the y-contraction is a dense MXU matmul (K=H instead of K=HW) and the
x-contraction is a cheap VPU multiply-reduce. Factor construction costs
O(Lq*P*(H+W)) compares instead of O(Lq*HW*4P): ~40x less one-hot work.
Attention weights and y-border validity fold into Sy; x-border validity into
Sx (grid_sample zero-padding semantics are separable: corner validity =
valid_x * valid_y; reference F.grid_sample call at arch/utils.py:229-231).

Backward is separable too (_sep_bwd_kernel): three MXU contractions per
(bh, wtile) produce dV, dSy, dSx — replacing the compare-accumulate bwd's
O(Lq*HW*4P) VPU mask work for large levels — and the chain rule to
(dloc, dattn) runs as range-safe compare-gathers in XLA. Small levels keep
the v1 compare-accumulate bwd (K=H starves the MXU below ~1024 positions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import _level_bwd_compare, _round_up


def _sep_factors(loc, attn, H: int, W: int):
    """One-hot-interp row/col factors for one level.
    loc [B, Lq, h, P, 2], attn [B, Lq, h, P] ->
    Sy [BH, Lq, P, H] (attn + y-validity folded), Sx [BH, Lq, P, W]."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    a = attn.astype(jnp.float32)

    ih = jnp.arange(H, dtype=jnp.int32)
    iw = jnp.arange(W, dtype=jnp.int32)
    # out-of-range corner indices simply never match the iota -> weight 0,
    # which IS the zero-padding border rule
    sy = (jnp.where(ih == y0i[..., None], (a * (1.0 - ty))[..., None], 0.0)
          + jnp.where(ih == y0i[..., None] + 1, (a * ty)[..., None], 0.0))
    sx = (jnp.where(iw == x0i[..., None], (1.0 - tx)[..., None], 0.0)
          + jnp.where(iw == x0i[..., None] + 1, tx[..., None], 0.0))

    B, Lq, h, P = a.shape
    sy = sy.transpose(0, 2, 1, 3, 4).reshape(B * h, Lq, P, H)
    sx = sx.transpose(0, 2, 1, 3, 4).reshape(B * h, Lq, P, W)
    return sy, sx


def _sep_kernel(syt_ref, sxt_ref, v_ref, out_ref, *, wtile: int, c: int,
                fast: bool = False):
    """Transposed layout: queries (R) live on LANES so the W/c split lands on
    sublanes (Mosaic cannot split the lane dim of a vector). The value block
    stays in its NATURAL [H, wtile*c] layout — the y-contraction runs with the
    lhs contracting dim on sublanes (free on the MXU), so no value transpose
    is ever materialized.

    Grid (BH, n_wtiles). Blocks: syt [1, H, R], sxt [1, W_pad, R] (full; the
    kernel slices its wtile of rows), v [1, H, wtile*c], out [1, c, R]
    (revisited across wtiles).

        A^T[(x,c), r] = sum_y V[y,(x,c)] * Sy^T[y,r];  out^T += sum_x Sx^T*A^T
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # y-interp of the whole W-tile: MXU, K = H (contraction on sublanes).
    # fast mode: bf16 inputs, one MXU pass (vs 6 passes for f32 HIGHEST) —
    # serving-only; ~1e-2 rel output error, imperceptible after sigmoid/top-K.
    At = jax.lax.dot_general(
        v_ref[0], syt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )  # [wtile*c, R]
    R = At.shape[-1]
    A3 = At.reshape(wtile, c, R)  # sublane split: supported
    sx = sxt_ref[0, pl.ds(t * wtile, wtile), :]  # [wtile, R]
    out_ref[0, :, :] += jnp.sum(A3 * sx[:, None, :], axis=0)


# below this spatial size the compare-accumulate kernel (O(Lq*HW*4P) VPU) is
# cheaper than the dense y-interp matmul (K=H starves the MXU for small H)
_SEP_MIN_HW = 4096
# fast (bf16) mode: one MXU pass makes the y-interp matmul cheap enough that
# the 40x40 level also wins over compare-accumulate
_SEP_MIN_HW_FAST = 1024

# A/B flag (MSDA_FWD_PSUM=1): sum the P sampling points INSIDE the fwd kernel
# (P-major factor layout + VMEM accumulator) so the HBM output shrinks from
# [c, LQ_PAD*P] to [c, LQ_PAD] and the XLA epilogue reduce disappears.
# Interpret-tested equal; default off until the on-device A/B lands.
import os as _os

_FWD_PSUM = _os.environ.get("MSDA_FWD_PSUM", "0") == "1"


def _sep_kernel_psum(syt_ref, sxt_ref, v_ref, out_ref, acc_ref, *,
                     wtile: int, c: int, lq_pad: int, n_points: int,
                     n_t: int, fast: bool = False):
    """P-sum-in-kernel variant of _sep_kernel. Factors arrive P-MAJOR
    (r = p * LQ_PAD + q), contributions accumulate in a VMEM scratch
    [c, R_PAD], and the last wtile folds the P point-blocks into
    out [c, LQ_PAD] — the P-sum the standard variant leaves to XLA."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    At = jax.lax.dot_general(
        v_ref[0], syt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )  # [wtile*c, R_PAD]
    R = At.shape[-1]
    A3 = At.reshape(wtile, c, R)
    sx = sxt_ref[0, pl.ds(t * wtile, wtile), :]
    acc_ref[...] += jnp.sum(A3 * sx[:, None, :], axis=0)

    @pl.when(t == n_t - 1)
    def _():
        acc = acc_ref[...]
        s = acc[:, :lq_pad]
        for p in range(1, n_points):
            s = s + acc[:, p * lq_pad:(p + 1) * lq_pad]
        out_ref[0, :, :lq_pad] = s


def _msda_sep_fwd_impl(value, spatial_shapes, loc_all, attn_all,
                       num_points_list, fast: bool = False):
    from .msda import _level_fwd_onehot

    B, Len_v, n_head, c = value.shape
    Lq = loc_all.shape[1]
    BH = B * n_head
    LQ_PAD = _round_up(Lq, 8)
    min_hw = _SEP_MIN_HW_FAST if fast else _SEP_MIN_HW
    compute_dtype = jnp.bfloat16 if fast else jnp.float32

    out = jnp.zeros((BH, LQ_PAD, c), jnp.float32)
    v_off = p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        HW = H * W
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + HW, axis=1)
        loc = jax.lax.slice_in_dim(loc_all, p_off, p_off + P, axis=3)
        attn = jax.lax.slice_in_dim(attn_all, p_off, p_off + P, axis=3)
        v_off += HW
        p_off += P

        if HW < min_hw:
            out = out + _level_fwd_onehot(value_l, loc, attn, H, W, P, LQ_PAD,
                                          fast=fast)
            continue

        sy, sx = _sep_factors(loc, attn, H, W)  # [BH, Lq, P, H/W]
        if LQ_PAD != Lq:
            pad = ((0, 0), (0, LQ_PAD - Lq), (0, 0), (0, 0))
            sy = jnp.pad(sy, pad)
            sx = jnp.pad(sx, pad)
        R = LQ_PAD * P
        R_PAD = _round_up(R, 128)

        # factors transposed: [BH, H/W, R_PAD] (queries on lanes); XLA fuses
        # these transposes into the elementwise factor build — no copy.
        # P-sum-in-kernel mode uses the P-MAJOR flattening (r = p*LQ_PAD + q)
        # so the kernel can fold the P point-blocks with static lane slices.
        tr = (0, 3, 2, 1) if _FWD_PSUM else (0, 3, 1, 2)
        syt = sy.transpose(*tr).reshape(BH, H, R).astype(compute_dtype)
        sxt = sx.transpose(*tr).reshape(BH, W, R).astype(compute_dtype)
        if R_PAD != R:
            syt = jnp.pad(syt, ((0, 0), (0, 0), (0, R_PAD - R)))
            sxt = jnp.pad(sxt, ((0, 0), (0, 0), (0, R_PAD - R)))

        wtile = max(1, min(W, 512 // c))
        W_pad = _round_up(W, wtile)
        n_t = W_pad // wtile
        if W_pad != W:
            sxt = jnp.pad(sxt, ((0, 0), (0, W_pad - W), (0, 0)))
        # value in NATURAL layout [BH, H, W_pad*c] — just the level reshape
        v_l = jnp.swapaxes(value_l, 1, 2).reshape(BH, H, W, c).astype(compute_dtype)
        if W_pad != W:
            v_l = jnp.pad(v_l, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
        v_l = v_l.reshape(BH, H, W_pad * c)

        in_specs = [
            pl.BlockSpec((1, H, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_pad, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, wtile * c), lambda bh, t: (bh, 0, t),
                         memory_space=pltpu.VMEM),
        ]
        if _FWD_PSUM:
            LQ2 = _round_up(LQ_PAD, 128)
            level_out = pl.pallas_call(
                functools.partial(_sep_kernel_psum, wtile=wtile, c=c,
                                  lq_pad=LQ_PAD, n_points=P, n_t=n_t,
                                  fast=fast),
                grid=(BH, n_t),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, c, LQ2), lambda bh, t: (bh, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((BH, c, LQ2), jnp.float32),
                scratch_shapes=[pltpu.VMEM((c, R_PAD), jnp.float32)],
            )(syt, sxt, v_l)
            out = out + level_out[:, :, :LQ_PAD].transpose(0, 2, 1)
            continue

        level_out = pl.pallas_call(
            functools.partial(_sep_kernel, wtile=wtile, c=c, fast=fast),
            grid=(BH, n_t),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c, R_PAD), lambda bh, t: (bh, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH, c, R_PAD), jnp.float32),
        )(syt, sxt, v_l)

        # [BH, c, R_PAD] -> [BH, LQ_PAD, c] with P summed out
        lvl = level_out[:, :, :R].reshape(BH, c, LQ_PAD, P).sum(axis=3)
        out = out + lvl.transpose(0, 2, 1)

    out = out[:, :Lq].reshape(B, n_head, Lq, c).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, n_head * c).astype(value.dtype)


def _sep_bwd_kernel(syt_ref, sxt_ref, gt_ref, v_ref,
                    dv_ref, dsyt_ref, dsxt_ref, *, wtile: int, c: int,
                    exact: bool):
    """Separable backward. Same transposed layout as the forward kernel
    (queries-on-lanes, R = LQ_PAD*P). Per (bh, wtile) three MXU contractions
    replace the compare-accumulate bwd's O(Lq*HW*4P) VPU masks:

        U^T[(x,c), r] = Sx^T[x, r] * g^T[c, r]            (VPU outer build)
        dV[y, (x,c)]  = Sy^T[y, :] @ U^T[(x,c), :]^T      (NT matmul, K=R)
        dSy^T[y, r]  += V[y, (x,c)] @ U^T[(x,c), r]       (NN matmul, K=wc)
        A^T[(x,c), r] = V^T-contraction (the fwd product)  (K=H)
        dSx^T[x, r]   = sum_c A^T[(x,c), r] * g^T[c, r]   (VPU reduce)

    Grid (BH, n_wtiles). Blocks: syt [1, H, R_PAD], sxt [1, W_pad, R_PAD]
    (full; kernel slices its wtile), gt [1, c, R_PAD], v [1, H, wtile*c];
    outs: dv [1, H, wtile*c] (per tile), dsyt [1, H, R_PAD] (accumulated),
    dsxt [1, wtile, R_PAD] (per tile)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dsyt_ref[...] = jnp.zeros_like(dsyt_ref)

    prec = jax.lax.Precision.HIGHEST if exact else None
    syt = syt_ref[0]                                   # [H, R]
    gt = gt_ref[0]                                     # [c, R]
    v = v_ref[0]                                       # [H, wtile*c]
    sx_t = sxt_ref[0, pl.ds(t * wtile, wtile), :]      # [wtile, R]
    R = syt.shape[-1]

    ut = (sx_t[:, None, :] * gt[None, :, :]).reshape(wtile * c, R)
    dv_ref[0, :, :] = jax.lax.dot_general(
        syt, ut, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # [H, wtile*c]
    dsyt_ref[0, :, :] += jnp.dot(
        v, ut, preferred_element_type=jnp.float32, precision=prec)  # [H, R]

    at = jax.lax.dot_general(
        v, syt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # [wtile*c, R]
    a3 = at.reshape(wtile, c, R)
    dsxt_ref[0, :, :] = jnp.sum(a3 * gt[None, :, :], axis=1)  # [wtile, R]


def _level_bwd_sep(value_l, loc, attn, g_r, H, W, P, exact, out_dtypes):
    """One level of the separable backward: kernel for dV/dSy/dSx, then the
    XLA chain rule to (dloc, dattn) via range-safe compare-gathers (an
    out-of-range corner never matches the iota -> grad 0, the zero-padding
    border rule — identical semantics to _sep_factors)."""
    B, HW, n_head, c = value_l.shape
    Lq = loc.shape[1]
    BH = B * n_head
    LQ_PAD = g_r.shape[1]

    # AMP (bf16 value) backward: bf16 kernel operands — the dots run
    # single-pass either way (precision=None lowers f32 operands to one
    # bf16 MXU pass too), but bf16 operands halve the VMEM footprint and
    # bandwidth of the three contractions and double the W-tile.
    # Accumulation and all outputs stay f32. Same accuracy class as the
    # fast fwd (~1e-3 rel on grads; test_deform_attn.py bounds it).
    compute_dtype = jnp.float32 if exact else jnp.bfloat16

    sy, sx = _sep_factors(loc, attn, H, W)  # [BH, Lq, P, H/W] f32
    if LQ_PAD != Lq:
        pad = ((0, 0), (0, LQ_PAD - Lq), (0, 0), (0, 0))
        sy = jnp.pad(sy, pad)
        sx = jnp.pad(sx, pad)
    R = LQ_PAD * P
    R_PAD = _round_up(R, 128)

    syt = sy.transpose(0, 3, 1, 2).reshape(BH, H, R).astype(compute_dtype)
    sxt = sx.transpose(0, 3, 1, 2).reshape(BH, W, R).astype(compute_dtype)
    g_rep = jnp.broadcast_to(g_r[:, :, None, :], (BH, LQ_PAD, P, c))
    gt = jnp.swapaxes(g_rep.reshape(BH, R, c), 1, 2).astype(compute_dtype)
    if R_PAD != R:
        syt = jnp.pad(syt, ((0, 0), (0, 0), (0, R_PAD - R)))
        sxt = jnp.pad(sxt, ((0, 0), (0, 0), (0, R_PAD - R)))
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, R_PAD - R)))

    wtile = max(1, min(W, (256 if exact else 512) // c))
    W_pad = _round_up(W, wtile)
    n_t = W_pad // wtile
    if W_pad != W:
        sxt = jnp.pad(sxt, ((0, 0), (0, W_pad - W), (0, 0)))
    v_l = jnp.swapaxes(value_l, 1, 2).reshape(BH, H, W, c).astype(compute_dtype)
    if W_pad != W:
        v_l = jnp.pad(v_l, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
    v_l = v_l.reshape(BH, H, W_pad * c)

    dv, dsyt, dsxt = pl.pallas_call(
        functools.partial(_sep_bwd_kernel, wtile=wtile, c=c, exact=exact),
        grid=(BH, n_t),
        in_specs=[
            pl.BlockSpec((1, H, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_pad, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, wtile * c), lambda bh, t: (bh, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, wtile * c), lambda bh, t: (bh, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, R_PAD), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wtile, R_PAD), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, H, W_pad * c), jnp.float32),
            jax.ShapeDtypeStruct((BH, H, R_PAD), jnp.float32),
            jax.ShapeDtypeStruct((BH, W_pad, R_PAD), jnp.float32),
        ),
    )(syt, sxt, gt, v_l)

    dv = dv.reshape(BH, H, W_pad, c)[:, :, :W]
    dv = dv.reshape(B, n_head, HW, c).transpose(0, 2, 1, 3)

    def to_blhp(d, n):  # [BH, n, R_PAD] -> [B, Lq, h, P, n]
        d = d[:, :, :R].reshape(BH, n, LQ_PAD, P).transpose(0, 2, 3, 1)
        return d[:, :Lq].reshape(B, n_head, Lq, P, n).transpose(0, 2, 1, 3, 4)

    dsy = to_blhp(dsyt, H)            # [B, Lq, h, P, H]
    dsx = to_blhp(dsxt, W_pad)[..., :W]

    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0i = jnp.floor(x).astype(jnp.int32)
    y0i = jnp.floor(y).astype(jnp.int32)
    tx = (x - jnp.floor(x)).astype(jnp.float32)
    ty = (y - jnp.floor(y)).astype(jnp.float32)
    a = attn.astype(jnp.float32)

    ih = jnp.arange(H, dtype=jnp.int32)
    iw = jnp.arange(W, dtype=jnp.int32)
    dA0 = jnp.sum(jnp.where(ih == y0i[..., None], dsy, 0.0), -1)
    dA1 = jnp.sum(jnp.where(ih == y0i[..., None] + 1, dsy, 0.0), -1)
    dB0 = jnp.sum(jnp.where(iw == x0i[..., None], dsx, 0.0), -1)
    dB1 = jnp.sum(jnp.where(iw == x0i[..., None] + 1, dsx, 0.0), -1)

    dattn = (1.0 - ty) * dA0 + ty * dA1  # attn folded into Sy only
    dty = a * (dA1 - dA0)
    dtx = dB1 - dB0                      # Sy (incl. attn) is dSx's upstream
    dloc = jnp.stack([dtx * W, dty * H], axis=-1)
    v_dtype, l_dtype, a_dtype = out_dtypes
    return dv.astype(v_dtype), dloc.astype(l_dtype), dattn.astype(a_dtype)


# below this the compare-accumulate bwd kernel wins (K=H starves the MXU);
# MSDA_SEP_BWD_MIN_HW overrides for on-device A/Bs (e.g. 256 routes the
# 20x20=400 level through the MXU kernel too — PERF.md §6 open item).
# Read ONCE at import: setting the env var after this module is imported has
# no effect (re-import / fresh process to change it).
try:
    _SEP_BWD_MIN_HW = int(_os.environ.get("MSDA_SEP_BWD_MIN_HW", "1024"))
except ValueError:
    import warnings as _warnings

    _warnings.warn(
        f"MSDA_SEP_BWD_MIN_HW={_os.environ['MSDA_SEP_BWD_MIN_HW']!r} is not "
        "an integer; falling back to 1024", stacklevel=1)
    _SEP_BWD_MIN_HW = 1024


def _msda_sep_bwd_impl(value, spatial_shapes, loc_all, attn_all,
                       num_points_list, g):
    B, Len_v, n_head, c = value.shape
    Lq = loc_all.shape[1]
    BH = B * n_head
    LQ_PAD = _round_up(Lq, 8)
    exact = value.dtype == jnp.float32

    g_r = g.reshape(B, Lq, n_head, c).transpose(0, 2, 1, 3).reshape(BH, Lq, c)
    g_r = g_r.astype(jnp.float32)
    if LQ_PAD != Lq:
        g_r = jnp.pad(g_r, ((0, 0), (0, LQ_PAD - Lq), (0, 0)))

    out_dtypes = (value.dtype, loc_all.dtype, attn_all.dtype)
    dvalue_parts, dloc_parts, dattn_parts = [], [], []
    v_off = p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        HW = H * W
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + HW, axis=1)
        loc = jax.lax.slice_in_dim(loc_all, p_off, p_off + P, axis=3)
        attn = jax.lax.slice_in_dim(attn_all, p_off, p_off + P, axis=3)
        level_bwd = _level_bwd_sep if HW >= _SEP_BWD_MIN_HW else _level_bwd_compare
        dv, dloc, dattn = level_bwd(value_l, loc, attn, g_r, H, W, P, exact,
                                    out_dtypes)
        dvalue_parts.append(dv)
        dloc_parts.append(dloc)
        dattn_parts.append(dattn)
        v_off += HW
        p_off += P

    return (jnp.concatenate(dvalue_parts, axis=1),
            jnp.concatenate(dloc_parts, axis=3),
            jnp.concatenate(dattn_parts, axis=3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def _msda_sep(value, spatial_shapes, sampling_locations, attention_weights,
              num_points_list, fast):
    return _msda_sep_fwd_impl(value, spatial_shapes, sampling_locations,
                              attention_weights, num_points_list, fast=fast)


def _fwd(value, spatial_shapes, loc, attn, num_points_list, fast):
    out = _msda_sep_fwd_impl(value, spatial_shapes, loc, attn, num_points_list,
                             fast=fast)
    # NOTE: saving loc/attn residuals flattened to [B, Lq, -1] (to dodge the
    # badly-tiled 5-D layouts seen as ~12 ms/step of copy-starts) measured
    # NEUTRAL at bs=16 (92.06 -> 91.99 img/s, 2026-08-17): those copies are
    # async and fully overlapped. Keep the plain residuals.
    return out, (value, loc, attn)


def _bwd(spatial_shapes, num_points_list, fast, res, g):
    value, loc, attn = res
    return _msda_sep_bwd_impl(value, spatial_shapes, loc, attn,
                              num_points_list, g)


_msda_sep.defvjp(_fwd, _bwd)


def ms_deform_attn_sep(value, spatial_shapes, sampling_locations,
                       attention_weights, num_points_list, fast: bool = False):
    return _msda_sep(value, tuple(map(tuple, spatial_shapes)),
                     sampling_locations, attention_weights,
                     tuple(num_points_list), bool(fast))
