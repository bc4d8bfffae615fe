"""Pallas TPU kernel for multi-scale deformable attention.

Replaces the XLA gather formulation (ops/deform_attn.py) on the inference hot
path. Instead of 4-corner random row gathers from HBM (memory-latency bound),
the kernel builds the combined sampling matrix S[q, hw] — bilinear corner
weights x attention weights, <= 4P non-zeros per row — tile by tile in VMEM
via compare-accumulate, and reduces with one MXU matmul per tile:

    out[q, c] = sum_tiles S_tile[q, t] @ V_tile[t, c]

The sampling matrix never exists in HBM (the pure-XLA one-hot variant
ms_deform_attn_onehot materializes it there, which is why it loses). Grid is
(B*heads, spatial tiles); the output block is revisited across tiles and
accumulated in place.

Backward: jax.custom_vjp routes gradients through the (numerically identical)
XLA gather implementation, so the kernel is safe to use under jit+grad even
though training defaults to the XLA path.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(HW: int, cap: int = 1024, step_cost: int = 128) -> int:
    """Spatial tile width for the bwd kernel: the VPU compare/select work is
    proportional to the PADDED level size, so pick the multiple of 128 that
    minimizes padding plus a per-grid-step overhead surrogate. The old
    min(round_up(HW,128), 1024) padded 80x80 to 7168 (+12%) and 40x40 to
    2048 (+28%); this picks 640 (no padding) and 896 (+12%) instead."""
    best_t, best_cost = 128, None
    for t in range(128, cap + 1, 128):
        pad = _round_up(HW, t)
        cost = pad + step_cost * (pad // t)
        if best_cost is None or cost < best_cost:
            best_t, best_cost = t, cost
    return best_t


def _corner_idx_weights(loc, attn_w, H: int, W: int):
    """Flattened corner indices + combined weights for one level.
    loc [B, Lq, h, P, 2], attn_w [B, Lq, h, P] ->
    idx [B, h, Lq, 4P] int32, w [B, h, Lq, 4P] f32."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idxs, ws = [], []
    for dx, dy, wgt in (
        (0, 0, (1 - tx) * (1 - ty)),
        (1, 0, tx * (1 - ty)),
        (0, 1, (1 - tx) * ty),
        (1, 1, tx * ty),
    ):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idxs.append(jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1))
        ws.append(wgt * valid.astype(jnp.float32) * attn_w.astype(jnp.float32))
    idx = jnp.stack(idxs, -1)  # [B, Lq, h, P, 4]
    w = jnp.stack(ws, -1)
    B, Lq, h, P, _ = idx.shape
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(B * h, Lq, 4 * P)
    w = w.transpose(0, 2, 1, 3, 4).reshape(B * h, Lq, 4 * P)
    return idx, w


def _level_kernel(idx_ref, w_ref, v_ref, out_ref, *, tile: int, n_entries: int,
                  fast: bool = False):
    """Grid (BH, n_tiles). Blocks: idx/w [1, LQ_PAD, E], v [1, tile, c],
    out [1, LQ_PAD, c] (revisited across tiles)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    col0 = t * tile
    lq = idx_ref.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, tile), 1) + col0

    s = jnp.zeros((lq, tile), jnp.float32)
    for e in range(n_entries):  # static unroll over 4P corner entries
        idx_e = idx_ref[0, :, e][:, None]          # [LQ, 1]
        w_e = w_ref[0, :, e][:, None]
        s = s + jnp.where(col_ids == idx_e, w_e, 0.0)

    # HIGHEST: full-f32 MXU passes — the matmuls here are tiny (<=10us total),
    # and default bf16 passes cost ~1e-2 output error vs the gather reference.
    # fast (serving) mode takes the single bf16 pass.
    out_ref[0, :, :] += jnp.dot(
        s, v_ref[0], preferred_element_type=jnp.float32,
        precision=None if fast else jax.lax.Precision.HIGHEST,
    )


def _level_fwd_onehot(value_l, loc, w, H, W, P, LQ_PAD, fast: bool = False):
    """One level of the compare-accumulate forward: value_l [B, HW, h, c],
    loc [B, Lq, h, P, 2], w [B, Lq, h, P] -> [BH, LQ_PAD, c]."""
    B, HW, n_head, c = value_l.shape
    Lq = loc.shape[1]
    BH = B * n_head

    idx, cw = _corner_idx_weights(loc, w, H, W)  # [BH, Lq, 4P]
    if LQ_PAD != Lq:
        idx = jnp.pad(idx, ((0, 0), (0, LQ_PAD - Lq), (0, 0)),
                      constant_values=-1)
        cw = jnp.pad(cw, ((0, 0), (0, LQ_PAD - Lq), (0, 0)))

    # value tiles: [BH, HW_pad, c], zero-padded rows are never referenced
    v_l = jnp.swapaxes(value_l, 1, 2).reshape(BH, HW, c).astype(jnp.float32)
    tile = min(_round_up(HW, 128), 1024)
    HW_pad = _round_up(HW, tile)
    if HW_pad != HW:
        v_l = jnp.pad(v_l, ((0, 0), (0, HW_pad - HW), (0, 0)))
    n_tiles = HW_pad // tile

    E = 4 * P
    return pl.pallas_call(
        functools.partial(_level_kernel, tile=tile, n_entries=E, fast=fast),
        grid=(BH, n_tiles),
        in_specs=[
            pl.BlockSpec((1, LQ_PAD, E), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LQ_PAD, E), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LQ_PAD, c), lambda bh, t: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, LQ_PAD, c), jnp.float32),
    )(idx, cw, v_l)


def _msda_pallas_fwd_impl(value, spatial_shapes, sampling_locations,
                          attention_weights, num_points_list):
    B, Len_v, n_head, c = value.shape
    Lq = sampling_locations.shape[1]
    BH = B * n_head
    LQ_PAD = _round_up(Lq, 8)

    out = jnp.zeros((BH, LQ_PAD, c), jnp.float32)
    v_off = p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        HW = H * W
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + HW, axis=1)
        loc = jax.lax.slice_in_dim(sampling_locations, p_off, p_off + P, axis=3)
        w = jax.lax.slice_in_dim(attention_weights, p_off, p_off + P, axis=3)
        out = out + _level_fwd_onehot(value_l, loc, w, H, W, P, LQ_PAD)
        v_off += HW
        p_off += P

    out = out[:, :Lq].reshape(B, n_head, Lq, c).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, n_head * c).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def _msda_pallas(value, spatial_shapes, sampling_locations, attention_weights,
                 num_points_list):
    return _msda_pallas_fwd_impl(value, spatial_shapes, sampling_locations,
                                 attention_weights, num_points_list)


def _level_bwd_kernel(idx_ref, w_ref, g_ref, v_ref, dv_ref, dwe_ref, *,
                      tile: int, n_entries: int, exact: bool):
    """Backward per level. Grid (BH, n_tiles). Blocks:
    idx/w/dwe [1, LQ_PAD, E], g [1, LQ_PAD, c], v/dv [1, tile, c].

    dS_tile = g @ V_tile^T, then one pass over the 4P entries shares each
    compare mask between the two consumers (the kernel is VPU-bound on these
    [LQ, tile] compare/selects, not MXU-bound — profile 2026-08-17):
        s       += where(mask_e, w_e)      (S rebuild for dV)
        dW[e]   += row-reduce(where(mask_e, dS_tile))
    dV_tile = S_tile^T @ g        (replaces XLA's scatter-add — pure MXU)

    exact=False runs both dots as single bf16 MXU passes (vs 6 passes for
    f32 HIGHEST): measured 142.5 -> 131.5 ms/step on the full bs=8 train
    graph (same-session A/B, 2026-08-17). It is selected when the incoming
    value/grad are ALREADY bf16-rounded (bf16 train graph), where HIGHEST
    only buys precision the inputs never had; f32 inputs keep HIGHEST —
    mirrors the torch reference training under AMP autocast.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)

    col0 = t * tile
    lq = idx_ref.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, tile), 1) + col0

    prec = jax.lax.Precision.HIGHEST if exact else None
    g = g_ref[0]  # [LQ, c]
    ds = jnp.dot(g, v_ref[0].T, preferred_element_type=jnp.float32,
                 precision=prec)  # [LQ, tile]

    s = jnp.zeros((lq, tile), jnp.float32)
    for e in range(n_entries):
        mask_e = col_ids == idx_ref[0, :, e][:, None]
        s = s + jnp.where(mask_e, w_ref[0, :, e][:, None], 0.0)
        dwe_ref[0, :, e] += jnp.sum(jnp.where(mask_e, ds, 0.0), axis=1)

    dv_ref[0, :, :] = jnp.dot(
        s.T, g, preferred_element_type=jnp.float32,
        precision=prec,
    )


def _level_bwd_compare(value_l, loc, attn, g_r, H, W, P, exact, out_dtypes):
    """One level of the compare-accumulate backward: runs the Pallas bwd
    kernel and chains folded-weight grads to (dvalue, dloc, dattn) parts.
    value_l [B, HW, h, c]; loc [B, Lq, h, P, 2]; attn [B, Lq, h, P];
    g_r [BH, LQ_PAD, c] f32 (query grads, padded)."""
    B, HW, n_head, c = value_l.shape
    Lq = loc.shape[1]
    BH = B * n_head
    LQ_PAD = g_r.shape[1]

    idx, cw = _corner_idx_weights(loc, attn, H, W)
    if LQ_PAD != Lq:
        idx = jnp.pad(idx, ((0, 0), (0, LQ_PAD - Lq), (0, 0)), constant_values=-1)
        cw = jnp.pad(cw, ((0, 0), (0, LQ_PAD - Lq), (0, 0)))

    v_l = jnp.swapaxes(value_l, 1, 2).reshape(BH, HW, c).astype(jnp.float32)
    tile = _pick_tile(HW)
    HW_pad = _round_up(HW, tile)
    if HW_pad != HW:
        v_l = jnp.pad(v_l, ((0, 0), (0, HW_pad - HW), (0, 0)))
    n_tiles = HW_pad // tile
    E = 4 * P

    dv, dwe = pl.pallas_call(
        functools.partial(_level_bwd_kernel, tile=tile, n_entries=E,
                          exact=exact),
        grid=(BH, n_tiles),
        in_specs=[
            pl.BlockSpec((1, LQ_PAD, E), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LQ_PAD, E), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LQ_PAD, c), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, c), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LQ_PAD, E), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, HW_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((BH, LQ_PAD, E), jnp.float32),
        ),
    )(idx, cw, g_r, v_l)

    dv = dv[:, :HW].reshape(B, n_head, HW, c).transpose(0, 2, 1, 3)

    # chain rule from folded-weight grads to (loc, attn). Entry layout is
    # P-major (fwd flattens [..., P, 4] corner-last): [B, Lq, h, P, 4]
    dwe = dwe[:, :Lq].reshape(B, n_head, Lq, P, 4).transpose(0, 2, 1, 3, 4)
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def valid(xi, yi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(jnp.float32)

    v00 = valid(x0i, y0i)
    v01 = valid(x0i + 1, y0i)
    v10 = valid(x0i, y0i + 1)
    v11 = valid(x0i + 1, y0i + 1)
    b00 = (1 - tx) * (1 - ty) * v00
    b01 = tx * (1 - ty) * v01
    b10 = (1 - tx) * ty * v10
    b11 = tx * ty * v11

    d00, d01, d10, d11 = (dwe[..., 0], dwe[..., 1], dwe[..., 2], dwe[..., 3])
    a = attn.astype(jnp.float32)
    dattn = d00 * b00 + d01 * b01 + d10 * b10 + d11 * b11
    dtx = a * (-d00 * (1 - ty) * v00 + d01 * (1 - ty) * v01
               - d10 * ty * v10 + d11 * ty * v11)
    dty = a * (-d00 * (1 - tx) * v00 - d01 * tx * v01
               + d10 * (1 - tx) * v10 + d11 * tx * v11)
    dloc = jnp.stack([dtx * W, dty * H], axis=-1)
    v_dtype, l_dtype, a_dtype = out_dtypes
    return dv.astype(v_dtype), dloc.astype(l_dtype), dattn.astype(a_dtype)


def _msda_pallas_bwd_impl(value, spatial_shapes, loc_all, attn_all,
                          num_points_list, g):
    """Returns (dvalue, dloc, dattn) — all chain-rule scalars computed in XLA
    from the kernel's dV and folded-weight grads dW."""
    B, Len_v, n_head, c = value.shape
    Lq = loc_all.shape[1]
    BH = B * n_head
    LQ_PAD = _round_up(Lq, 8)
    # bf16 inputs never had the precision HIGHEST would protect — take the
    # single-pass MXU dots (see _level_bwd_kernel docstring)
    exact = value.dtype == jnp.float32

    g_r = g.reshape(B, Lq, n_head, c).transpose(0, 2, 1, 3).reshape(BH, Lq, c)
    g_r = g_r.astype(jnp.float32)
    if LQ_PAD != Lq:
        g_r = jnp.pad(g_r, ((0, 0), (0, LQ_PAD - Lq), (0, 0)))

    out_dtypes = (value.dtype, loc_all.dtype, attn_all.dtype)
    dvalue_parts = []
    dloc_parts = []
    dattn_parts = []
    v_off = p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        HW = H * W
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + HW, axis=1)
        loc = jax.lax.slice_in_dim(loc_all, p_off, p_off + P, axis=3)
        attn = jax.lax.slice_in_dim(attn_all, p_off, p_off + P, axis=3)
        dv, dloc, dattn = _level_bwd_compare(value_l, loc, attn, g_r,
                                             H, W, P, exact, out_dtypes)
        dvalue_parts.append(dv)
        dloc_parts.append(dloc)
        dattn_parts.append(dattn)
        v_off += HW
        p_off += P

    dvalue = jnp.concatenate(dvalue_parts, axis=1)
    dloc = jnp.concatenate(dloc_parts, axis=3)
    dattn = jnp.concatenate(dattn_parts, axis=3)
    return dvalue, dloc, dattn


def _fwd(value, spatial_shapes, loc, attn, num_points_list):
    out = _msda_pallas_fwd_impl(value, spatial_shapes, loc, attn, num_points_list)
    return out, (value, loc, attn)


def _bwd(spatial_shapes, num_points_list, res, g):
    value, loc, attn = res
    return _msda_pallas_bwd_impl(value, spatial_shapes, loc, attn,
                                 num_points_list, g)


_msda_pallas.defvjp(_fwd, _bwd)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, num_points_list):
    return _msda_pallas(value, tuple(map(tuple, spatial_shapes)),
                        sampling_locations, attention_weights,
                        tuple(num_points_list))
