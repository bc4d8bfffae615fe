"""Multi-scale deformable attention core for TPU.

Parity target: reference src/d_fine/arch/utils.py:191-264
(deformable_attention_core_func_v2). The torch version leans on CUDA
F.grid_sample; here the same math — per-level bilinear sampling of value maps
at predicted locations, weighted by softmaxed attention and reduced over
levels×points — is expressed two ways:

- `ms_deform_attn_xla`: pure-XLA gather of the 4 bilinear corners per sample
  point (zero-padding semantics of grid_sample align_corners=False), fully
  differentiable via XLA's scatter-add gradients.
- a Pallas kernel (ops/pallas/msda.py) for the hot inference path.

`method="discrete"` (integer gather, reference :233-254) is a 1-corner
special case exposed via the same entry point.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value_l: jnp.ndarray,   # [B, H*W, n_head, c] for this level
    loc: jnp.ndarray,       # [B, Lq, n_head, P_l, 2] in [0,1] (x, y)
    H: int,
    W: int,
) -> jnp.ndarray:
    """Bilinear sample with grid_sample(align_corners=False, padding_mode=zeros)
    semantics. Returns [B, Lq, n_head, P_l, c]."""
    B, HW, n_head, c = value_l.shape
    _, Lq, _, P, _ = loc.shape

    # pixel coordinates: grid_sample align_corners=False maps [0,1] -> [-0.5, W-0.5]
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # value laid out per-head for per-head gathers: [B, n_head, HW, c]
    v = jnp.swapaxes(value_l, 1, 2)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # [B, Lq, n_head, P]
        idx = jnp.transpose(flat, (0, 2, 1, 3)).reshape(B, n_head, Lq * P)
        g = jnp.take_along_axis(v, idx[..., None], axis=2)  # [B, n_head, Lq*P, c]
        g = g.reshape(B, n_head, Lq, P, c).transpose(0, 2, 1, 3, 4)
        w = w * valid.astype(w.dtype)
        return g * w[..., None]

    out = (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )
    return out


def _nearest_gather_level(
    value_l: jnp.ndarray, loc: jnp.ndarray, H: int, W: int
) -> jnp.ndarray:
    """'discrete' method: integer gather at round(loc*size - 0.5 + 0.5)
    (reference :233-254, including its H-only clamp quirk is NOT reproduced —
    we clamp x to W-1 and y to H-1, the mathematically intended behavior)."""
    B, HW, n_head, c = value_l.shape
    _, Lq, _, P, _ = loc.shape
    xi = jnp.clip((loc[..., 0] * W + 0.5).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((loc[..., 1] * H + 0.5).astype(jnp.int32), 0, H - 1)
    flat = yi * W + xi
    v = jnp.swapaxes(value_l, 1, 2)
    idx = jnp.transpose(flat, (0, 2, 1, 3)).reshape(B, n_head, Lq * P)
    g = jnp.take_along_axis(v, idx[..., None], axis=2)
    return g.reshape(B, n_head, Lq, P, c).transpose(0, 2, 1, 3, 4)


def _onehot_matmul_level(
    value_l: jnp.ndarray,   # [B, H*W, n_head, c]
    loc: jnp.ndarray,       # [B, Lq, n_head, P_l, 2] in [0,1]
    attn_w: jnp.ndarray,    # [B, Lq, n_head, P_l]
    H: int,
    W: int,
) -> jnp.ndarray:
    """MXU formulation: fold the bilinear corner weights AND the attention
    weights into one sparse matrix S [Lq, H*W] (4 entries per point) built by
    compare-accumulate, then sample-and-reduce as one matmul S @ V per
    (batch, head). Random gathers become a systolic-array pass — the win on
    TPU when H*W is moderate. Returns [B, Lq, n_head, c] (already
    attention-reduced for this level)."""
    B, HW, n_head, c = value_l.shape
    _, Lq, _, P, _ = loc.shape
    f32 = jnp.float32

    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(f32)
    ty = (y - y0).astype(f32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idxs = []
    ws = []
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
        ws.append(wgt * valid.astype(f32) * attn_w.astype(f32))

    corner_idx = jnp.stack(idxs, axis=-1).reshape(B, Lq, n_head, 4 * P)
    corner_w = jnp.stack(ws, axis=-1).reshape(B, Lq, n_head, 4 * P)

    # scatter the 4P weighted entries into S [B, n_head, Lq, HW]
    S = jnp.zeros((B, n_head, Lq, HW), f32)
    b_i = jnp.arange(B)[:, None, None, None]
    h_i = jnp.arange(n_head)[None, None, :, None]
    q_i = jnp.arange(Lq)[None, :, None, None]
    S = S.at[
        jnp.broadcast_to(b_i, corner_idx.shape),
        jnp.broadcast_to(h_i, corner_idx.shape),
        jnp.broadcast_to(q_i, corner_idx.shape),
        corner_idx,
    ].add(corner_w)

    v = jnp.swapaxes(value_l, 1, 2).astype(f32)  # [B, n_head, HW, c]
    return jnp.einsum("bhqk,bhkc->bqhc", S, v)


def ms_deform_attn_onehot(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_points_list: Sequence[int],
) -> jnp.ndarray:
    """One-hot/scatter + matmul variant of the deformable core (same math as
    ms_deform_attn_xla; MXU-bound instead of gather-bound)."""
    B, Len_v, n_head, c = value.shape
    Lq = sampling_locations.shape[1]
    out = jnp.zeros((B, Lq, n_head, c), jnp.float32)
    v_off = p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + H * W, axis=1)
        loc = jax.lax.slice_in_dim(sampling_locations, p_off, p_off + P, axis=3)
        w = jax.lax.slice_in_dim(attention_weights, p_off, p_off + P, axis=3)
        out = out + _onehot_matmul_level(value_l, loc, w, H, W)
        v_off += H * W
        p_off += P
    return out.reshape(B, Lq, n_head * c).astype(value.dtype)


def ms_deform_attn_xla(
    value: jnp.ndarray,                  # [B, Len_v, n_head, c] (levels concatenated)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jnp.ndarray,     # [B, Lq, n_head, P_total, 2] in [0,1]
    attention_weights: jnp.ndarray,      # [B, Lq, n_head, P_total] (softmaxed)
    num_points_list: Sequence[int],
    method: str = "default",
) -> jnp.ndarray:
    """Returns [B, Lq, n_head * c]."""
    B, Len_v, n_head, c = value.shape
    Lq = sampling_locations.shape[1]

    level_sizes = [h * w for h, w in spatial_shapes]
    assert sum(level_sizes) == Len_v, (spatial_shapes, Len_v)

    out = jnp.zeros((B, Lq, n_head, c), dtype=value.dtype)
    v_off = 0
    p_off = 0
    for (H, W), P in zip(spatial_shapes, num_points_list):
        value_l = jax.lax.slice_in_dim(value, v_off, v_off + H * W, axis=1)
        loc = jax.lax.slice_in_dim(sampling_locations, p_off, p_off + P, axis=3)
        w = jax.lax.slice_in_dim(attention_weights, p_off, p_off + P, axis=3)
        if method == "discrete":
            sampled = _nearest_gather_level(value_l, loc, H, W)
        else:
            sampled = _bilinear_gather_level(value_l, loc, H, W)
        out = out + jnp.sum(sampled * w[..., None], axis=3)
        v_off += H * W
        p_off += P

    return out.reshape(B, Lq, n_head * c)


def resolve_impl(impl: str = "auto") -> str:
    """'auto' -> the separable Pallas kernel on TPU (per-level hybrid:
    MXU y-interp for large levels, compare-accumulate for small ones),
    XLA gather elsewhere. 'fast' (alias 'serve') -> the bf16 single-MXU-pass
    variant of the same kernel — the serving default, and the Trainer's
    default (AMP parity with the torch reference; exact interp via 'auto')."""
    if impl in ("serve", "fast"):
        try:
            return ("pallas_sep_fast" if jax.devices()[0].platform == "tpu"
                    else "xla")
        except Exception:
            return "xla"
    if impl != "auto":
        # strict: a silent fallback to the (2x slower in training) XLA path on
        # a typo'd name already produced one phantom perf regression
        # (round-2's "tunnel drift", which was really msda_impl='xla')
        allowed = ("xla", "pallas", "pallas_sep", "pallas_sep_fast", "onehot")
        if impl not in allowed:
            raise ValueError(f"unknown msda impl {impl!r}; expected one of "
                             f"{('auto', 'serve', 'fast') + allowed}")
        return impl
    try:
        return "pallas_sep" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:
        return "xla"


def ms_deform_attn(
    value, spatial_shapes, sampling_locations, attention_weights, num_points_list,
    method: str = "default", impl: str = "xla",
):
    """Dispatch between implementations (reference keeps a similar method switch
    at arch/utils.py:90-98). impl: xla | pallas | onehot | auto."""
    impl = resolve_impl(impl)
    if impl in ("pallas_sep", "pallas_sep_fast"):
        from .pallas.msda_sep import ms_deform_attn_sep

        return ms_deform_attn_sep(
            value, spatial_shapes, sampling_locations, attention_weights,
            num_points_list, fast=(impl == "pallas_sep_fast")
        )
    if impl == "pallas":
        from .pallas.msda import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights, num_points_list
        )
    if impl == "onehot":
        return ms_deform_attn_onehot(
            value, spatial_shapes, sampling_locations, attention_weights, num_points_list
        )
    return ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights, num_points_list, method
    )
