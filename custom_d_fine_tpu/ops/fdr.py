"""Fine-grained Distribution Refinement (FDR) transforms.

Parity targets: reference src/d_fine/arch/utils.py:119-188 (distance2bbox,
weighting_function) and :267-354 (translate_gt, bbox2distance). All functions
are shape-static and mask-friendly (no boolean indexing): translate_gt is
rewritten with where-selects so it jits cleanly on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import box_xyxy_to_cxcywh


def weighting_function(reg_max: int, up: jnp.ndarray, reg_scale: jnp.ndarray) -> jnp.ndarray:
    """Non-uniform bin weighting W(n), length reg_max+1
    (reference arch/utils.py:145-188)."""
    up0 = jnp.abs(jnp.reshape(up, (-1,))[0])
    scale = jnp.abs(jnp.reshape(reg_scale, (-1,))[0])
    upper_bound1 = up0 * scale
    upper_bound2 = up0 * scale * 2.0
    step = (upper_bound1 + 1.0) ** (2.0 / (reg_max - 2))
    left = [-(step ** i) + 1.0 for i in range(reg_max // 2 - 1, 0, -1)]
    right = [step ** i - 1.0 for i in range(1, reg_max // 2)]
    values = [-upper_bound2] + left + [jnp.zeros(())] + right + [upper_bound2]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in values], axis=0)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray, reg_scale) -> jnp.ndarray:
    """Decode per-edge distances into cxcywh boxes
    (reference arch/utils.py:119-142). points = [cx, cy, w, h]."""
    reg_scale = jnp.abs(jnp.reshape(jnp.asarray(reg_scale), (-1,))[0])
    sx = points[..., 2] / reg_scale
    sy = points[..., 3] / reg_scale
    x1 = points[..., 0] - (0.5 * reg_scale + distance[..., 0]) * sx
    y1 = points[..., 1] - (0.5 * reg_scale + distance[..., 1]) * sy
    x2 = points[..., 0] + (0.5 * reg_scale + distance[..., 2]) * sx
    y2 = points[..., 1] + (0.5 * reg_scale + distance[..., 3]) * sy
    return box_xyxy_to_cxcywh(jnp.stack([x1, y1, x2, y2], axis=-1))


def translate_gt(gt: jnp.ndarray, reg_max: int, reg_scale, up):
    """Map continuous distances to (left-bin index, right weight, left weight)
    (reference arch/utils.py:267-327), rewritten branch-free for jit."""
    gt = gt.reshape(-1)
    fv = weighting_function(reg_max, jnp.asarray(up), jnp.asarray(reg_scale))  # [reg_max+1]

    diffs = fv[None, :] - gt[:, None]
    closest_left = jnp.sum(diffs <= 0, axis=1) - 1  # int in [-1, reg_max]
    indices = closest_left.astype(jnp.float32)

    valid = (indices >= 0) & (indices < reg_max)
    safe_idx = jnp.clip(closest_left, 0, reg_max - 1)
    left_values = fv[safe_idx]
    right_values = fv[safe_idx + 1]
    left_diffs = jnp.abs(gt - left_values)
    right_diffs = jnp.abs(right_values - gt)
    wr_valid = left_diffs / (left_diffs + right_diffs + 1e-20)

    neg = indices < 0
    pos = indices >= reg_max
    weight_right = jnp.where(valid, wr_valid, 0.0)
    weight_right = jnp.where(pos, 1.0, weight_right)
    weight_left = jnp.where(valid, 1.0 - wr_valid, 0.0)
    weight_left = jnp.where(neg, 1.0, weight_left)
    indices = jnp.where(neg, 0.0, indices)
    indices = jnp.where(pos, reg_max - 0.1, indices)
    return indices, weight_right, weight_left


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int, reg_scale, up,
                  eps: float = 0.1):
    """Continuous GT distances -> (bin index, right/left interp weights)
    (reference arch/utils.py:330-354). points [N,4] cxcywh, bbox [N,4] xyxy."""
    reg_scale = jnp.abs(jnp.reshape(jnp.asarray(reg_scale), (-1,))[0])
    sx = points[:, 2] / reg_scale + 1e-16
    sy = points[:, 3] / reg_scale + 1e-16
    left = (points[:, 0] - bbox[:, 0]) / sx - 0.5 * reg_scale
    top = (points[:, 1] - bbox[:, 1]) / sy - 0.5 * reg_scale
    right = (bbox[:, 2] - points[:, 0]) / sx - 0.5 * reg_scale
    bottom = (bbox[:, 3] - points[:, 1]) / sy - 0.5 * reg_scale
    four = jnp.stack([left, top, right, bottom], axis=-1)
    idx, wr, wl = translate_gt(four, reg_max, reg_scale, up)
    idx = jnp.clip(idx, 0, reg_max - eps)
    return (
        jax.lax.stop_gradient(idx.reshape(-1)),
        jax.lax.stop_gradient(wr),
        jax.lax.stop_gradient(wl),
    )
