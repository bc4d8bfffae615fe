"""Batched Hungarian assignment for padded cost matrices.

Parity target: reference src/d_fine/matcher.py:239-247 (per-image scipy
linear_sum_assignment on CPU). TPU redesign: the cost matrices for ALL output
sets (final + aux + pre + enc) are computed on device in one batched pass
(train/matcher.py), then a single `jax.pure_callback` ships the padded
[S, B, Q, G] cost tensor to the host where each (set, image) problem is solved
with the exact LAPJV algorithm. A C++ LAPJV (native/lapjv.cpp) is used when
built; scipy's C implementation is the fallback — both produce exact optima.

The callback also computes the GO union indices (reference
dfine_criterion.py:570-591) so only one host round-trip happens per step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from ..native import lapjv as _native_lapjv  # optional C++ solver
except Exception:  # pragma: no cover - fallback path
    _native_lapjv = None

from scipy.optimize import linear_sum_assignment


def _solve_one(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact rectangular assignment (rows=queries, cols=targets)."""
    if _native_lapjv is not None:
        return _native_lapjv.solve(cost)
    return linear_sum_assignment(cost)


def _host_solve(costs: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """costs [S, B, Q, G] float32, n_valid [B] int32.
    Returns assign [S, B, G] int32: query index matched to gt slot g, or -1."""
    S, B, Q, G = costs.shape
    out = np.full((S, B, G), -1, np.int32)
    costs = np.nan_to_num(costs, nan=1.0)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        for s in range(S):
            rows, cols = _solve_one(costs[s, b, :, :n])
            out[s, b, cols] = rows.astype(np.int32)
    return out


def _host_go_union(assign: np.ndarray, n_valid: np.ndarray, k_cap: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GO union across match sets (reference dfine_criterion.py:570-591):
    concatenate all (query, gt) pairs, count duplicates, sort by count desc,
    keep the first gt seen per query. Returns (go_q [B,K], go_g [B,K], n_go [B]).
    """
    S, B, G = assign.shape
    go_q = np.zeros((B, k_cap), np.int32)
    go_g = np.zeros((B, k_cap), np.int32)
    n_go = np.zeros((B,), np.int32)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        pairs = []
        for s in range(S):
            for g in range(n):
                q = assign[s, b, g]
                if q >= 0:
                    pairs.append((q, g))
        if not pairs:
            continue
        arr = np.asarray(pairs, np.int64)
        uniq, counts = np.unique(arr, axis=0, return_counts=True)
        # stable sort by count desc (reference uses argsort descending)
        order = np.argsort(-counts, kind="stable")
        uniq = uniq[order]
        seen = {}
        for q, g in uniq:
            if q not in seen:
                seen[q] = g
        qs = np.fromiter(seen.keys(), np.int32, len(seen))
        gs = np.fromiter(seen.values(), np.int32, len(seen))
        k = min(len(qs), k_cap)
        go_q[b, :k] = qs[:k]
        go_g[b, :k] = gs[:k]
        n_go[b] = k
    return go_q, go_g, n_go


def _host_match_and_union(costs, n_valid, k_cap: int):
    costs = np.asarray(costs, np.float32)
    n_valid = np.asarray(n_valid, np.int32)
    assign = _host_solve(costs, n_valid)
    go_q, go_g, n_go = _host_go_union(assign, n_valid, k_cap)
    return assign, go_q, go_g, n_go


def batched_hungarian_with_go(
    costs: jnp.ndarray,   # [S, B, Q, G] — set 0 MUST be the final-layer match
    n_valid: jnp.ndarray,  # [B]
    k_cap: int,
):
    """Device entry point. Returns:
    assign [S, B, G] int32 (query per gt slot, -1 invalid),
    go_q/go_g [B, K] int32 padded GO union, n_go [B] int32.
    """
    S, B, Q, G = costs.shape
    out_shapes = (
        jax.ShapeDtypeStruct((S, B, G), jnp.int32),
        jax.ShapeDtypeStruct((B, k_cap), jnp.int32),
        jax.ShapeDtypeStruct((B, k_cap), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    return jax.pure_callback(
        functools.partial(_host_match_and_union, k_cap=k_cap),
        out_shapes,
        costs,
        n_valid,
        vmap_method="sequential",
    )


def batched_hungarian(costs: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Single-set assignment [B, Q, G] -> [B, G] (no GO union)."""
    B, Q, G = costs.shape
    out = jax.pure_callback(
        lambda c, n: _host_solve(np.asarray(c, np.float32)[None], np.asarray(n, np.int32))[0],
        jax.ShapeDtypeStruct((B, G), jnp.int32),
        costs,
        n_valid,
        vmap_method="sequential",
    )
    return out
