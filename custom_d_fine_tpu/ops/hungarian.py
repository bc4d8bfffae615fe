"""Host-side (scipy) reference implementation of batched assignment + GO union.

Used ONLY as a cross-check oracle in tests for the on-device solver
(ops/lapjv.py) — the production path never leaves the device. Mirrors the
reference's scipy usage (matcher.py:239-247) and GO-union logic
(dfine_criterion.py:570-591).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def host_solve(costs: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """costs [S, B, Q, G], n_valid [B] -> assign [S, B, G] (query per gt, -1)."""
    S, B, Q, G = costs.shape
    out = np.full((S, B, G), -1, np.int32)
    costs = np.nan_to_num(costs, nan=1.0)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        for s in range(S):
            rows, cols = linear_sum_assignment(costs[s, b, :, :n])
            out[s, b, cols] = rows.astype(np.int32)
    return out


def host_go_union(assign: np.ndarray, n_valid: np.ndarray, num_queries: int):
    """Reference GO union: per query keep the most frequent gt across sets
    (count-desc stable sort over lexicographically sorted unique pairs).
    Returns (best_g [B, Q], valid_q [B, Q])."""
    S, B, G = assign.shape
    best_g = np.zeros((B, num_queries), np.int32)
    valid_q = np.zeros((B, num_queries), bool)
    for b in range(B):
        n = int(n_valid[b])
        pairs = [
            (int(assign[s, b, g]), g)
            for s in range(S)
            for g in range(n)
            if assign[s, b, g] >= 0
        ]
        if not pairs:
            continue
        arr = np.asarray(pairs, np.int64)
        uniq, counts = np.unique(arr, axis=0, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        for q, g in uniq[order]:
            if not valid_q[b, q]:
                valid_q[b, q] = True
                best_g[b, q] = g
    return best_g, valid_q
