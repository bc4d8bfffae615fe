"""Exact on-device rectangular assignment (Jonker-Volgenant / shortest
augmenting path), pure JAX — runs inside jit on TPU.

Why: the reference solves each Hungarian problem on the CPU via scipy
(matcher.py:239-247), forcing a device->host sync per output set per step.
On this TPU runtime host callbacks are unavailable (axon_pjrt rejects
pure_callback), and even where available they serialize the step. This module
implements the same shortest-augmenting-path algorithm as scipy's
linear_sum_assignment directly with lax control flow, vmapped over
(output_set, batch) so all ~8 x B problems solve concurrently on device.

Problem form: cost [R, C] with R = padded GT slots (rows), C = queries.
Only the first n_valid rows are assigned (same as the reference solving the
[Q, n_gt] problem transposed). Returns col4row [R]: the query assigned to
each GT slot (-1 for invalid rows). Optimal assignment cost matches scipy
exactly (ties may resolve to a different — equally optimal — matching).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


def _dijkstra(cost_row_getter, u, v, row4col, col4row, cur_row, R, C):
    """One augmenting-path search from cur_row (scipy lsap augmenting_path)."""

    def cond(s):
        return s["sink"] < 0

    def body(s):
        i = s["i"]
        SR = s["SR"].at[i].set(True)
        # reduced path costs through row i
        r = s["minVal"] + cost_row_getter(i) - u[i] - v
        improved = (r < s["spc"]) & (~s["SC"])
        spc = jnp.where(improved, r, s["spc"])
        path = jnp.where(improved, i, s["path"])
        masked = jnp.where(s["SC"], INF, spc)
        best = jnp.min(masked)
        cand = masked == best
        cand_unassigned = cand & (row4col < 0)
        # scipy tie-break: prefer an unassigned column on equal cost
        j = jnp.where(jnp.any(cand_unassigned), jnp.argmax(cand_unassigned), jnp.argmax(cand))
        SC = s["SC"].at[j].set(True)
        hit_free = row4col[j] < 0
        return {
            "i": jnp.where(hit_free, i, row4col[j]),
            "minVal": best,
            "spc": spc,
            "path": path,
            "SR": SR,
            "SC": SC,
            "sink": jnp.where(hit_free, j, -1),
        }

    s0 = {
        "i": cur_row,
        "minVal": jnp.float32(0.0),
        "spc": jnp.full((C,), INF),
        "path": jnp.full((C,), -1, jnp.int32),
        "SR": jnp.zeros((R,), bool),
        "SC": jnp.zeros((C,), bool),
        "sink": jnp.int32(-1),
    }
    return jax.lax.while_loop(cond, body, s0)


@partial(jax.jit, static_argnames=())
def lapjv_single(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """cost [R, C] float32 (R <= C for the valid part), n_valid scalar int.
    Returns col4row [R] int32 (-1 for rows >= n_valid)."""
    R, C = cost.shape
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=1.0)

    def assign_row(cur_row, state):
        u, v, col4row, row4col = state
        s = _dijkstra(lambda i: cost[i], u, v, row4col, col4row, cur_row, R, C)
        minVal, spc, path, SR, SC, sink = (
            s["minVal"], s["spc"], s["path"], s["SR"], s["SC"], s["sink"],
        )
        # dual updates (scipy lsap solve step)
        u = u.at[cur_row].add(minVal)
        spc_at_assigned = spc[jnp.clip(col4row, 0, C - 1)]  # [R]
        others = SR & (jnp.arange(R) != cur_row) & (col4row >= 0)
        u = jnp.where(others, u + minVal - spc_at_assigned, u)
        v = jnp.where(SC, v - (minVal - spc), v)

        # augment along alternating path ending at sink
        def aug_cond(t):
            return t["j"] >= 0

        def aug_body(t):
            j = t["j"]
            i = path[j]
            row4col = t["row4col"].at[j].set(i)
            prev_j = t["col4row"][i]
            col4row = t["col4row"].at[i].set(j)
            return {
                "j": jnp.where(i == cur_row, -1, prev_j),
                "col4row": col4row,
                "row4col": row4col,
            }

        t = jax.lax.while_loop(
            aug_cond, aug_body, {"j": sink, "col4row": col4row, "row4col": row4col}
        )
        return u, v, t["col4row"], t["row4col"]

    init = (
        jnp.zeros((R,)),
        jnp.zeros((C,)),
        jnp.full((R,), -1, jnp.int32),
        jnp.full((C,), -1, jnp.int32),
    )
    # traced upper bound: only the valid rows run (the padded capacity R is
    # usually much larger than the actual GT count — a 5-10x step saving)
    _, _, col4row, _ = jax.lax.fori_loop(
        0, jnp.minimum(n_valid, R).astype(jnp.int32), assign_row, init
    )
    return col4row


def batched_assignment(costs: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """costs [S, B, C(queries), R(gt slots)] — note: query-major as produced by
    the matcher; internally transposed so rows = GT slots. n_valid [B].
    Returns assign [S, B, R]: query index per gt slot (-1 invalid)."""
    S, B, C, R = costs.shape
    ct = jnp.swapaxes(costs, 2, 3)  # [S, B, R, C]
    solve_b = jax.vmap(lapjv_single, in_axes=(0, 0))          # over B
    solve_sb = jax.vmap(solve_b, in_axes=(0, None))           # over S
    return solve_sb(ct, n_valid)


def go_union(assign: jnp.ndarray, gt_valid: jnp.ndarray, num_queries: int):
    """On-device GO-union indices (reference dfine_criterion.py:570-591):
    count (query, gt) pairs across all match sets; per query keep the most
    frequent gt (ties -> smallest gt, matching the reference's stable
    count-desc sort over lexicographically sorted unique pairs).

    assign [S, B, G], gt_valid [B, G] -> (best_g [B, Q], valid_q [B, Q]).
    """
    S, B, G = assign.shape
    valid = (assign >= 0) & gt_valid[None]                     # [S, B, G]
    q = jnp.clip(assign, 0, num_queries - 1)
    counts = jnp.zeros((B, num_queries, G), jnp.int32)
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :, None], assign.shape)
    g_idx = jnp.broadcast_to(jnp.arange(G)[None, None, :], assign.shape)
    counts = counts.at[b_idx, q, g_idx].add(valid.astype(jnp.int32))
    best_g = jnp.argmax(counts, axis=-1).astype(jnp.int32)     # [B, Q]
    valid_q = counts.sum(-1) > 0                               # [B, Q]
    return best_g, valid_q
