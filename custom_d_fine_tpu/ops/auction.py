"""EXPERIMENTAL auction-algorithm assignment solver — NOT wired into training.

KNOWN LIMITATION (why this is parked): forward auction's n*eps optimality
bound only holds for square problems; with rectangular costs (queries >>
targets) the duality argument needs the forward-reverse variant
(Bertsekas-Castanon 1992) because prices persist on columns that end up
unassigned. Empirically the current implementation satisfies eps-CS yet lands
on suboptimal assignments. Round-2 item; ops/lapjv.py (exact, on-device JV)
remains the production matcher.

Motivation: the exact JV solver (ops/lapjv.py) is sequential over augmenting
paths — ~57 ms per train step at D-FINE-m shapes (31% of the step). The
forward auction parallelizes across ALL unassigned rows per round (pure
[R, C] vector ops + segment-max reductions), cutting the matcher to ~ms.

Exactness: with epsilon-scaling down to eps_final < quantum / (R + 1) on
costs quantized to `quantum`, the result is an exact optimum of the quantized
problem — i.e. within R*quantum of the float optimum, and identical to JV/scipy
whenever cost gaps exceed the quantum (train costs are O(1); quantum defaults
to 2^-14). Matching on sub-quantum ties is arbitrary, exactly like the
reference's own tie handling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


def _auction_single(cost: jnp.ndarray, n_valid: jnp.ndarray, quantum: float,
                    max_rounds: int):
    """cost [R, C] (rows = targets, R <= C), n_valid valid rows.
    Returns col4row [R] int32 (-1 for invalid rows)."""
    R, C = cost.shape
    # quantize so eps-scaling can terminate at an exact optimum
    c = jnp.round(cost.astype(jnp.float32) / quantum)
    c = jnp.nan_to_num(c, nan=1e6)
    row_valid = (jnp.arange(R) < n_valid)
    # invalid rows never bid
    big = jnp.float32(1e9)
    c = jnp.where(row_valid[:, None], c, big)

    c_range = jnp.maximum(jnp.max(jnp.where(row_valid[:, None], c, -big))
                          - jnp.min(jnp.where(row_valid[:, None], c, big)), 1.0)
    eps0 = jnp.maximum(c_range / 4.0, 1.0)
    eps_final = 1.0 / (R + 1)
    n_phases = jnp.maximum(
        jnp.ceil(jnp.log(eps0 / eps_final) / jnp.log(4.0)).astype(jnp.int32) + 1, 1
    )

    def phase_body(phase_state):
        phase, eps, price = phase_state["phase"], phase_state["eps"], phase_state["price"]
        # reset assignment each phase; prices persist
        col4row = jnp.full((R,), -1, jnp.int32)
        row4col = jnp.full((C,), -1, jnp.int32)

        def round_cond(s):
            unassigned = row_valid & (s["col4row"] < 0)
            return jnp.any(unassigned) & (s["it"] < max_rounds)

        def round_body(s):
            col4row, row4col, price = s["col4row"], s["row4col"], s["price"]
            unassigned = row_valid & (col4row < 0)
            # each unassigned row: best and second-best reduced cost
            v = c + price[None, :]                                    # [R, C]
            j_best = jnp.argmin(v, axis=1)                            # [R]
            v1 = jnp.take_along_axis(v, j_best[:, None], axis=1)[:, 0]
            v_masked = v.at[jnp.arange(R), j_best].set(INF)
            v2 = jnp.min(v_masked, axis=1)
            bid = v2 - v1 + eps                                       # [R] price raise

            # each column accepts the highest-bid unassigned row targeting it
            bid_eff = jnp.where(unassigned, bid, -INF)
            # scatter-max bids per column; tie -> lowest row index (via argmax
            # over combined key)
            col_bid = jnp.full((C,), -INF).at[j_best].max(
                jnp.where(unassigned, bid_eff, -INF), mode="drop"
            )
            won = unassigned & (bid_eff >= col_bid[j_best]) & (col_bid[j_best] > -INF)
            # among winners of the same column keep the smallest row id
            winner_row = jnp.full((C,), R, jnp.int32).at[j_best].min(
                jnp.where(won, jnp.arange(R), R), mode="drop"
            )
            is_winner = won & (winner_row[j_best] == jnp.arange(R))

            # unassign previous owners of taken columns
            taken_col = jnp.where(is_winner, j_best, C)               # C = none
            prev_owner = jnp.where(
                is_winner, row4col[jnp.clip(taken_col, 0, C - 1)], -1
            )
            col4row = jnp.where(
                jnp.isin(jnp.arange(R), jnp.where(prev_owner >= 0, prev_owner, R)),
                -1, col4row,
            )
            # assign winners
            col4row = jnp.where(is_winner, j_best, col4row)
            row4col = row4col.at[taken_col].set(
                jnp.where(is_winner, jnp.arange(R), -1), mode="drop"
            )
            price = price.at[taken_col].add(
                jnp.where(is_winner, bid, 0.0), mode="drop"
            )
            return {"col4row": col4row, "row4col": row4col, "price": price,
                    "it": s["it"] + 1}

        s = jax.lax.while_loop(
            round_cond, round_body,
            {"col4row": col4row, "row4col": row4col, "price": price, "it": 0},
        )
        return {"phase": phase + 1, "eps": jnp.maximum(eps / 4.0, eps_final),
                "price": s["price"], "col4row": s["col4row"]}

    def phases_cond(ps):
        return ps["phase"] < n_phases

    init = {"phase": jnp.int32(0), "eps": eps0,
            "price": jnp.zeros((C,), jnp.float32),
            "col4row": jnp.full((R,), -1, jnp.int32)}
    out = jax.lax.while_loop(phases_cond, phase_body, init)
    return jnp.where(row_valid, out["col4row"], -1)


def batched_assignment_auction(
    costs: jnp.ndarray,    # [S, B, C(queries), R(gt slots)] query-major
    n_valid: jnp.ndarray,  # [B]
    quantum: float = 2.0 ** -14,
    max_rounds: int = 2000,
) -> jnp.ndarray:
    """Same contract as ops.lapjv.batched_assignment."""
    S, B, C, R = costs.shape
    ct = jnp.swapaxes(costs, 2, 3)  # [S, B, R, C]
    solve_b = jax.vmap(partial(_auction_single, quantum=quantum,
                               max_rounds=max_rounds), in_axes=(0, 0))
    solve_sb = jax.vmap(solve_b, in_axes=(0, None))
    return solve_sb(ct, n_valid)
