"""Cross-check the on-device LAPJV solver + GO union against scipy."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from custom_d_fine_tpu.ops.hungarian import host_go_union, host_solve
from custom_d_fine_tpu.ops.lapjv import batched_assignment, go_union, lapjv_single


def _assignment_cost(cost, col4row, n):
    return sum(cost[g, col4row[g]] for g in range(n))


def test_lapjv_single_matches_scipy_cost():
    rng = np.random.default_rng(0)
    for trial in range(20):
        R, C = rng.integers(1, 12), rng.integers(12, 40)
        n = int(rng.integers(1, R + 1))
        cost = rng.normal(size=(R, C)).astype(np.float32) * 10
        got = np.asarray(lapjv_single(jnp.asarray(cost), jnp.int32(n)))
        # rows >= n unassigned
        assert (got[n:] == -1).all()
        # assigned queries distinct
        assert len(set(got[:n].tolist())) == n
        rows, cols = linear_sum_assignment(cost[:n])
        want_cost = cost[:n][rows, cols].sum()
        got_cost = _assignment_cost(cost, got, n)
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-5), trial


def test_batched_assignment_matches_host():
    rng = np.random.default_rng(1)
    S, B, Q, G = 3, 4, 25, 7
    costs = rng.normal(size=(S, B, Q, G)).astype(np.float32) * 5
    n_valid = np.array([0, 3, 7, 5], np.int32)
    # mask invalid cols like the matcher does
    for b in range(B):
        costs[:, b, :, n_valid[b]:] = 1e6
    got = np.asarray(batched_assignment(jnp.asarray(costs), jnp.asarray(n_valid)))
    want = host_solve(costs, n_valid)
    # compare total assignment costs (ties may differ, cost must match)
    for s in range(S):
        for b in range(B):
            n = n_valid[b]
            if n == 0:
                assert (got[s, b] == -1).all()
                continue
            gc = sum(costs[s, b, got[s, b, g], g] for g in range(n))
            wc = sum(costs[s, b, want[s, b, g], g] for g in range(n))
            np.testing.assert_allclose(gc, wc, rtol=1e-5)


def test_go_union_matches_host():
    rng = np.random.default_rng(2)
    S, B, G, Q = 4, 3, 6, 20
    n_valid = np.array([6, 0, 4], np.int32)
    assign = np.full((S, B, G), -1, np.int32)
    for s in range(S):
        for b in range(B):
            n = n_valid[b]
            if n:
                assign[s, b, :n] = rng.choice(Q, size=n, replace=False)
    gt_valid = np.zeros((B, G), bool)
    for b in range(B):
        gt_valid[b, : n_valid[b]] = True

    got_g, got_v = go_union(jnp.asarray(assign), jnp.asarray(gt_valid), Q)
    want_g, want_v = host_go_union(assign, n_valid, Q)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)
    np.testing.assert_array_equal(np.asarray(got_g)[want_v], want_g[want_v])


def test_native_cpp_lapjv_matches_scipy():
    from custom_d_fine_tpu.ops import lapjv_native

    if not lapjv_native.available():
        import pytest

        pytest.skip("native lapjv build unavailable")
    rng = np.random.default_rng(3)
    N, R, C = 6, 9, 30
    costs = rng.normal(size=(N, R, C)).astype(np.float32) * 7
    n_valid = rng.integers(0, R + 1, N).astype(np.int32)
    got = lapjv_native.lapjv_batch(costs, n_valid)
    for p in range(N):
        n = int(n_valid[p])
        assert (got[p, n:] == -1).all()
        if n == 0:
            continue
        assert len(set(got[p, :n].tolist())) == n
        rows, cols = linear_sum_assignment(costs[p, :n])
        want = costs[p, :n][rows, cols].sum()
        have = sum(costs[p, g, got[p, g]] for g in range(n))
        np.testing.assert_allclose(have, want, rtol=1e-5)
