"""Equivalence of the three per-node reduction formulations in
place/metrics.py — the sorted scatter (row_node_sums), the blocked cumsum
(row_node_sums_blocked), and the sparse found-rows CSC path
(row_node_sums_sparse) — against each other and a numpy f64 reference, on
randomized sorted row_node inputs with a small block length to force
block-boundary / spanning-segment / empty-node edge cases (ADVICE r4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from panmap_tpu.place.metrics import (
    make_block_segments,
    make_csc_index,
    query_found_rows,
    row_metric_deltas,
    row_node_sums,
    row_node_sums_blocked,
    row_node_sums_sparse,
)


def _random_case(rng, T, N, NU, empty_frac=0.3):
    """Sorted row_node with empty nodes, segments starting exactly at block
    boundaries (forced by construction for small L), and i16 P/C counts."""
    sizes = rng.integers(0, 7, N)
    sizes[rng.random(N) < empty_frac] = 0
    # rescale to exactly T rows
    while sizes.sum() > T:
        nz = np.flatnonzero(sizes)
        sizes[rng.choice(nz)] -= 1
    if sizes.sum() < T:
        sizes[rng.integers(0, N)] += T - sizes.sum()
    row_node = np.repeat(np.arange(N, dtype=np.int32), sizes)
    assert len(row_node) == T
    row_id = rng.integers(0, NU, T).astype(np.int32)
    P = rng.integers(0, 4, T).astype(np.int16)
    C = rng.integers(0, 4, T).astype(np.int16)
    uid_logc = np.where(rng.random(NU) < 0.25,
                        rng.random(NU) + 0.1, 0.0).astype(np.float32)
    return row_node, row_id, P, C, uid_logc


def _oracle_f64(row_node, row_id, P, C, uid_logc, N):
    lrc = uid_logc[row_id].astype(np.float64)
    found = lrc > 0
    d = row_metric_deltas(np, lrc, P.astype(np.float64),
                          C.astype(np.float64), found)
    out = np.zeros((N, 6))
    for j, col in enumerate(d):
        np.add.at(out[:, j], row_node, col)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("L", [8, 16])
def test_blocked_matches_scatter_and_oracle(seed, L):
    rng = np.random.default_rng(seed)
    T, N, NU = 1000, 37, 400
    row_node, row_id, P, C, uid_logc = _random_case(rng, T, N, NU)
    oracle = _oracle_f64(row_node, row_id, P, C, uid_logc, N)

    lrc = jnp.asarray(uid_logc[row_id])
    found = lrc > 0
    scat = np.asarray(row_node_sums(lrc, jnp.asarray(P), jnp.asarray(C),
                                    found, jnp.asarray(row_node), N))
    blk = make_block_segments(row_node, N, L=L)
    blkd = np.asarray(row_node_sums_blocked(lrc, jnp.asarray(P),
                                            jnp.asarray(C), found, blk, N))
    np.testing.assert_allclose(scat, oracle, atol=1e-4)
    np.testing.assert_allclose(blkd, oracle, atol=1e-4)
    np.testing.assert_allclose(blkd, scat, atol=1e-4)


def test_blocked_handles_trailing_empty_nodes():
    """Pad absorption: last node empty, pad rows join the last real segment."""
    row_node = np.array([0, 0, 2, 2, 2], np.int32)  # nodes 1,3,4 of 5 empty
    N = 5
    P = np.array([0, 1, 2, 0, 1], np.int16)
    C = np.array([1, 0, 2, 3, 1], np.int16)
    lrc_np = np.array([0.5, 0.7, 0.0, 1.1, 0.3], np.float32)
    lrc = jnp.asarray(lrc_np)
    found = lrc > 0
    blk = make_block_segments(row_node, N, L=4)  # pad = 3 rows
    blkd = np.asarray(row_node_sums_blocked(lrc, jnp.asarray(P),
                                            jnp.asarray(C), found, blk, N))
    d = row_metric_deltas(np, lrc_np.astype(np.float64), P.astype(np.float64),
                          C.astype(np.float64), lrc_np > 0)
    oracle = np.zeros((N, 6))
    for j, col in enumerate(d):
        np.add.at(oracle[:, j], row_node, col)
    np.testing.assert_allclose(blkd, oracle, atol=1e-6)
    assert np.all(blkd[[1, 3, 4]] == 0)


@pytest.mark.parametrize("seed", [0, 3])
def test_sparse_matches_oracle(seed):
    """The CSC found-rows path: same accumulators as the full stream, with
    the magnitude column from the static precompute."""
    rng = np.random.default_rng(seed)
    T, N, NU = 1200, 41, 500
    row_node, row_id, P, C, uid_logc = _random_case(rng, T, N, NU)
    oracle = _oracle_f64(row_node, row_id, P, C, uid_logc, N)

    csc = make_csc_index(row_id, P, C, row_node, NU, N)
    uids = np.flatnonzero(uid_logc > 0).astype(np.int32)
    logc = uid_logc[uids]
    F = query_found_rows(csc, uids)
    assert 0 < F < T
    rcap = 1 << int(np.ceil(np.log2(max(F, 2))))
    fcap = 1 << int(np.ceil(np.log2(max(len(uids), 2))))
    rcap = max(rcap, fcap)
    pu = np.full(fcap, NU, np.int32)
    pu[: len(uids)] = uids
    pl = np.zeros(fcap, np.float32)
    pl[: len(uids)] = logc
    got = np.asarray(row_node_sums_sparse(jnp.asarray(pu), jnp.asarray(pl),
                                          csc, N, rcap))
    np.testing.assert_allclose(got, oracle, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_sparse_prefix_acc_matches_two_stage(seed):
    """The production slot-scatter body (sparse_prefix_acc) equals
    row_node_sums_sparse followed by euler_prefix on a random preorder
    tree."""
    from panmap_tpu.place.metrics import euler_prefix, sparse_prefix_acc

    rng = np.random.default_rng(seed)
    T, N, NU = 900, 29, 300
    row_node, row_id, P, C, uid_logc = _random_case(rng, T, N, NU)
    # random preorder tree + euler arrays (same construction as engine_tpu)
    parent = np.zeros(N, np.int64)
    for i in range(1, N):
        parent[i] = rng.integers(0, i)
    # make preorder: relabel via DFS
    children = [[] for _ in range(N)]
    for i in range(1, N):
        children[parent[i]].append(i)
    order, stack = [], [0]
    while stack:
        v = stack.pop()
        order.append(v)
        stack.extend(reversed(children[v]))
    relabel = np.empty(N, np.int64)
    relabel[order] = np.arange(N)
    parent2 = np.zeros(N, np.int64)
    for i in range(1, N):
        parent2[relabel[i]] = relabel[parent[i]]
    row_node = relabel[row_node].astype(np.int32)
    srt = np.argsort(row_node, kind="stable")
    row_node, row_id, P, C = (row_node[srt], row_id[srt], P[srt], C[srt])
    sizes = np.ones(N, np.int64)
    for i in range(N - 1, 0, -1):
        sizes[parent2[i]] += sizes[i]
    depth = np.zeros(N, np.int64)
    for i in range(1, N):
        depth[i] = depth[parent2[i]] + 1
    euler_in = jnp.asarray((2 * np.arange(N) - depth).astype(np.int32))
    euler_out = jnp.asarray(
        (2 * np.arange(N) - depth + 2 * sizes - 1).astype(np.int32))

    csc = make_csc_index(row_id, P, C, row_node, NU, N,
                         parent_index=parent2)
    uids = np.flatnonzero(uid_logc > 0).astype(np.int32)
    fcap = 1 << int(np.ceil(np.log2(max(len(uids), 2))))
    F = query_found_rows(csc, uids)
    rcap = max(1 << int(np.ceil(np.log2(max(F, 2)))), fcap)
    pu = np.full(fcap, NU, np.int32)
    pu[: len(uids)] = uids
    pl = np.zeros(fcap, np.float32)
    pl[: len(uids)] = uid_logc[uids]
    puj, plj = jnp.asarray(pu), jnp.asarray(pl)
    two = np.asarray(euler_prefix(
        row_node_sums_sparse(puj, plj, csc, N, rcap), euler_in, euler_out, N))
    one = np.asarray(sparse_prefix_acc(puj, plj, csc, euler_in, euler_out,
                                       N, rcap))
    np.testing.assert_allclose(one, two, atol=1e-4)


def test_sparse_empty_query():
    rng = np.random.default_rng(7)
    T, N, NU = 300, 11, 100
    row_node, row_id, P, C, _ = _random_case(rng, T, N, NU)
    csc = make_csc_index(row_id, P, C, row_node, NU, N)
    fcap = 16
    pu = np.full(fcap, NU, np.int32)
    pl = np.zeros(fcap, np.float32)
    got = np.asarray(row_node_sums_sparse(jnp.asarray(pu), jnp.asarray(pl),
                                          csc, N, 64))
    # only the static magnitude column survives
    assert np.all(got[:, 1:] == 0)
    oracle = _oracle_f64(row_node, row_id, P, C, np.zeros(NU, np.float32), N)
    np.testing.assert_allclose(got[:, 0], oracle[:, 0], atol=1e-4)


def test_sparse_rcap_exact_fit():
    """rcap == F exactly (no slack slots)."""
    row_node = np.array([0, 0, 1, 1], np.int32)
    row_id = np.array([2, 3, 2, 3], np.int32)
    P = np.array([1, 0, 2, 1], np.int16)
    C = np.array([0, 2, 2, 3], np.int16)
    NU, N = 4, 2
    csc = make_csc_index(row_id, P, C, row_node, NU, N)
    uid_logc = np.array([0, 0, 0.5, 0.9], np.float32)
    uids = np.array([2, 3], np.int32)
    F = query_found_rows(csc, uids)
    assert F == 4
    pu = np.full(4, NU, np.int32)
    pu[:2] = uids
    pl = np.zeros(4, np.float32)
    pl[:2] = uid_logc[uids]
    got = np.asarray(row_node_sums_sparse(jnp.asarray(pu), jnp.asarray(pl),
                                          csc, N, 4))
    oracle = _oracle_f64(row_node, row_id, P, C, uid_logc, N)
    np.testing.assert_allclose(got, oracle, atol=1e-6)
