"""Vectorized presence-event extraction vs the sequential-replay oracle.

The vectorized version nets same-position churn, so raw event lists can
differ; what must agree is every NET flip per (uid, orientation, position) —
that is what the scorer's scatter+cumsum consumes."""

import numpy as np

from panmap_tpu.index.builder import IndexParams
from panmap_tpu.meta.events import presence_events, presence_events_ref
from panmap_tpu.meta.index import MetaIndexArrays


def _random_consistent_midx(n_nodes=60, n_seeds=25, seed=0):
    """Random tree + random but CONSISTENT deltas: a deletion is only issued
    for a seed currently present on the DFS path (as real indexes guarantee),
    maintained with an explicit replay + undo."""
    rng = np.random.default_rng(seed)
    raw_parent = np.zeros(n_nodes, dtype=np.int64)
    for i in range(1, n_nodes):
        raw_parent[i] = rng.integers(0, i)
    # renumber so node ids are DFS-preorder (subtrees contiguous — the
    # invariant real meta indexes satisfy and both implementations assume)
    raw_children = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        raw_children[raw_parent[i]].append(i)
    new_id = np.zeros(n_nodes, dtype=np.int64)
    stack = [0]
    cnt = 0
    while stack:
        nd = stack.pop()
        new_id[nd] = cnt
        cnt += 1
        stack.extend(reversed(raw_children[nd]))
    parent = np.zeros(n_nodes, dtype=np.uint32)
    for i in range(1, n_nodes):
        parent[new_id[i]] = new_id[raw_parent[i]]
    seed_hash = rng.integers(1, 1 << 60, n_seeds).astype(np.uint64)
    seed_rev = rng.random(n_seeds) < 0.5
    seed_pos = np.arange(n_seeds, dtype=np.int64)

    children = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[parent[i]].append(i)

    node_rows = [[] for _ in range(n_nodes)]
    present = np.zeros(n_seeds, dtype=np.int64)  # multiplicity on the path

    def visit(node):
        ops = []
        for _ in range(int(rng.integers(0, 5))):
            s = int(rng.integers(0, n_seeds))
            if present[s] > 0 and rng.random() < 0.4:
                ops.append((s, True))
                present[s] -= 1
            else:
                ops.append((s, False))
                present[s] += 1
        node_rows[node] = ops
        for c in children[node]:
            visit(c)
        for s, isdel in reversed(ops):  # undo
            present[s] += 1 if isdel else -1

    visit(0)

    delta_seed = []
    delta_is_del = []
    offs = [0]
    for node in range(n_nodes):
        for s, isdel in node_rows[node]:
            delta_seed.append(s)
            delta_is_del.append(isdel)
        offs.append(len(delta_seed))
    return MetaIndexArrays(
        params=IndexParams(), node_ids=[f"n{i}" for i in range(n_nodes)],
        parent_index=parent, seed_hash=seed_hash, seed_rev=seed_rev,
        seed_pos=seed_pos, delta_seed=np.array(delta_seed, dtype=np.int32),
        delta_is_del=np.array(delta_is_del, dtype=bool),
        node_offsets=np.array(offs, dtype=np.int64))


def _net(nodes, deltas, keys=None):
    agg: dict = {}
    for i in range(len(nodes)):
        k = (int(nodes[i]),) + (tuple(int(x[i]) for x in keys) if keys else ())
        agg[k] = agg.get(k, 0) + int(deltas[i])
    return {k: v for k, v in agg.items() if v != 0}


def test_vectorized_events_match_replay_oracle():
    for seed in range(5):
        midx = _random_consistent_midx(seed=seed)
        rng = np.random.default_rng(100 + seed)
        rh = np.unique(rng.choice(midx.seed_hash, 12))
        a = presence_events(midx, rh)
        b = presence_events_ref(midx, rh)
        assert _net(a["ev_node"], a["ev_delta"], (a["ev_uid"], a["ev_rev"])) \
            == _net(b["ev_node"], b["ev_delta"], (b["ev_uid"], b["ev_rev"]))
        assert _net(a["den_node"], a["den_delta"]) == \
            _net(b["den_node"], b["den_delta"])
        assert _net(a["ov_node"], a["ov_delta"]) == \
            _net(b["ov_node"], b["ov_delta"])


def test_vectorized_events_empty_inputs():
    midx = _random_consistent_midx(seed=1)
    out = presence_events(midx, np.empty(0, np.uint64))
    assert len(out["ev_node"]) == 0
    assert len(out["den_node"]) > 0  # denominator flips exist regardless


def test_overlap_coefficients_events_match_dfs_oracle():
    """The vectorized events OC (the production path) must equal the
    sequential delta-DFS oracle on every node."""
    from panmap_tpu.meta.engine import MetaRead, MetaScorer

    midx = _random_consistent_midx(n_nodes=80, n_seeds=30, seed=5)
    rng = np.random.default_rng(9)
    reads = []
    for _ in range(12):
        k = int(rng.integers(2, 8))
        sel = rng.choice(len(midx.seed_hash), size=k, replace=True)
        reads.append(MetaRead(hashes=midx.seed_hash[sel],
                              revs=rng.random(k) < 0.5, n_dup=1))
    sc = MetaScorer(midx, reads)
    oc_fast = sc.overlap_coefficients()
    oc_ref = sc.overlap_coefficients_ref()
    assert set(oc_ref) <= set(oc_fast)
    for n, v in oc_ref.items():
        assert abs(v - oc_fast[n]) < 1e-12, (n, v, oc_fast[n])
