"""Read de-Bruijn graph ordering (meta/rdg.py; reference mgsr.cpp:1344-1488
lowMemory read sort): permutation validity, determinism, component
contiguity, and scoring invariance of the native wrappers under the order."""

import numpy as np
import pytest

from panmap_tpu.meta.rdg import debruijn_read_order


def _csr(reads):
    lens = np.array([len(r) for r in reads], dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    h = (np.concatenate(reads).astype(np.uint64) if len(reads)
         else np.empty(0, np.uint64))
    return off, h


def test_rdg_is_permutation_and_deterministic():
    rng = np.random.default_rng(7)
    for _ in range(20):
        R = int(rng.integers(0, 60))
        reads = [rng.integers(1, 40, rng.integers(0, 12)).astype(np.uint64)
                 for _ in range(R)]
        off, h = _csr(reads)
        p1 = debruijn_read_order(off, h)
        p2 = debruijn_read_order(off, h)
        assert np.array_equal(p1, p2)
        assert sorted(p1.tolist()) == list(range(R))


def test_rdg_components_contiguous():
    """Reads from disjoint seedmer universes must form contiguous runs in
    the output order, largest component first."""
    # component A: 5 reads over hashes 1..10; component B: 2 reads over
    # hashes 100..110; one seedmer-less read
    A = [np.array([1, 2, 3], np.uint64), np.array([3, 4], np.uint64),
         np.array([4, 5, 6], np.uint64), np.array([6, 7], np.uint64),
         np.array([7, 8, 9], np.uint64)]
    B = [np.array([100, 101], np.uint64), np.array([101, 102], np.uint64)]
    reads = [B[0], A[0], np.array([], np.uint64), A[1], B[1], A[2], A[3], A[4]]
    off, h = _csr(reads)
    p = debruijn_read_order(off, h)
    comp = []
    for i in p:
        if len(reads[i]) == 0:
            comp.append("z")
        elif reads[i][0] < 50:
            comp.append("A")
        else:
            comp.append("B")
    s = "".join(comp)
    assert s == "A" * 5 + "B" * 2 + "z", s  # A larger -> first; empty last


def test_rdg_scoring_invariance_native():
    """The native simple scorer must return identical results with the RDG
    permutation on and off (the permutation is internal: fed permuted,
    scattered back)."""
    import os

    from panmap_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    from panmap_tpu.index.builder import IndexParams
    from panmap_tpu.meta.engine import MetaScorer
    from panmap_tpu.meta.index import MetaIndexArrays

    rng = np.random.default_rng(11)
    NN = 12
    parent = np.array([0, 0, 1, 1, 0, 4, 4, 6, 6, 0, 9, 9], np.uint32)
    pool = rng.integers(1, 1 << 40, 60).astype(np.uint64)
    rows = rng.integers(2, 8, NN)
    offs = np.zeros(NN + 1, np.int64)
    offs[1:] = np.cumsum(rows)
    T = int(offs[-1])
    delta_seed = rng.integers(0, len(pool), T).astype(np.int32)
    midx = MetaIndexArrays(
        params=IndexParams(), node_ids=[f"n{i}" for i in range(NN)],
        parent_index=parent, node_offsets=offs,
        delta_seed=delta_seed,
        delta_is_del=(rng.random(T) < 0.3).astype(np.uint8),
        seed_hash=pool, seed_rev=(rng.random(len(pool)) < 0.5).astype(np.uint8),
        seed_pos=np.arange(len(pool), dtype=np.int64),
        seed_end=None, gev_offsets=None)

    class Rd:
        def __init__(self, h, rv):
            self.hashes = h
            self.revs = rv
            self.qbeg = None
            self.qend = None
            self.n_dup = 1

    reads = []
    for _ in range(40):
        n = int(rng.integers(1, 6))
        hs = pool[rng.integers(0, len(pool), n)]
        reads.append(Rd(hs, (rng.random(n) < 0.5)))
    scorer = MetaScorer(midx, reads)
    cands = [0, 3, 7, 11]
    old = os.environ.get("PANMAP_TPU_RDG")
    try:
        os.environ["PANMAP_TPU_RDG"] = "1"
        on = scorer._score_simple_native(cands, False)
        os.environ["PANMAP_TPU_RDG"] = "0"
        offr = scorer._score_simple_native(cands, False)
    finally:
        if old is None:
            os.environ.pop("PANMAP_TPU_RDG", None)
        else:
            os.environ["PANMAP_TPU_RDG"] = old
    assert on is not None and offr is not None
    assert np.array_equal(on[0], offr[0])
    assert np.array_equal(on[1], offr[1])
