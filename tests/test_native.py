"""Native C++ host kernels vs their numpy twins (bit-exact contracts)."""

import random

import numpy as np
import pytest

from panmap_tpu.native import (
    encode_reads_native,
    get_lib,
    rolling_syncmers_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _numpy_rolling(b, k, s, t, open_):
    # call the pure-numpy path by going through the module internals
    from panmap_tpu.sketch import cpu

    h = cpu.CHASH[b]
    hc = cpu.CHASH_COMP[b]
    n = len(b)
    m = n - k + 1
    Fk, Rk = cpu._window_hashes(h, hc, k)
    Fs, Rs = cpu._window_hashes(h, hc, s)
    w = k - s + 1
    Fmin = cpu._sliding_min(Fs, w)
    Rmin = cpu._sliding_min(Rs, w)
    if open_:
        fwd = Fs[t : t + m] == Fmin
        rev = Rs[k - s - t : k - s - t + m] == Rmin
    else:
        fwd = (Fs[t : t + m] == Fmin) | (Fs[k - s - t : k - s - t + m] == Fmin)
        rev = (Rs[k - s - t : k - s - t + m] == Rmin) | (Rs[t : t + m] == Rmin)
    bad = (h == 0).astype(np.int32)
    cbad = np.concatenate(([0], np.cumsum(bad)))
    amb = (cbad[k:] - cbad[:-k]) > 0
    is_sync = (fwd | rev) & ~amb & (Fk != Rk)
    is_rev = (Rk < Fk) & is_sync
    hashes = np.where(is_sync, np.minimum(Fk, Rk), cpu.U64_MAX)
    return hashes, is_rev, is_sync


def test_rolling_syncmers_parity():
    rng = random.Random(11)
    for trial in range(25):
        n = rng.randint(25, 2500)
        alpha = "ACGTN" if trial % 4 == 0 else "ACGT"
        seq = "".join(rng.choice(alpha) for _ in range(n))
        b = np.frombuffer(seq.encode(), dtype=np.uint8)
        for (k, s, t, op) in [(19, 8, 0, False), (19, 8, 0, True),
                              (15, 7, 2, False)]:
            if n < k:
                continue
            ref = _numpy_rolling(b, k, s, t, op)
            out = rolling_syncmers_native(b, k, s, t, op)
            for a, c in zip(ref, out):
                assert np.array_equal(a, c)


def test_encode_reads_parity():
    rng = random.Random(5)
    seqs = ["".join(rng.choice("ACGTNacgt") for _ in range(rng.randint(5, 120)))
            for _ in range(200)]
    out, lens = encode_reads_native(seqs, 128)
    ENC = np.full(256, 4, np.uint8)
    for i, c in enumerate("ACGT"):
        ENC[ord(c)] = i
        ENC[ord(c.lower())] = i
    for i, s in enumerate(seqs):
        a = ENC[np.frombuffer(s.encode(), np.uint8)]
        assert np.array_equal(out[i, : len(a)], a)
        assert (out[i, len(a):] == 4).all()
        assert lens[i] == len(s)


def test_count_delta_native_matches_numpy():
    from panmap_tpu.native import count_delta_native

    rng = np.random.default_rng(5)
    for trial in range(50):
        pool = np.unique(rng.integers(1, 200, 80).astype(np.uint64))
        ph = np.sort(rng.choice(pool, int(rng.integers(0, 40)),
                                replace=False))
        ch = np.sort(rng.choice(pool, int(rng.integers(0, 40)),
                                replace=False))
        pc = rng.integers(1, 9, len(ph)).astype(np.int64)
        cc = rng.integers(1, 9, len(ch)).astype(np.int64)
        nat = count_delta_native(ph, pc, ch, cc)
        if nat is None:
            import pytest

            pytest.skip("native kernel unavailable")
        allh = np.union1d(ph, ch)
        pcnt = np.zeros(len(allh), np.int64)
        if len(ph):
            ii = np.searchsorted(ph, allh)
            ok = (ii < len(ph)) & (ph[np.minimum(ii, len(ph) - 1)] == allh)
            pcnt[ok] = pc[ii[ok]]
        ccnt = np.zeros(len(allh), np.int64)
        if len(ch):
            ii = np.searchsorted(ch, allh)
            ok = (ii < len(ch)) & (ch[np.minimum(ii, len(ch) - 1)] == allh)
            ccnt[ok] = cc[ii[ok]]
        diff = pcnt != ccnt
        assert np.array_equal(nat[0], allh[diff]), trial
        assert np.array_equal(nat[1], pcnt[diff].astype(np.int16)), trial
        assert np.array_equal(nat[2], ccnt[diff].astype(np.int16)), trial


def test_incremental_counts_mode_mammoth():
    """Incremental-counts builder == full-table oracle on the bundled
    mammoth panman (fast-suite cousin of the rsv_4K e2e; covers block
    mutations, gaps, and deep backtracking on a real tree)."""
    import os

    from panmap_tpu.index.builder import IndexParams, build_index
    from panmap_tpu.io.panman import load_panman

    tree = load_panman(
        "/root/reference/examples/data/panmans/extended_mammoth.panman")
    old = os.environ.get("PANMAP_TPU_INCR")
    try:
        os.environ["PANMAP_TPU_INCR"] = "0"
        a = build_index(tree, IndexParams(), workers=1)
        os.environ["PANMAP_TPU_INCR"] = "1"
        b = build_index(tree, IndexParams(), workers=1)
        # the PARALLEL counts-mode path (chunked-DFS ranges + per-worker
        # running table) must also match
        b4 = build_index(tree, IndexParams(), workers=4)
        assert np.array_equal(a.seed_hashes, b4.seed_hashes)
        assert np.array_equal(a.parent_counts, b4.parent_counts)
        assert np.array_equal(a.child_counts, b4.child_counts)
        assert np.array_equal(a.node_offsets, b4.node_offsets)
        # HPC + open-syncmer + extent-guard variants too
        for kw in (dict(hpc=True), dict(open=True, flank_mask_bp=0,
                                        extent_guard=True), dict(l=1)):
            os.environ["PANMAP_TPU_INCR"] = "0"
            x = build_index(tree, IndexParams(**kw), workers=1)
            os.environ["PANMAP_TPU_INCR"] = "1"
            y = build_index(tree, IndexParams(**kw), workers=1)
            assert np.array_equal(x.seed_hashes, y.seed_hashes), kw
            assert np.array_equal(x.parent_counts, y.parent_counts), kw
            assert np.array_equal(x.child_counts, y.child_counts), kw
            assert np.array_equal(x.node_offsets, y.node_offsets), kw
    finally:
        if old is None:
            os.environ.pop("PANMAP_TPU_INCR", None)
        else:
            os.environ["PANMAP_TPU_INCR"] = old
    assert np.array_equal(a.seed_hashes, b.seed_hashes)
    assert np.array_equal(a.parent_counts, b.parent_counts)
    assert np.array_equal(a.child_counts, b.child_counts)
    assert np.array_equal(a.node_offsets, b.node_offsets)


def test_incremental_meta_mode_mammoth():
    """Incremental positioned (meta) builder == full-rebuild oracle on the
    mammoth panman, across param variants."""
    import os

    from panmap_tpu.index.builder import IndexParams
    from panmap_tpu.io.panman import load_panman
    from panmap_tpu.meta.index import build_meta_index

    tree = load_panman(
        "/root/reference/examples/data/panmans/extended_mammoth.panman")
    fields = ("node_offsets", "delta_seed", "delta_is_del", "seed_hash",
              "seed_rev", "seed_pos", "seed_end", "gev_offsets", "gev_pos",
              "gev_nongap", "bev_offsets", "bev_block", "bev_code")
    old = os.environ.get("PANMAP_TPU_INCR")
    try:
        for kw in (dict(), dict(hpc=True), dict(l=1),
                   dict(open=True, flank_mask_bp=0)):
            os.environ["PANMAP_TPU_INCR"] = "0"
            a = build_meta_index(tree, IndexParams(**kw), workers=1)
            os.environ["PANMAP_TPU_INCR"] = "1"
            b = build_meta_index(tree, IndexParams(**kw), workers=1)
            b4 = build_meta_index(tree, IndexParams(**kw), workers=4)
            for f in fields:
                x = getattr(a, f, None)
                if x is None:
                    continue
                assert np.array_equal(np.asarray(x),
                                      np.asarray(getattr(b, f))), (kw, f)
                assert np.array_equal(np.asarray(x),
                                      np.asarray(getattr(b4, f))), (kw, f)
    finally:
        if old is None:
            os.environ.pop("PANMAP_TPU_INCR", None)
        else:
            os.environ["PANMAP_TPU_INCR"] = old


def test_incr_count_delta_native_matches_python():
    """pt_incr_count_delta (change sites + affected-window k-min-mer count
    netting in C++) must agree with the python formulation on randomized
    parent/child syncmer arrays, including l=1, pure insertions/deletions at
    boundaries, and substitution-style hash changes."""
    from panmap_tpu.native import incr_count_delta_native
    from panmap_tpu.index.builder import (
        _affected_window_counts, _change_sites)

    if incr_count_delta_native(
            np.empty(0, np.int64), np.empty(0, np.uint64),
            np.empty(0, np.uint8), np.empty(0, np.uint8),
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.uint64), np.empty(0, np.uint8), 19, 3) is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    for case in range(60):
        k = int(rng.choice([15, 19, 31]))
        l = int(rng.choice([1, 2, 3]))
        n = int(rng.integers(l, 60))
        p_pos = np.sort(rng.choice(np.arange(500, dtype=np.int64), n,
                                   replace=False))
        p_hash = rng.integers(1, 1 << 62, n).astype(np.uint64)
        p_rev = rng.integers(0, 2, n).astype(bool)
        # child edit: drop a few, add a few (new positions), change a few
        keep = rng.random(n) > 0.15
        changed = np.flatnonzero(keep & (rng.random(n) < 0.2))
        navg = int(rng.integers(0, 5))
        free = np.setdiff1d(np.arange(500, dtype=np.int64), p_pos)
        add_new = np.sort(rng.choice(free, navg, replace=False)) \
            if navg else np.empty(0, np.int64)
        # changed positions re-add with a new hash (the merge drops + adds)
        keep2 = keep.copy()
        keep2[changed] = False
        add_pos = np.sort(np.concatenate([add_new, p_pos[changed]]))
        add_hash = rng.integers(1, 1 << 62, len(add_pos)).astype(np.uint64)
        add_rev = rng.integers(0, 2, len(add_pos)).astype(bool)
        c_pos = np.concatenate([p_pos[keep2], add_pos])
        c_hash = np.concatenate([p_hash[keep2], add_hash])
        c_rev = np.concatenate([p_rev[keep2], add_rev])
        order = np.argsort(c_pos, kind="stable")
        c_pos, c_hash, c_rev = c_pos[order], c_hash[order], c_rev[order]

        dropped, added_idx, p_bridge, c_bridge = _change_sites(
            p_pos, keep2, add_pos, c_pos)
        old = _affected_window_counts(p_pos, p_hash, p_rev, dropped,
                                      p_bridge, k, l)
        new = _affected_window_counts(c_pos, c_hash, c_rev, added_idx,
                                      c_bridge, k, l)
        net = dict(new)
        for h, c in old.items():
            net[h] = net.get(h, 0) - c
        want = sorted((h, d) for h, d in net.items() if d != 0)

        hh, dd = incr_count_delta_native(
            p_pos, p_hash, p_rev, keep2, add_pos, c_pos, c_hash, c_rev, k, l)
        got = list(zip(hh.tolist(), dd.tolist()))
        assert got == want, (case, k, l, got[:5], want[:5])
