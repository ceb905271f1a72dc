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
