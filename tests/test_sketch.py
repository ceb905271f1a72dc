"""Sketching unit tests, ported from the reference's contract tests
(src/test/test_seeding.cpp) plus direct-recompute oracles for the rolling scan."""

import numpy as np
import pytest

from panmap_tpu.sketch import cpu as sk


def random_dna(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


@pytest.fixture
def rng():
    import random

    return random.Random(1234)


def test_hashseq_determinism_and_canonical(rng):
    for _ in range(50):
        s = random_dna(rng, 21)
        a = sk.hash_seq(s)
        b = sk.hash_seq(s)
        assert a == b
        rc = sk.hash_seq(sk.reverse_complement(s))
        assert min(a) == min(rc)


def test_hashseq_rejects_ambiguous():
    with pytest.raises(ValueError):
        sk.hash_seq("ACGTN")


def test_rolling_syncmers_contract(rng):
    for _ in range(5):
        seq = random_dna(rng, 200)
        for k in (15, 19, 31):
            for s in (6, 8):
                hashes, is_rev, is_sync = sk.rolling_syncmers(seq, k, s, False, 0)
                assert len(hashes) == len(seq) - k + 1
                # non-sentinel entries carry the canonical k-mer hash
                for p in np.flatnonzero(is_sync):
                    f, r = sk.hash_seq(seq[p : p + k])
                    assert int(hashes[p]) == min(f, r)
                    assert bool(is_rev[p]) == (r < f)
                # sentinels at non-syncmer positions
                assert np.all(hashes[~is_sync] == sk.U64_MAX)


def test_syncmer_windows_against_bruteforce(rng):
    """Cross-check the vectorized min-window logic against a direct per-window scan."""
    seq = random_dna(rng, 300)
    k, s, t = 19, 8, 0
    for open_ in (False, True):
        hashes, is_rev, is_sync = sk.rolling_syncmers(seq, k, s, open_, t)
        for p in range(len(seq) - k + 1):
            window = seq[p : p + k]
            smers = [sk.hash_seq(window[j : j + s]) for j in range(k - s + 1)]
            fsm = [f for f, _ in smers]
            rsm = [r for _, r in smers]
            fmin, rmin = min(fsm), min(rsm)
            if open_:
                fwd = fsm[t] == fmin
                rev = rsm[k - s - t] == rmin
            else:
                fwd = fsm[t] == fmin or fsm[k - s - t] == fmin
                rev = rsm[k - s - t] == rmin or rsm[t] == rmin
            f, r = sk.hash_seq(window)
            expect = (fwd or rev) and f != r
            assert bool(is_sync[p]) == expect, f"pos {p}"


def test_syncmers_with_ambiguous_bases(rng):
    seq = list(random_dna(rng, 120))
    seq[40] = "N"
    seq = "".join(seq)
    k, s = 19, 8
    hashes, is_rev, is_sync = sk.rolling_syncmers(seq, k, s, False, 0)
    # every window covering position 40 must be disqualified
    for p in range(max(0, 40 - k + 1), 41):
        if p < len(hashes):
            assert not is_sync[p]
            assert hashes[p] == sk.U64_MAX


def test_reverse_complement():
    assert sk.reverse_complement("ACGT") == "ACGT"
    assert sk.reverse_complement("AAAA") == "TTTT"
    assert sk.reverse_complement("GCGC") == "GCGC"
    assert sk.reverse_complement("A") == "T"
    assert sk.reverse_complement(sk.reverse_complement("ATTGCCA")) == "ATTGCCA"


def test_canonical_sketch_orientation_invariant(rng):
    """A read and its reverse complement yield the same k-min-mer multiset."""
    seq = random_dna(rng, 150)
    k, s, t, l = 19, 8, 0, 3
    a = sk.read_kminmer_counts([seq], k, s, t, l, False)
    b = sk.read_kminmer_counts([sk.reverse_complement(seq)], k, s, t, l, False)
    assert a == b


def test_kminmer_rolling_matches_direct(rng):
    H = np.array([sk.hash_seq(random_dna(rng, 19))[0] for _ in range(30)], dtype=np.uint64)
    k, l = 19, 3
    km, valid = sk.kminmer_hashes(H, k, l)
    for j in range(len(H) - l + 1):
        f = np.uint64(0)
        r = np.uint64(0)
        for w in range(l):
            f ^= sk.rol(H[j + w], k * (l - 1 - w))
            r ^= sk.rol(H[j + l - 1 - w], k * (l - 1 - w))
        assert valid[j] == (f != r)
        if valid[j]:
            assert km[j] == min(int(f), int(r))


def test_hpc_compress():
    assert sk.hpc_compress("") == ""
    assert sk.hpc_compress("AAAA") == "A"
    assert sk.hpc_compress("ACGT") == "ACGT"
    assert sk.hpc_compress("AAACCCGGG") == "ACG"
    comp, mapping = sk.hpc_compress_with_mapping("AAACCCGGGT")
    assert comp == "ACGT"
    assert mapping.tolist() == [0, 3, 6, 9]


def test_quality_filtered_sketch_matches_loop_oracle():
    """Vectorized --min-seed-quality sketch vs the per-position loop it
    replaced: identical counts AND identical dict insertion order (the
    top-fraction mask tie-breaks on it)."""
    import random

    import numpy as np

    from panmap_tpu.place.engine import sketch_reads_quality
    from panmap_tpu.sketch.cpu import kminmer_hashes_oriented, syncmer_list

    def oracle(seqs, quals, k, s, t, l, open_, minq, trim_start, trim_end):
        freq = {}
        for seq, qual in zip(seqs, quals):
            pos, H, rev = syncmer_list(seq, k, s, open_, t)
            if len(H) < l:
                continue
            q = np.frombuffer(qual.encode(), np.uint8).astype(np.float64) - 33
            cq = np.concatenate(([0.0], np.cumsum(q)))
            lo, hi = trim_start, len(seq) - trim_end - k
            passes = np.empty(len(pos), dtype=bool)
            for j, p in enumerate(pos):
                avg = (cq[min(p + k, len(q))] - cq[p]) / k
                passes[j] = lo <= p <= hi and avg >= minq
            if l == 1:
                for h, ok in zip(H.tolist(), passes.tolist()):
                    if ok:
                        freq[h] = freq.get(h, 0) + 1
                continue
            km, valid, _ = kminmer_hashes_oriented(H, k, l, rev)
            win_ok = np.ones(len(km), dtype=bool)
            for j in range(l):
                win_ok &= passes[j : j + len(km)]
            for h in km[valid & win_ok].tolist():
                freq[h] = freq.get(h, 0) + 1
        return freq

    rng = random.Random(19)
    seqs, quals = [], []
    for i in range(80):
        L = rng.randint(40, 180)
        seqs.append("".join(rng.choice("ACGT") for _ in range(L)))
        quals.append("".join(chr(33 + rng.randint(2, 40)) for _ in range(L)))
    seqs += seqs[:10]  # duplicates
    quals += quals[:10]
    for (k, s, t, l, open_) in ((19, 8, 0, 3, False), (15, 8, 2, 1, False)):
        for minq, ts, te in ((20.0, 0, 0), (25.0, 5, 7)):
            got = sketch_reads_quality(seqs, quals, k, s, t, l, open_, minq,
                                       ts, te)
            want = oracle(seqs, quals, k, s, t, l, open_, minq, ts, te)
            assert got == want, (k, l, minq)
            assert list(got) == list(want), "insertion order changed"
