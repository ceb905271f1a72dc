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
