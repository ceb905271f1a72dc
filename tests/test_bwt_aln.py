"""True BWT bwa-aln backend (align/bwt.py): FM-index correctness, the
bounded-difference search semantics, and the damage x divergence
concordance study against the minimizer backend (the VERDICT item-9
fidelity study — the BWT search IS the reference algorithm, so concordance
against it quantifies the old behavioral substitute)."""

import numpy as np
import pytest

from panmap_tpu.align.adna import AdnaAligner, bwa_cal_maxdiff
from panmap_tpu.align.bwt import BwtAligner, FmIndex, cal_width, match_gap

BASES = "ACGT"


def _rand_ref(rng, n):
    return "".join(rng.choice(list(BASES), n))


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_fm_index_exact_search_finds_all_occurrences():
    rng = np.random.default_rng(1)
    ref = _rand_ref(rng, 4000) + _rand_ref(rng, 50) * 3  # repeated tail
    fm = FmIndex(np.array([BASES.find(c) for c in ref], dtype=np.int64))
    pat = ref[4000:4030]
    codes = np.array([BASES.find(c) for c in pat], dtype=np.int64)
    k, l = fm.full
    for c in codes[::-1]:
        k, l = fm.extend(k, l, int(c))
    hits = sorted(int(fm.sa[i]) for i in range(k, l + 1))
    expect = sorted(i for i in range(len(ref) - 29)
                    if ref[i : i + 30] == pat)
    assert hits == expect and len(hits) == 3


def test_cal_width_lower_bounds():
    """D-array: a pattern with one foreign block needs >= 1 difference."""
    rng = np.random.default_rng(2)
    ref = _rand_ref(rng, 3000)
    codes = np.array([BASES.find(c) for c in ref], dtype=np.int64)
    fm_rev = FmIndex(codes[::-1].copy())
    pat = list(ref[500:560])
    pat[30] = "A" if pat[30] != "A" else "C"
    pc = np.array([BASES.find(c) for c in "".join(pat)], dtype=np.int64)
    bid, _w = cal_width(fm_rev, pc)
    assert bid[-1] >= 1  # the full pattern provably needs a difference
    assert bid[25] == 0  # the clean prefix needs none


def test_bwt_alignments_exact_mm_indel_strand():
    rng = np.random.default_rng(3)
    ref = _rand_ref(rng, 12000)
    B = BwtAligner(ref)

    a = B.align_read(ref[5000:5080])
    assert (a.mapped, a.rs, a.rev, a.nm, a.mapq) == (True, 5000, False, 0, 37)

    r = list(ref[7000:7080])
    r[10] = "A" if r[10] != "A" else "C"
    r[50] = "A" if r[50] != "A" else "C"
    a2 = B.align_read(_rc("".join(r)))
    assert (a2.mapped, a2.rs, a2.rev, a2.nm) == (True, 7000, True, 2)

    a3 = B.align_read(ref[9000:9040] + ref[9042:9082])  # 2bp deletion
    assert (a3.mapped, a3.rs, a3.re) == (True, 9000, 9082)
    assert a3.cigar == [(40, "M"), (2, "D"), (40, "M")]
    assert a3.nm == 2

    a4 = B.align_read(ref[11000:11040] + "G" + ref[11040:11079])  # 1bp ins
    assert (a4.mapped, a4.rs) == (True, 11000)
    assert sum(ln for ln, op in a4.cigar if op == "I") == 1


def test_bwt_repeat_mapq_zero():
    """A read from an exact repeat has c1 > 1 -> mapq 0 (bwa_approx_mapQ)."""
    rng = np.random.default_rng(4)
    unit = _rand_ref(rng, 300)
    ref = _rand_ref(rng, 2000) + unit + _rand_ref(rng, 800) + unit \
        + _rand_ref(rng, 1000)
    B = BwtAligner(ref)
    a = B.align_read(unit[100:180])
    assert a.mapped and a.mapq == 0


def test_bwt_maxdiff_gate():
    """More differences than bwa_cal_maxdiff -> unmapped (whole-read
    acceptance, no soft-clip rescue — bwa aln's contract)."""
    rng = np.random.default_rng(5)
    ref = _rand_ref(rng, 8000)
    B = BwtAligner(ref)
    L = 70
    md = bwa_cal_maxdiff(L, thres=0.01)
    r = list(ref[3000 : 3000 + L])
    step = L // (md + 3)
    for j in range(0, (md + 2) * step, step):
        r[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[r[j]]
    a = B.align_read("".join(r))
    assert not a.mapped


def test_match_gap_finds_all_equal_hits():
    """c1 counts the SA-interval mass of best-score hits across copies."""
    rng = np.random.default_rng(6)
    unit = _rand_ref(rng, 120)
    ref = unit + _rand_ref(rng, 500) + unit + _rand_ref(rng, 500) + unit
    codes = np.array([BASES.find(c) for c in ref], dtype=np.int64)
    fm = FmIndex(codes)
    fm_rev = FmIndex(codes[::-1].copy())
    pat = np.array([BASES.find(c) for c in unit[20:90]], dtype=np.int64)
    bid, wid = cal_width(fm_rev, pat)
    hits, c1, _c2, _ = match_gap(fm, pat, bid, wid, 4)
    assert c1 == 3
    positions = sorted(int(fm.sa[h.k + i])
                       for h in hits if h.score == hits[0].score
                       for i in range(h.l - h.k + 1))
    assert positions == [20, 640, 1260]


@pytest.mark.parametrize("damage,divergence", [(0.0, 0.0), (0.3, 0.01),
                                               (0.5, 0.02)])
def test_concordance_bwt_vs_minimizer_backend(damage, divergence):
    """Damage x divergence concordance grid (the fidelity study): the true
    BWT search vs the dense-minimizer behavioral backend.  The BWT backend
    is the reference algorithm; the study quantifies the substitute's
    agreement and asserts the BWT side recovers essentially everything."""
    rng = np.random.default_rng(int(damage * 100) + int(divergence * 1000))
    ref = _rand_ref(rng, 16000)
    B = BwtAligner(ref)
    M = AdnaAligner(ref)
    n = 120
    L = 70
    n_bwt = n_min = n_same_pos = n_both = 0
    for i in range(n):
        p = int(rng.integers(0, len(ref) - L))
        r = list(ref[p : p + L])
        for j in range(L):  # divergence: uniform substitutions
            if rng.random() < divergence:
                r[j] = BASES[(BASES.find(r[j]) + 1 + int(rng.integers(3)))
                             % 4]
        for j in range(6):  # aDNA damage at read ends
            if r[j] == "C" and rng.random() < damage:
                r[j] = "T"
            if r[-1 - j] == "G" and rng.random() < damage:
                r[-1 - j] = "A"
        read = "".join(r)
        if rng.random() < 0.5:
            read = _rc(read)
        a = B.align_read(read)
        b = M.align_read(read)
        n_bwt += a.mapped
        n_min += b.mapped
        if a.mapped and b.mapped:
            n_both += 1
            n_same_pos += (a.rs == b.rs and a.rev == b.rev)
    # the true algorithm recovers (essentially) everything; at the harshest
    # cell a few reads legitimately exceed bwa_cal_maxdiff (bwa drops them
    # too — whole-read acceptance)
    floor = n - 2 if damage < 0.5 else n - 8
    assert n_bwt >= floor, (damage, divergence, n_bwt)
    # concordance where both map: positions must agree near-always
    if n_both:
        assert n_same_pos / n_both >= 0.97, (damage, divergence,
                                             n_same_pos, n_both)


def test_bwt_gapped_unique_hit_mapq37():
    """bwa_approx_mapQ saturates at 25 only when MISMATCHES hit max_diff
    (bwase.c: p->n_mm == mm) — a unique gapped best hit whose total diffs
    reach max_diff but with n_mm < max_diff still gets mapq 37."""
    rng = np.random.default_rng(8)
    ref = _rand_ref(rng, 9000)
    B = BwtAligner(ref)
    L = 70
    md = bwa_cal_maxdiff(L, thres=0.01)
    assert md >= 2
    # deletion of length md: 1 open + (md-1) extensions = md total diffs,
    # zero mismatches
    p = 4000
    read = ref[p : p + 30] + ref[p + 30 + md : p + L + md]
    a = B.align_read(read)
    assert a.mapped and a.rs == p
    assert a.nm == md and a.mapq == 37, (md, a.nm, a.mapq)


def test_native_bwt_matches_python():
    """pt_bwt_aln (threaded C++ best-first search) must reproduce the python
    search exactly: mapped set, strand, position, diff counts, score, mapq,
    and CIGARs — across exact/mismatch/indel/strand/ambiguous cases."""
    from panmap_tpu.native import get_lib

    if get_lib() is None or not hasattr(get_lib(), "pt_bwt_aln"):
        pytest.skip("native bwt core unavailable")
    rng = np.random.default_rng(97)
    ref = _rand_ref(rng, 12000)
    B = BwtAligner(ref)
    reads = []
    for _ in range(160):
        L = int(rng.integers(36, 90))
        p = int(rng.integers(0, len(ref) - L))
        r = list(ref[p : p + L])
        mode = rng.integers(0, 6)
        if mode == 1:  # mismatches
            for _ in range(int(rng.integers(1, 3))):
                j = int(rng.integers(0, L))
                r[j] = BASES[(BASES.find(r[j]) + 1) % 4]
        elif mode == 2:  # deletion from read
            j = int(rng.integers(10, L - 10))
            del r[j]
        elif mode == 3:  # insertion into read
            j = int(rng.integers(10, L - 10))
            r.insert(j, BASES[int(rng.integers(4))])
        elif mode == 4:  # ambiguous base
            r[int(rng.integers(0, L))] = "N"
        read = "".join(r)
        if rng.random() < 0.5:
            read = _rc(read)
        reads.append(read)
    native = B._align_batch_native(reads)
    assert native is not None
    for i, read in enumerate(reads):
        py = B.align_read(read)
        na = native[i]
        assert na.mapped == py.mapped, (i, read)
        if not py.mapped:
            continue
        assert (na.rev, na.rs, na.re, na.cigar, na.nm, na.score, na.mapq) \
            == (py.rev, py.rs, py.re, py.cigar, py.nm, py.score, py.mapq), \
            (i, read)


def test_envelope_fallback_is_loud():
    """Beyond the search envelope the minimizer substitute must be announced
    via the log callback, never silent (VERDICT r3 weak #4)."""
    from panmap_tpu.align import bwt as bwt_mod
    from panmap_tpu.align.bwt import pick_adna_aligner

    msgs = []
    rng = np.random.default_rng(3)
    small = _rand_ref(rng, 2000)
    _, backend = pick_adna_aligner(small, 100, log=msgs.append)
    assert backend == "bwt" and not msgs
    # force the beyond-envelope branch without building a 64 Mb reference
    old = (bwt_mod.BWT_MAX_REF_NATIVE, bwt_mod.BWT_MAX_REF)
    try:
        bwt_mod.BWT_MAX_REF_NATIVE = 1000
        bwt_mod.BWT_MAX_REF = 1000
        _, backend = pick_adna_aligner(small, 100, log=msgs.append)
    finally:
        bwt_mod.BWT_MAX_REF_NATIVE, bwt_mod.BWT_MAX_REF = old
    assert backend == "minimizer"
    assert msgs and "WARNING" in msgs[0] and "DIFFERENT algorithm" in msgs[0]


def test_native_bwt_long_reads_match_python():
    """Regression (round-4 review): the per-score stack array must size
    with bwa_cal_maxdiff — long reads (~2 kb, max_diff ~55) push scores far
    above the short-read ceiling and must not be silently dropped."""
    from panmap_tpu.native import get_lib

    if get_lib() is None or not hasattr(get_lib(), "pt_bwt_aln"):
        pytest.skip("native bwt core unavailable")
    rng = np.random.default_rng(41)
    ref = _rand_ref(rng, 40000)
    B = BwtAligner(ref)
    reads = []
    for t in range(6):
        L = 2000
        p = int(rng.integers(0, len(ref) - L))
        r = list(ref[p : p + L])
        for _ in range(t * 8):  # 0..40 mismatches (max_diff(2000) ~ 55)
            j = int(rng.integers(0, L))
            r[j] = BASES[(BASES.find(r[j]) + 1) % 4]
        reads.append("".join(r))
    native = B._align_batch_native(reads)
    assert native is not None
    for i, read in enumerate(reads):
        py = B.align_read(read)
        na = native[i]
        assert na.mapped == py.mapped, i
        if py.mapped:
            assert (na.rev, na.rs, na.re, na.nm, na.score, na.mapq) \
                == (py.rev, py.rs, py.re, py.nm, py.score, py.mapq), i
