"""Long-read aligner (map-ont / map-hifi presets): mapping accuracy and
cigar consistency on synthetic error-laden reads."""

import random

import numpy as np

from panmap_tpu.align.longread import (
    LongReadAligner,
    MAP_HIFI,
    MAP_ONT,
    pick_preset,
)


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def _mutate(rng, s, err):
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.4:
            out.append(rng.choice("ACGT"))
        elif r < err * 0.7:
            pass
        elif r < err:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        else:
            out.append(ch)
    return "".join(out)


def test_preset_selection():
    assert pick_preset(800) is MAP_ONT
    assert pick_preset(4999) is MAP_ONT
    assert pick_preset(5000) is MAP_HIFI


def test_ont_reads_map_to_truth_locus():
    rng = random.Random(7)
    ref = "".join(rng.choice("ACGT") for _ in range(20000))
    alner = LongReadAligner(ref, MAP_ONT)
    for trial in range(6):
        start = rng.randint(0, 16000)
        ln = rng.randint(800, 2500)
        read = _mutate(rng, ref[start : start + ln], err=0.08)
        if trial % 2:
            read = _rc(read)
        a = alner.align_read(read)
        assert a.mapped
        assert abs(a.rs - start) < 50
        assert a.rev == bool(trial % 2)
        # cigar spans must match the reported intervals
        mref = sum(l for l, op in a.cigar if op in "MD")
        mq = sum(l for l, op in a.cigar if op in "MI")
        assert mref == a.re - a.rs
        assert mq == a.qe - a.qs


def test_hifi_low_error_high_identity():
    rng = random.Random(11)
    ref = "".join(rng.choice("ACGT") for _ in range(30000))
    alner = LongReadAligner(ref, MAP_HIFI)
    start, ln = 4000, 6000
    read = _mutate(rng, ref[start : start + ln], err=0.01)
    a = alner.align_read(read)
    assert a.mapped and abs(a.rs - start) < 20
    matches = sum(l for l, op in a.cigar if op == "M")
    assert matches / ln > 0.97


def test_garbage_read_unmapped():
    rng = random.Random(3)
    ref = "".join(rng.choice("ACGT") for _ in range(20000))
    alner = LongReadAligner(ref, MAP_ONT)
    junk = "".join(rng.choice("ACGT") for _ in range(1500))
    a = alner.align_read(junk)
    assert not a.mapped


def test_long_gap_tier_spans_big_deletion():
    """A 300bp deletion costs 24+300*1 via the long-gap tier (vs 4+300*2
    single-tier, which would make clipping to one flank score higher): the
    read must align across the deletion as one alignment with a ~300D op."""
    rng = random.Random(11)
    ref = "".join(rng.choice("ACGT") for _ in range(1200))
    read = ref[100:300] + ref[600:800]  # 200bp flanks, 300bp deletion

    la = LongReadAligner(ref, MAP_ONT)
    aln = la.align_read(read)
    assert aln.mapped
    dels = [n for n, op in aln.cigar if op == "D"]
    assert dels and max(dels) == 300
    span = aln.re - aln.rs
    assert span >= 650  # covers both flanks plus the deletion


def test_chain_dp_spans_large_deletion():
    """A read whose genome copy lacks a 2kb segment must chain across the
    deletion (mm2 chain DP; the old per-diagonal-band clustering picked one
    side only) and the banded DP must emit a D run of about that size."""
    rng = random.Random(5)
    ref = "".join(rng.choice("ACGT") for _ in range(12000))
    # read = 2kb left flank + 2kb right flank with a 2000bp deletion between
    read = ref[1000:3000] + ref[5000:7000]
    la = LongReadAligner(ref, MAP_ONT)
    aln = la.align_read(read)
    assert aln.mapped
    dels = sum(ln for ln, op in aln.cigar if op == "D")
    assert 1900 <= dels <= 2100, aln.cigar
    m = sum(ln for ln, op in aln.cigar if op == "M")
    assert m >= 3800
    assert aln.rs <= 1010 and aln.re >= 6990


def test_chain_dp_prefers_colinear_chain_over_bigger_scatter():
    """chain_dp picks the colinear run, not a larger set of scattered
    repeat anchors."""
    from panmap_tpu.align.longread import chain_dp

    # colinear: 10 anchors on one diagonal; scatter: 14 anchors at random
    q = np.concatenate([np.arange(10) * 50, np.arange(14) * 37 + 7])
    r = np.concatenate([np.arange(10) * 50 + 100,
                        (np.arange(14) * 1931 + 13) % 9000])
    score, chain, sub = chain_dp(q, r, 15, 5000)
    d = r[chain] - q[chain]
    assert len(chain) >= 9
    assert (np.abs(d - 100) < 5).sum() >= 9
