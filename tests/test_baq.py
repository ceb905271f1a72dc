"""BAQ regression: misaligned indel tails produce false SNPs that BAQ
suppresses (validated against a real bcftools oracle: with and without -B the
VCF record sets matched exactly on this scenario)."""

import copy
import random

import numpy as np
import pytest

from panmap_tpu.genotype.caller import PlacedRead, apply_spectrum, pileup_call
from panmap_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def _scene():
    rng = random.Random(42)
    ref = "".join(rng.choice("ACGT") for _ in range(1000))
    placed = []

    def add(name, rs, seq, cigar):
        placed.append(PlacedRead(rs=rs, cigar=cigar, seq=seq,
                                 quals=[35] * len(seq), qs=0, qname=name,
                                 is_paired=False, mapq=60))

    # genome has a 4bp deletion at ref[500:504]; a few reads align WITH it
    for i in range(4):
        st = 440 + i
        mlen = 500 - st
        s = ref[st:500] + ref[504 : 504 + (100 - mlen)]
        add(f"withdel_{i}", st, s, [(mlen, "M"), (4, "D"), (100 - mlen, "M")])
    # many align as pure match: their tails are frame-shifted vs the ref
    for i in range(20):
        st = 430 + i * 3
        s = ref[st:500] + ref[504 : 504 + (100 - (500 - st))]
        add(f"puredel_{i}", st, s, [(100, "M")])
    for i in range(3):
        st = rng.randint(400, 460)
        add(f"clean_{i}", st, ref[st : st + 100], [(100, "M")])
    return ref, placed


def test_baq_suppresses_misalignment_false_positives():
    ref, placed = _scene()
    no_baq = apply_spectrum(pileup_call(ref, copy.deepcopy(placed)), None, 1, 0.0)
    with_baq = apply_spectrum(pileup_call(ref, copy.deepcopy(placed), baq=True),
                              None, 1, 0.0)
    assert len(no_baq) > 40  # massive false-positive pileup without BAQ
    assert len(with_baq) == 0  # fully suppressed (bcftools agrees: 63 -> 0)


def test_baq_leaves_clean_reads_alone():
    rng = random.Random(7)
    ref = "".join(rng.choice("ACGT") for _ in range(600))
    from panmap_tpu.genotype.baq import _codes, baq_realign_read

    read = PlacedRead(rs=100, cigar=[(120, "M")], seq=ref[100:220],
                      quals=[35] * 120, qs=0)
    assert baq_realign_read(read, _codes(ref))
    assert all(q == 35 for q in read.quals)


def test_native_baq_matches_numpy_twin():
    """pt_baq_glocal is the C++ twin of baq_glocal_py (genotype/baq.py): the
    band-offset formulation must agree EXACTLY (state and integer phred) on
    random ref/query pairs incl. ambiguous bases and extreme bands."""
    import numpy as np

    from panmap_tpu.genotype.baq import baq_glocal_py
    from panmap_tpu.native import baq_glocal_native, get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for trial in range(25):
        lr = int(rng.integers(20, 160))
        lq = int(rng.integers(10, 120))
        ref = rng.integers(0, 4, lr).astype(np.uint8)
        if lr > lq:
            off = int(rng.integers(0, lr - lq))
            q = ref[off : off + lq].copy()
        else:
            q = rng.integers(0, 4, lq).astype(np.uint8)
        mut = rng.random(lq) < 0.06
        q[mut] = (q[mut] + rng.integers(1, 4, mut.sum())) % 4
        if trial % 5 == 0:
            q[rng.integers(0, lq)] = 4
        if trial % 7 == 0:
            ref[rng.integers(0, lr)] = 4
        quals = rng.integers(5, 45, lq).astype(np.uint8)
        bw = int(rng.integers(3, 25))
        s_py, q_py = baq_glocal_py(ref, q, quals, bw, 0.001, 0.1)
        s_c, q_c = baq_glocal_native(ref, q, quals, bw, 0.001, 0.1)
        assert np.array_equal(s_py, s_c), trial
        assert np.array_equal(q_py, q_c), trial
