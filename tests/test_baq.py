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
