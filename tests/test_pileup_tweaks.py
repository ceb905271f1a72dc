"""Vectorized mate-overlap quality tweak must match the legacy per-pair oracle
(_apply_overlap_tweaks, the direct transcription of bcftools tweak_overlap_quality
semantics used by pileup_call before vectorization)."""

import copy
import random

import numpy as np

from panmap_tpu.genotype.caller import (
    PlacedRead,
    _apply_overlap_tweaks,
    _apply_overlap_tweaks_flat,
)

BASES = "ACGT"


def _mk_reads(rng, n_pairs, ref_len):
    reads = []
    for p in range(n_pairs):
        name = f"pair{p}"
        rs1 = rng.randrange(0, ref_len - 120)
        rs2 = rs1 + rng.randrange(-30, 80)  # often overlapping, sometimes not
        rs2 = max(0, min(rs2, ref_len - 120))
        for rs in (rs1, rs2):
            L = rng.randrange(80, 120)
            # cigars with indels sometimes
            if rng.random() < 0.3:
                m1 = L // 2
                cig = [(m1, "M"), (rng.randrange(1, 4), "D"), (L - m1, "M")]
            elif rng.random() < 0.3:
                m1 = L // 2
                ins = rng.randrange(1, 4)
                cig = [(m1, "M"), (ins, "I"), (L - m1 - ins, "M")]
            else:
                cig = [(L, "M")]
            seq = "".join(rng.choice(BASES) for _ in range(L + 8))
            quals = [rng.randrange(2, 60) for _ in range(L + 8)]
            reads.append(PlacedRead(
                rs=rs, cigar=cig, seq=seq, quals=quals, qs=rng.randrange(0, 4),
                qname=name, is_proper=rng.random() < 0.9, is_paired=True,
                mapq=60, rev=bool(rng.getrandbits(1))))
    # a few unpaired reads and a triplicate name
    for j in range(3):
        L = 100
        reads.append(PlacedRead(
            rs=rng.randrange(0, ref_len - L), cigar=[(L, "M")],
            seq="".join(rng.choice(BASES) for _ in range(L)),
            quals=[rng.randrange(2, 60) for _ in range(L)], qs=0,
            qname="pair0" if j == 0 else f"solo{j}", is_proper=True,
            is_paired=(j == 0), mapq=60, rev=False))
    return reads


def _flat_arrays(kept, n):
    seg_p0, seg_q0, seg_len, seg_rid = [], [], [], []
    for rid, r in enumerate(kept):
        rpos, qpos = r.rs, r.qs
        for ln, op in r.cigar:
            if op in ("M", "=", "X"):
                seg_p0.append(rpos)
                seg_q0.append(qpos)
                seg_len.append(ln)
                seg_rid.append(rid)
                rpos += ln
                qpos += ln
            elif op in ("I", "S"):
                qpos += ln
            elif op in ("D", "N"):
                rpos += ln
    sl = np.asarray(seg_len, dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(sl)))
    rel = np.arange(csum[-1]) - np.repeat(csum[:-1], sl)
    flat_p = np.repeat(np.asarray(seg_p0, dtype=np.int64), sl) + rel
    flat_qi = np.repeat(np.asarray(seg_q0, dtype=np.int64), sl) + rel
    flat_rid = np.repeat(np.asarray(seg_rid, dtype=np.int64), sl)
    in_ref = (flat_p >= 0) & (flat_p < n)
    return flat_p[in_ref], flat_qi[in_ref], flat_rid[in_ref]


def test_flat_tweaks_match_legacy():
    rng = random.Random(7)
    n = 1000
    for trial in range(20):
        kept = _mk_reads(rng, n_pairs=12, ref_len=n)
        legacy = copy.deepcopy(kept)
        _apply_overlap_tweaks(legacy)
        q_legacy = np.concatenate(
            [np.asarray(r.quals, dtype=np.int64) for r in legacy])

        flat_p, flat_qi, flat_rid = _flat_arrays(kept, n)
        rlens = np.array([len(r.seq) for r in kept], dtype=np.int64)
        roffs = np.concatenate(([0], np.cumsum(rlens)))
        Qcat = np.concatenate(
            [np.asarray(r.quals, dtype=np.int64) for r in kept])
        Scat = np.frombuffer("".join(r.seq for r in kept).encode(), np.uint8)
        aqi = roffs[flat_rid] + flat_qi
        _apply_overlap_tweaks_flat(kept, flat_p, aqi, flat_rid, Qcat, Scat, n)

        assert np.array_equal(Qcat, q_legacy), f"trial {trial} diverged"


def test_cal_arrays_matches_scalar():
    """Vectorized errmod (cal_arrays) must be float-exact vs the scalar walk."""
    from panmap_tpu.genotype.caller import ErrMod

    rng = random.Random(3)
    em = ErrMod()
    em2 = ErrMod()
    for trial in range(200):
        n = rng.choice([1, 2, 3, 7, 40, 200, 255, 300])
        entries = [(rng.randrange(4, 64), rng.getrandbits(1),
                    rng.choice([0, 1, 2, 3, 4]))
                   for _ in range(n)]
        q = np.array([e[0] for e in entries], dtype=np.int64)
        s = np.array([e[1] for e in entries], dtype=np.int8)
        b = np.array([e[2] for e in entries], dtype=np.int64)
        out1, bsum1, c1 = em.cal(entries)
        out2, bsum2, c2 = em2.cal_arrays(q, s, b)
        assert np.array_equal(out1, out2), trial
        assert np.array_equal(bsum1, bsum2), trial
        assert np.array_equal(c1, c2), trial


def test_cal_columns_matches_cal_arrays():
    """All-columns errmod must equal the per-column oracle float-exact."""
    from panmap_tpu.genotype.caller import ERRMOD_MAXN, ErrMod, _cumcount

    rng = random.Random(9)
    em = ErrMod()
    ncol = 60
    cols, qs, ss, bs = [], [], [], []
    for c in range(ncol):
        n = rng.choice([0, 1, 2, 5, 30, 200, 255, 300])
        for _ in range(n):
            cols.append(c)
            qs.append(rng.randrange(4, 64))
            ss.append(rng.getrandbits(1))
            bs.append(rng.choice([0, 1, 2, 3, 4]))
    col = np.array(cols, np.int64)
    q = np.array(qs, np.int64)
    s = np.array(ss, np.int8)
    b = np.array(bs, np.int64)
    capped = _cumcount(col) < ERRMOD_MAXN
    diag, bsum, cc = em.cal_columns(col[capped], q[capped], s[capped],
                                    b[capped], ncol)
    for c in range(ncol):
        m = col == c
        out1, bsum1, c1 = em.cal_arrays(q[m], s[m], b[m])
        assert np.array_equal(np.diag(out1)[:5], diag[c]), c
        assert np.array_equal(bsum1, bsum[c]), c
        assert np.array_equal(c1, cc[c]), c
