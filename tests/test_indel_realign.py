"""bcftools-realignment indel caller (genotype/indel.py): adversarial unit
coverage of the gap_prep chain — type support gates, consensus N-masking,
STR/tandem quality caps, multi-allelic types — plus the primitive ports
(find_STR, est_seqQ, est_indelreg, tpos2qpos)."""

import numpy as np
import pytest

from panmap_tpu.genotype.caller import ColumnarReads, pileup_call_columnar
from panmap_tpu.genotype.indel import (
    _tpos2qpos,
    est_indelreg,
    est_seqq,
    find_str,
    l_run_of,
)

BASES = "ACGT"


def _codes(s):
    return np.array([BASES.find(c) for c in s], dtype=np.int64)


def _tile_reads(ref, hap, events, depth_step=5, L=100, qual=35):
    """Columnar read set tiling `hap` across ref with exact known cigars.
    events: sorted [(ref_pos_anchor, +ins_len | -del_len)] describing hap
    relative to ref (anchor = ref base BEFORE the event)."""
    rs, stream, coff, seqs, quals = [], [], [0], [], []
    # hap position <-> ref position walker
    for start in range(0, len(hap) - L + 1, depth_step):
        # map hap start to ref coordinate + build cigar across events
        # walk events to find ref position of hap index `start`
        rpos = 0
        hpos = 0
        segs = []  # (op, len) from this read's start
        # build the global alignment as op list then slice [start, start+L)
        ops_all = []
        prev_r = 0
        for (anchor, ln) in events:
            m = anchor + 1 - prev_r
            ops_all.append((0, m))
            if ln > 0:
                ops_all.append((1, ln))
            else:
                ops_all.append((2, -ln))
            prev_r = anchor + 1 + (0 if ln > 0 else -ln)
        ops_all.append((0, len(ref) - prev_r))
        # now slice query window [start, start+L)
        q0 = 0
        r0 = 0
        out = []
        rstart = None
        need = L
        pos_in_q = 0
        for (op, ln) in ops_all:
            if need <= 0:
                break
            if op == 0 or op == 1:  # consumes query
                if pos_in_q + ln <= start:
                    pos_in_q += ln
                    if op == 0:
                        r0 += ln
                    continue
                take0 = max(start - pos_in_q, 0)
                take = min(ln - take0, need)
                if rstart is None:
                    rstart = r0 + (take0 if op == 0 else 0)
                if take > 0:
                    out.append((op, take))
                    need -= take
                pos_in_q += ln
                if op == 0:
                    r0 += ln
            else:  # deletion consumes ref only
                # inside the read iff some query past `start` was consumed
                if rstart is not None and need > 0 and pos_in_q > start:
                    out.append((2, ln))
                r0 += ln
        if rstart is None or need > 0:
            continue
        # merge adjacent same ops; drop leading/trailing deletions
        while out and out[0][0] == 2:
            out.pop(0)
        while out and out[-1][0] == 2:
            out.pop()
        merged = []
        for op, ln in out:
            if merged and merged[-1][0] == op:
                merged[-1][1] += ln
            else:
                merged.append([op, ln])
        rs.append(rstart)
        stream.extend((ln << 4) | op for op, ln in merged)
        coff.append(len(stream))
        seqs.append(hap[start : start + L])
        quals.append(np.full(L, qual, np.uint8))
    soff = np.concatenate(([0], np.cumsum([len(s) for s in seqs])))
    nr = len(rs)
    return ColumnarReads(
        rs=np.array(rs, np.int64), stream=np.array(stream, np.uint32),
        coff=np.array(coff, np.int64),
        seq_blob=np.frombuffer("".join(seqs).encode(), np.uint8).copy(),
        qual_blob=np.concatenate(quals), soff=soff.astype(np.int64),
        mapq=np.full(nr, 60, np.int64), rev=np.zeros(nr, bool),
        proper=np.zeros(nr, bool), paired=False,
        qnames=[f"r{i}" for i in range(nr)])


def test_find_str_basic():
    # (AC)x5 from position 2: word-level repeats detected with containment
    s = _codes("GG" + "AC" * 5 + "TTTT" + "GG")
    reps = find_str(s)
    assert any(r[2] in (1, 2) and r[0] <= 3 and r[1] >= 9 for r in reps)
    # homopolymer run
    s2 = _codes("ACGT" + "A" * 8 + "CGT")
    reps2 = find_str(s2)
    assert any(r[2] == 1 and r[1] - r[0] >= 6 for r in reps2)


def test_est_seqq_and_indelreg():
    # non-repeat context: openQ + extQ*(l-1), capped by tandem in runs
    assert est_seqq(1, 1) == 40
    assert est_seqq(3, 1) == 80
    assert est_seqq(1, 20) == int(500 * 1 / 20 + 0.499)  # homopolymer cap
    ref = "GGGGACACACACTTTT"
    # deleting AC from the (AC)4 tract: indelreg spans the tract remainder
    ir = est_indelreg(3, ref, -2, None)
    assert ir >= 8
    assert l_run_of("AATTTTTTAA", 1) == 6


def test_tpos2qpos_matches_manual():
    # read: 5S 10M 2D 5M 3I 10M at rs=100
    ops = np.array([4, 0, 2, 0, 1, 0])
    lns = np.array([5, 10, 2, 5, 3, 10])
    q, t = _tpos2qpos(100, ops, lns, 105, False)
    assert (q, t) == (10, 105)
    # inside the deletion: qpos stays, tpos snaps right (is_left=False)
    q, t = _tpos2qpos(100, ops, lns, 110, False)
    assert (q, t) == (15, 112)
    q, t = _tpos2qpos(100, ops, lns, 110, True)  # is_left: snap left
    assert (q, t) == (15, 110)
    # ref 112..116 are the 5M block
    q2, _ = _tpos2qpos(100, ops, lns, 112, False)
    assert q2 == 15
    q3, _ = _tpos2qpos(100, ops, lns, 116, False)
    assert q3 == 19


def test_deletion_called_insertion_called():
    rng = np.random.default_rng(5)
    ref = "".join(rng.choice(list(BASES), 1200))
    # 6bp deletion at anchor 400, 4bp insertion at anchor 800
    hap = ref[:401] + ref[407:801] + "TCGA" + ref[801:]
    cols = _tile_reads(ref, hap, [(400, -6), (800, +4)])
    recs = pileup_call_columnar(ref, cols)
    indels = [r for r in recs if len(r.ref) > 1 or any(len(a) > 1
                                                       for a in r.alts)]
    assert len(indels) == 2
    dels = [r for r in indels if len(r.ref) > len(r.alts[0])]
    ins = [r for r in indels if len(r.ref) < len(r.alts[0])]
    assert dels and ins
    assert dels[0].pos == 400 and dels[0].gt == 1
    assert ins[0].pos == 800 and ins[0].gt == 1
    assert ins[0].alts[0][1:5] == "TCGA"[: 4]


def test_low_support_indel_rejected():
    """A single gapped read among many clean ones fails the min_support=2 /
    min_frac=0.05 gates (bcf_cgp_find_types)."""
    rng = np.random.default_rng(7)
    ref = "".join(rng.choice(list(BASES), 900))
    hap = ref[:401] + ref[405:]  # 4bp deletion
    cols_clean = _tile_reads(ref, ref, [(860, -1)])  # irrelevant far event
    cols_var = _tile_reads(ref, hap, [(400, -4)], depth_step=700)  # 1 read
    # merge: many clean + one variant read
    def cat(a, b):
        return ColumnarReads(
            rs=np.concatenate([a.rs, b.rs]),
            stream=np.concatenate([a.stream, b.stream]),
            coff=np.concatenate([a.coff, b.coff[1:] + a.coff[-1]]),
            seq_blob=np.concatenate([a.seq_blob, b.seq_blob]),
            qual_blob=np.concatenate([a.qual_blob, b.qual_blob]),
            soff=np.concatenate([a.soff, b.soff[1:] + a.soff[-1]]),
            mapq=np.concatenate([a.mapq, b.mapq]),
            rev=np.concatenate([a.rev, b.rev]),
            proper=np.concatenate([a.proper, b.proper]),
            paired=False, qnames=a.qnames + [f"v{i}" for i in
                                             range(len(b.rs))])
    # make the clean set truly clean (no events): tile ref over itself
    clean = _tile_reads(ref, ref, [(860, -1)])
    # remove the far event by regenerating without it is simpler:
    clean = _tile_reads(ref, ref[:861] + ref[862:], [(860, -1)])
    cols = cat(clean, cols_var)
    recs = pileup_call_columnar(ref, cols)
    assert not any(r.pos == 400 for r in recs
                   if len(r.ref) > 1 or any(len(a) > 1 for a in r.alts))


def test_multiallelic_deletions():
    """Two deletion lengths at one anchor: both become types; the caller
    picks the dominant one as ALT (multi-allelic machinery exercised)."""
    rng = np.random.default_rng(11)
    ref = "".join(rng.choice(list(BASES), 1000))
    hap1 = ref[:401] + ref[404:]  # 3bp del
    hap2 = ref[:401] + ref[409:]  # 8bp del
    a = _tile_reads(ref, hap1, [(400, -3)])
    b = _tile_reads(ref, hap2, [(400, -8)], depth_step=17)  # fewer reads
    cols = ColumnarReads(
        rs=np.concatenate([a.rs, b.rs]),
        stream=np.concatenate([a.stream, b.stream]),
        coff=np.concatenate([a.coff, b.coff[1:] + a.coff[-1]]),
        seq_blob=np.concatenate([a.seq_blob, b.seq_blob]),
        qual_blob=np.concatenate([a.qual_blob, b.qual_blob]),
        soff=np.concatenate([a.soff, b.soff[1:] + a.soff[-1]]),
        mapq=np.concatenate([a.mapq, b.mapq]),
        rev=np.concatenate([a.rev, b.rev]),
        proper=np.zeros(len(a.rs) + len(b.rs), bool), paired=False,
        qnames=[f"x{i}" for i in range(len(a.rs) + len(b.rs))])
    recs = pileup_call_columnar(ref, cols)
    hits = [r for r in recs if r.pos == 400 and len(r.ref) > 1]
    assert hits, [(r.pos, r.ref, r.alts) for r in recs]
    rec = hits[0]
    # dominant 3bp deletion wins the first ALT slot; GT calls it
    assert len(rec.ref) - len(rec.alts[0]) == 3
    assert rec.gt == 1


def test_legacy_indel_oracle_still_available(monkeypatch):
    """PANMAP_TPU_LEGACY_INDELS=1 routes back to the simplified caller."""
    rng = np.random.default_rng(13)
    ref = "".join(rng.choice(list(BASES), 800))
    hap = ref[:301] + ref[305:]
    cols = _tile_reads(ref, hap, [(300, -4)])
    monkeypatch.setenv("PANMAP_TPU_LEGACY_INDELS", "1")
    recs = pileup_call_columnar(ref, cols)
    assert any(len(r.ref) > 1 for r in recs)


def test_indel_near_snp_cluster_consensus_masking():
    """The bcf_cgp_ref_sample 70% N-masking: a high-frequency SNP adjacent
    to a real deletion must not suppress the indel call (the SNP locus is
    masked to N in the per-sample consensus, so realignment doesn't pay a
    mismatch for it on either allele)."""
    rng = np.random.default_rng(17)
    ref = "".join(rng.choice(list(BASES), 900))
    # haplotype: SNP at 395 + 5bp deletion after 400
    alt_base = "A" if ref[395] != "A" else "C"
    hap = ref[:395] + alt_base + ref[396:401] + ref[406:]
    cols = _tile_reads(ref, hap, [(400, -5)])
    recs = pileup_call_columnar(ref, cols)
    dels = [r for r in recs if r.pos == 400 and len(r.ref) > len(r.alts[0])]
    assert dels, [(r.pos, r.ref, r.alts) for r in recs]
    assert dels[0].gt == 1
    assert len(dels[0].ref) - len(dels[0].alts[0]) == 5
    # the SNP itself is still called by the SNP path
    snps = [r for r in recs if r.pos == 395 and len(r.ref) == 1
            and len(r.alts[0]) == 1]
    assert snps and snps[0].alts[0] == alt_base
