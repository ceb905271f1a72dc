"""Native C++ short-read aligner (pt_align_sr) must match the numpy batch
oracle (BatchAligner._align_chunk) field-for-field, including cigars, on
substitution-only reads, indel reads (DP rescue + tail extension paths),
reverse-complement reads, N-containing reads, and unmappable reads."""

import random

import numpy as np
import pytest

from panmap_tpu.align.batch import BatchAligner
from panmap_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")

BASES = "ACGT"


def _ref(rng, n=30000):
    return "".join(rng.choice(BASES) for _ in range(n))


def _mutate(rng, s, n_sub=0, n_ins=0, n_del=0):
    s = list(s)
    for _ in range(n_sub):
        i = rng.randrange(len(s))
        s[i] = rng.choice([b for b in BASES if b != s[i]])
    for _ in range(n_ins):
        i = rng.randrange(len(s))
        s.insert(i, rng.choice(BASES))
    for _ in range(n_del):
        i = rng.randrange(len(s) - 1)
        del s[i]
    return "".join(s)


def _rc(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def _reads(rng, ref, n=400):
    reads = []
    for _ in range(n):
        L = rng.randrange(100, 152)
        i = rng.randrange(0, len(ref) - L)
        r = ref[i : i + L]
        kind = rng.random()
        if kind < 0.3:
            r = _mutate(rng, r, n_sub=rng.randrange(0, 6))
        elif kind < 0.5:
            r = _mutate(rng, r, n_sub=rng.randrange(0, 3),
                        n_ins=rng.randrange(1, 4))
        elif kind < 0.7:
            r = _mutate(rng, r, n_sub=rng.randrange(0, 3),
                        n_del=rng.randrange(1, 4))
        elif kind < 0.8:
            # big clip: half the read is foreign sequence
            r = r[: L // 2] + "".join(rng.choice(BASES) for _ in range(L // 2))
        elif kind < 0.9:
            # N bases
            r = list(r)
            for _ in range(rng.randrange(1, 5)):
                r[rng.randrange(len(r))] = "N"
            r = "".join(r)
        if rng.random() < 0.5:
            r = _rc(r)
        reads.append(r)
    # unmappable junk + homopolymer
    reads.append("".join(rng.choice(BASES) for _ in range(120)))
    reads.append("A" * 120)
    # large deletion spanning (multi-diagonal cluster -> window DP)
    i = rng.randrange(0, len(ref) - 400)
    reads.append(ref[i : i + 70] + ref[i + 130 : i + 200])
    # large insertion
    reads.append(ref[i : i + 70]
                 + "".join(rng.choice(BASES) for _ in range(40))
                 + ref[i + 70 : i + 140])
    return reads


def _cmp(a, b, ctx):
    assert a.mapped == b.mapped, ctx
    if not a.mapped:
        return
    for f in ("rs", "re", "qs", "qe", "rev", "mapq", "score", "nm", "cigar"):
        assert getattr(a, f) == getattr(b, f), (ctx, f, getattr(a, f),
                                                getattr(b, f))


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_native_matches_oracle_synthetic(seed):
    rng = random.Random(seed)
    ref = _ref(rng)
    al = BatchAligner(ref)
    reads = _reads(rng, ref)
    al.use_native = False
    want = al._align_chunk(reads)
    got = al._align_batch_native(reads)
    assert got is not None
    for i, (g, w) in enumerate(zip(got, want)):
        _cmp(g, w, (i, reads[i][:40]))


def test_native_matches_oracle_negative_diag_and_edges():
    rng = random.Random(11)
    ref = _ref(rng, 2000)
    al = BatchAligner(ref)
    reads = []
    # reads hanging off both reference ends (negative diag / rpos clipping)
    reads.append("GGGG" + ref[:120])
    reads.append(ref[-120:] + "CCCC")
    reads.append(_rc("TTTT" + ref[:130]))
    reads.append(_rc(ref[-130:] + "AAAA"))
    # short read right at min length boundaries
    reads.append(ref[100:130])
    want = al._align_chunk(reads)
    got = al._align_batch_native(reads)
    for i, (g, w) in enumerate(zip(got, want)):
        _cmp(g, w, i)


@pytest.mark.e2e
def test_native_matches_oracle_golden_reads():
    import gzip

    def load(p):
        seqs = []
        with gzip.open(p, "rt") as fh:
            for j, line in enumerate(fh):
                if j % 4 == 1:
                    seqs.append(line.strip())
        return seqs

    r1 = load("/root/reference/examples/data/reads/isolate_R1.fastq.gz")
    r2 = load("/root/reference/examples/data/reads/isolate_R2.fastq.gz")
    from panmap_tpu.sketch.cpu import reverse_complement

    seqs = []
    for a, b in zip(r1, r2):
        seqs.append(a)
        seqs.append(reverse_complement(b))
    import lzma, pickle  # noqa: E401

    # align against the golden best node's sequence
    from panmap_tpu.io.panman import load_panman

    tree = load_panman(
        "/root/reference/examples/data/panmans/sars_20000_twilight_dipper.panman")
    ref = tree.get_string("node_7618")
    al = BatchAligner(ref)
    got = al._align_batch_native(seqs)
    assert got is not None
    al.use_native = False
    want = al.align_batch(seqs)
    n_mapped = 0
    for i, (g, w) in enumerate(zip(got, want)):
        _cmp(g, w, i)
        n_mapped += g.mapped
    assert n_mapped > 80000


@pytest.mark.parametrize("seed", [7, 23])
def test_precomputed_minimizers_match_inline(seed):
    """Phase-split equality: align with min_sr_native-precomputed triples
    (the placement-overlap path) must be bit-identical to the inline scan,
    across every read family in the synthetic corpus."""
    from panmap_tpu.native import min_sr_native

    rng = random.Random(seed)
    ref = _ref(rng)
    al = BatchAligner(ref)
    reads = _reads(rng, ref)
    pre = min_sr_native(reads, al.k, al.w)
    assert pre is not None
    want = al.align_batch_arrays(reads)
    got = al.align_batch_arrays(reads, pre=pre)
    for key in ("mapped", "rev", "rs", "re", "qs", "qe", "score", "mapq",
                "nm", "ncig", "cig"):
        assert np.array_equal(want[key], got[key]), key


def test_stale_precompute_is_recomputed_inline():
    """A pre handle invalidated by a later min_sr_native call (the grow-only
    scratch was reused) must be ignored, not silently used."""
    from panmap_tpu.native import min_sr_native

    rng = random.Random(3)
    ref = _ref(rng, 3000)
    al = BatchAligner(ref)
    reads_a = _reads(rng, ref, n=30)
    reads_b = _reads(rng, ref, n=30)
    pre_a = min_sr_native(reads_a, al.k, al.w)
    min_sr_native(reads_b, al.k, al.w)  # clobbers the scratch
    want = al.align_batch_arrays(reads_a)
    got = al.align_batch_arrays(reads_a, pre=pre_a)  # stale: must recompute
    for key in ("mapped", "rs", "re", "score", "cig"):
        assert np.array_equal(want[key], got[key]), key


def test_min_scan_matches_numpy_on_tie_rich_reads():
    """The tie-preserving deque emit must select exactly the positions the
    numpy window-min oracle selects — exercised on repeat-motif reads where
    many k-mers hash identically (every window is a tie)."""
    from panmap_tpu.align.batch import batch_minimizers
    from panmap_tpu.native import min_sr_native
    from panmap_tpu.sketch.tpu import encode_reads_batch

    rng = random.Random(5)
    reads = []
    for motif in ("AC", "ACG", "ACGT", "AACGT", "A"):
        reads.append(motif * (150 // len(motif)))
    for _ in range(20):  # random reads with embedded repeats
        L = rng.randrange(60, 150)
        r = "".join(rng.choice(BASES) for _ in range(L))
        m = rng.choice(("AT", "GGC"))
        i = rng.randrange(0, max(L - 40, 1))
        r = r[:i] + m * 15 + r[i + 30:]
        reads.append(r)
    reads.append("ACGT" * 8)  # short (m <= w)
    al_k, al_w = 21, 11
    pre = min_sr_native(reads, al_k, al_w)
    assert pre is not None
    enc, lens = encode_reads_batch(reads, pad_to=max(len(r) for r in reads))
    ridx, qpos, qh, qstrand = batch_minimizers(enc, lens, al_k, al_w)
    for i, r in enumerate(reads):
        sel = np.flatnonzero(ridx == i)
        o = int(pre["wc_off"][i])
        n = int(pre["cnt"][i])
        assert n == len(sel), (i, r[:30], n, len(sel))
        assert np.array_equal(pre["pos"][o : o + n], qpos[sel]), i
        assert np.array_equal(pre["hash"][o : o + n], qh[sel]), i
        assert np.array_equal(pre["strand"][o : o + n], qstrand[sel]), i
