"""The columnar record/BAM path (pipeline._emit_columnar) must produce a
byte-identical BAM and identical PlacedReads vs the object path
(add_record + write_bam) on synthetic paired and unpaired workloads."""

import random

import numpy as np
import pytest

import panmap_tpu.align.batch as AB
from panmap_tpu import pipeline as P
from panmap_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")

BASES = "ACGT"


def _mk(tmp_path, rng, ref, paired, n=300):
    from panmap_tpu.sketch.cpu import reverse_complement

    r1p = tmp_path / "r1.fastq"
    r2p = tmp_path / "r2.fastq"
    f1 = open(r1p, "w")
    f2 = open(r2p, "w") if paired else None
    for i in range(n):
        L = rng.randrange(80, 152)
        frag = 2 * L + rng.randrange(-40, 120)
        p = rng.randrange(0, max(1, len(ref) - max(frag, L)))
        g = ref[p:p + max(frag, L)]
        r1 = list(g[:L])
        for _ in range(rng.randrange(0, 5)):
            r1[rng.randrange(L)] = rng.choice(BASES)
        if rng.random() < 0.1:  # junk read (unmapped)
            r1 = [rng.choice(BASES) for _ in range(L)]
        q1 = "".join(chr(33 + rng.randrange(2, 41)) for _ in range(L))
        f1.write(f"@r{i}/1\n{''.join(r1)}\n+\n{q1}\n")
        if paired:
            r2 = reverse_complement(g[-L:])
            q2 = "".join(chr(33 + rng.randrange(2, 41)) for _ in range(L))
            f2.write(f"@r{i}/2\n{r2}\n+\n{q2}\n")
    f1.close()
    if f2:
        f2.close()
    return str(r1p), (str(r2p) if paired else None)


class _Tree:
    def __init__(self, ref):
        self._ref = ref

    def get_string(self, node):
        return self._ref


@pytest.mark.parametrize("paired", [True, False])
def test_columnar_matches_object_path(tmp_path, paired):
    rng = random.Random(17)
    ref = "".join(rng.choice(BASES) for _ in range(30000))
    r1, r2 = _mk(tmp_path, rng, ref, paired)

    class Cfg:
        output = str(tmp_path / "a")
        reads1 = r1
        reads2 = r2
        aligner = "minimap2"
        log = staticmethod(lambda *a, **k: None)

    tree = _Tree(ref)
    refA, placedA = P.run_alignment(Cfg, tree, "n0")
    # the columnar path now returns ColumnarReads; PlacedRead equivalence is
    # checked through the same converter the BAQ path uses
    placedA = P._columnar_to_placed(placedA)
    bamA = open(Cfg.output + ".bam", "rb").read()
    Cfg.output = str(tmp_path / "b")
    orig = AB.BatchAligner.align_batch_arrays
    AB.BatchAligner.align_batch_arrays = (
        lambda self, seqs, pre=None, deferred_async=False: None)
    try:
        refB, placedB = P.run_alignment(Cfg, tree, "n0")
    finally:
        AB.BatchAligner.align_batch_arrays = orig
    bamB = open(Cfg.output + ".bam", "rb").read()
    assert bamA == bamB
    assert len(placedA) == len(placedB) > 0
    for a, b in zip(placedA, placedB):
        for f in ("rs", "cigar", "seq", "qs", "qname", "is_proper",
                  "is_paired", "mapq", "rev", "has_clip"):
            assert getattr(a, f) == getattr(b, f), f
        assert np.array_equal(np.asarray(a.quals), np.asarray(b.quals))
