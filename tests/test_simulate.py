"""Simulator (dev tool): truth-VCF consistency — replaying the emitted VCF
rows onto the original sequence must reproduce the mutated sequence exactly
(the property the reference's synthetic-truth e2e tests rely on)."""

import random

from panmap_tpu.simulate import generate_reads, simulate_mutations


def _apply_vcf(seq: str, rows: list) -> str:
    out = seq
    # apply right-to-left so positions stay valid
    for pos1, ref, alt in sorted(rows, reverse=True):
        i = pos1 - 1
        assert out[i : i + len(ref)] == ref, (pos1, ref, out[i : i + len(ref)])
        out = out[:i] + alt + out[i + len(ref):]
    return out


def test_truth_vcf_replays_to_mutated_sequence():
    rng = random.Random(3)
    seq = "".join(rng.choice("ACGT") for _ in range(6000))
    mutated, rows = simulate_mutations(seq, 8, 3, 3, (1, 9), rng)
    assert len(rows) == 14
    assert _apply_vcf(seq, rows) == mutated


def test_snp_only_counts_and_flank_guard():
    rng = random.Random(5)
    seq = "".join(rng.choice("ACGT") for _ in range(5000))
    mutated, rows = simulate_mutations(seq, 10, 0, 0, (1, 9), rng)
    assert len(rows) == 10
    assert all(len(r) == 1 and len(a) == 1 for _, r, a in rows)
    assert all(1000 < p <= len(seq) - 1000 for p, _, _ in rows)
    assert _apply_vcf(seq, rows) == mutated


def test_generate_reads_error_rate():
    rng = random.Random(9)
    seq = "".join(rng.choice("ACGT") for _ in range(8000))
    pairs = generate_reads(seq, 300, 0.002, rng)
    assert len(pairs) == 300
    # R1 must be a near-exact substring match somewhere in seq
    mismatch = 0
    total = 0
    for _, s1, q1, s2, q2 in pairs[:50]:
        assert len(s1) == len(q1) == 150
        # locate by exact 30-mer anchor
        anchor = s1[:30]
        i = seq.find(anchor)
        if i < 0:
            continue
        ref = seq[i : i + 150]
        total += 150
        mismatch += sum(a != b for a, b in zip(s1, ref))
    assert total > 0
    assert mismatch / total < 0.01
