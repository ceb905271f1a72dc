"""Batched BAM record encoding must be byte-identical to the per-record
oracle (encode_bam_record), and the BGZF stream must decompress back to it."""

import random
import struct
import zlib

from panmap_tpu.io.bam import (_encode_records_batch, encode_bam_record,
                               write_bam)


def _mk_records(rng, n=300):
    recs = []
    for i in range(n):
        lq = rng.randrange(0, 160)
        seq = "".join(rng.choice("ACGTN") for _ in range(lq))
        cigars = [(lq, "M")] if lq else []
        if lq > 30 and rng.random() < 0.4:
            a = rng.randrange(5, lq - 10)
            cigars = [(a, "M"), (rng.randrange(1, 4), rng.choice("ID")),
                      (lq - a, "M")]
            if rng.random() < 0.5:
                cigars = [(3, "S")] + cigars
        recs.append(dict(
            qname=f"r{i}/x", flag=rng.randrange(0, 4096),
            pos=rng.randrange(0, 1 << 28), mapq=rng.randrange(0, 61),
            cigar=cigars, mtid=rng.choice([-1, 0]),
            mpos=rng.randrange(-1, 1000), tlen=rng.randrange(-500, 500),
            seq=seq, qual=bytes(rng.randrange(0, 60) for _ in range(lq)),
        ))
    return recs


def test_batch_encode_matches_oracle():
    rng = random.Random(5)
    recs = _mk_records(rng)
    got = _encode_records_batch(recs)
    want = b"".join(
        encode_bam_record(r["qname"], r["flag"], 0, r["pos"], r["mapq"],
                          r["cigar"], r["mtid"], r["mpos"], r["tlen"],
                          r["seq"], r["qual"]) for r in recs)
    assert got == want


def test_write_bam_roundtrip(tmp_path):
    rng = random.Random(6)
    recs = sorted(_mk_records(rng, 50), key=lambda r: r["pos"])
    p = tmp_path / "t.bam"
    write_bam(str(p), "chr", 1 << 28, recs)
    raw = p.read_bytes()
    # decompress all BGZF blocks
    out = b""
    off = 0
    while off < len(raw):
        xlen = struct.unpack("<H", raw[off + 10:off + 12])[0]
        bsize = struct.unpack("<H", raw[off + 16:off + 18])[0] + 1
        comp = raw[off + 12 + xlen: off + bsize - 8]
        out += zlib.decompress(comp, -15)
        off += bsize
    assert out.startswith(b"BAM\x01")
    body = b"".join(
        encode_bam_record(r["qname"], r["flag"], 0, r["pos"], r["mapq"],
                          r["cigar"], r["mtid"], r["mpos"], r["tlen"],
                          r["seq"], r["qual"]) for r in recs)
    assert out.endswith(body)
