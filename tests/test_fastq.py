"""FASTQ readers: the bulk whole-file parser (io/fastq.py::_read_bulk) vs
the streaming oracle (_iter_records) across formats, edge shapes, and the
fallback conditions; plus the parse cache and pairing conventions."""

import gzip
import os

import numpy as np
import pytest

from panmap_tpu.io import fastq


def _stream(path):
    names, seqs, quals = [], [], []
    for nm, s, q in fastq._iter_records(path):
        names.append(nm)
        seqs.append(s)
        quals.append(q)
    return names, seqs, quals


def _write(tmp_path, name, content, gz=False):
    p = tmp_path / name
    data = content.encode()
    if gz:
        p.write_bytes(gzip.compress(data))
    else:
        p.write_bytes(data)
    return str(p)


def test_bulk_matches_stream_plain_and_gz(tmp_path):
    recs = "".join(f"@r{i} extra meta\nACGT{'A'*i}\n+\nIIII{'I'*i}\n"
                   for i in range(50))
    for gz in (False, True):
        p = _write(tmp_path, f"a{gz}.fastq", recs, gz)
        assert fastq._read_bulk(p) == _stream(p)
        assert fastq.read_full(p) == _stream(p)
        assert fastq.read_sequences(p) == _stream(p)[1]


def test_bulk_empty_qual_line_gets_I_fill(tmp_path):
    p = _write(tmp_path, "q.fastq", "@a\nACGTA\n+\n\n@b\nGG\n+\nII\n")
    names, seqs, quals = fastq.read_full(p)
    assert quals[0] == "IIIII" and quals[1] == "II"
    assert _stream(p) == (names, seqs, quals)


def test_bulk_falls_back_on_crlf_and_fasta_and_truncation(tmp_path):
    # CRLF: bulk refuses, streaming handles
    p = _write(tmp_path, "crlf.fastq", "@a\r\nACGT\r\n+\r\nIIII\r\n")
    assert fastq._read_bulk(p) is None
    assert fastq.read_full(p) == ([" a"[1:]], ["ACGT"], ["IIII"])
    # FASTA: bulk refuses (streaming parses)
    p = _write(tmp_path, "x.fa", ">s1 d\nACGT\nACGT\n>s2\nGG\n")
    assert fastq._read_bulk(p) is None
    assert fastq.read_full(p) == (["s1", "s2"], ["ACGTACGT", "GG"],
                                  ["I" * 8, "II"])
    # truncated trailing record (line count not a multiple of 4)
    p = _write(tmp_path, "t.fastq", "@a\nACGT\n+\nIIII\n@b\nGG\n")
    assert fastq._read_bulk(p) is None
    assert fastq.read_full(p) == _stream(p)


def test_parse_cache_hits_and_invalidates(tmp_path):
    p = _write(tmp_path, "c.fastq", "@a\nACGT\n+\nIIII\n")
    a = fastq._read_bulk(p)
    b = fastq._read_bulk(p)
    assert a is b  # cache hit: same object
    # rewrite -> mtime/size change -> reparse
    with open(p, "a") as fh:
        fh.write("@b\nGGGG\n+\nIIII\n")
    os.utime(p, (1e9, 1e9))
    c = fastq._read_bulk(p)
    assert c is not a and len(c[0]) == 2


def test_paired_conventions_still_hold(tmp_path):
    r1 = _write(tmp_path, "r1.fastq", "@p/1\nAACC\n+\nABCD\n")
    r2 = _write(tmp_path, "r2.fastq", "@p/2\nGGTT\n+\nWXYZ\n")
    seqs = fastq.read_paired_for_placement(r1, r2)
    assert list(seqs) == ["AACC", "GGTT"]  # raw orientation, interleaved
    names, aseqs, quals = fastq.read_paired_for_alignment(r1, r2)
    assert list(aseqs) == ["AACC", "AACC"]  # R2 revcomp of GGTT
    assert quals == ["ABCD", "ZYXW"]  # R2 quals reversed
