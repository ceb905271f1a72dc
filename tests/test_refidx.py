"""Reference .idx compatibility reader (io/refidx.py): decoded against a
hand-encoded Cap'n Proto LiteIndex fixture (schema src/index_lite.capnp),
raw and ZSTD-framed, plus a skip-gated cross-validation against a real
reference-built index when one is provided (PANMAP_REF_IDX=path +
PANMAP_REF_PANMAN=path)."""

import os
import struct

import numpy as np
import pytest

from panmap_tpu.io.refidx import (
    IDX_HEADER_SIZE,
    IDX_MAGIC,
    read_idx_header,
    read_ref_index,
)


class _Enc:
    """Minimal single-segment capnp encoder (just enough for LiteIndex)."""

    def __init__(self):
        self.words = [0]  # word 0 = root pointer

    def alloc(self, n):
        off = len(self.words)
        self.words.extend([0] * n)
        return off

    def put_struct_ptr(self, at, target, data_words, ptr_words):
        off = target - at - 1
        self.words[at] = ((off & 0x3FFFFFFF) << 2) | 0 \
            | (data_words << 32) | (ptr_words << 48)

    def put_list_ptr(self, at, target, esize, count):
        off = target - at - 1
        self.words[at] = ((off & 0x3FFFFFFF) << 2) | 1 \
            | (esize << 32) | (count << 35)

    def prim_list(self, at, values, esize, bytes_per):
        """esize code: 2=1B,3=2B,4=4B,5=8B."""
        n = len(values)
        nwords = (n * bytes_per + 7) // 8
        tgt = self.alloc(max(nwords, 0))
        buf = bytearray(nwords * 8)
        fmt = {1: "<B", 2: "<h", 4: "<I", 8: "<Q"}[bytes_per]
        for i, v in enumerate(values):
            struct.pack_into(fmt, buf, i * bytes_per, v)
        for w in range(nwords):
            self.words[tgt + w] = struct.unpack_from("<Q", buf, w * 8)[0]
        self.put_list_ptr(at, tgt, esize, n)

    def f64_list(self, at, values):
        n = len(values)
        tgt = self.alloc(n)
        for i, v in enumerate(values):
            self.words[tgt + i] = struct.unpack(
                "<Q", struct.pack("<d", v))[0]
        self.put_list_ptr(at, tgt, 5, n)

    def bool_list(self, at, values):
        n = len(values)
        nwords = (n + 63) // 64
        tgt = self.alloc(nwords)
        for i, v in enumerate(values):
            if v:
                self.words[tgt + i // 64] |= 1 << (i % 64)
        self.put_list_ptr(at, tgt, 1, n)

    def text(self, at, s):
        b = s.encode() + b"\x00"
        nwords = (len(b) + 7) // 8
        tgt = self.alloc(nwords)
        for w in range(nwords):
            chunk = b[w * 8 : w * 8 + 8].ljust(8, b"\x00")
            self.words[tgt + w] = struct.unpack("<Q", chunk)[0]
        self.put_list_ptr(at, tgt, 2, len(b))

    def composite_list(self, at, count, data_words, ptr_words):
        """Returns the word offset of element 0 (after the tag word)."""
        per = data_words + ptr_words
        tgt = self.alloc(1 + count * per)
        # tag word: struct pointer with offset = element count
        self.words[tgt] = ((count & 0x3FFFFFFF) << 2) | 0 \
            | (data_words << 32) | (ptr_words << 48)
        self.put_list_ptr(at, tgt, 7, count * per)
        return tgt + 1

    def message(self) -> bytes:
        seg = b"".join(struct.pack("<Q", w & 0xFFFFFFFFFFFFFFFF)
                       for w in self.words)
        return struct.pack("<II", 0, len(self.words)) + seg


def _encode_lite_index(k, s, t, l, open_, hpc, node_ids, parents, ident,
                       branges, hashes, pc, cc, offs, sub, fmt=4,
                       segments=1):
    e = _Enc()
    # root: LiteIndex — 2 data words, 11 pointers
    root = e.alloc(2 + 11)
    e.put_struct_ptr(0, root, 2, 11)
    d = bytearray(16)
    struct.pack_into("<HHHH", d, 0, k, s, t, l)
    flags = (1 if open_ else 0) | ((1 if hpc else 0) << 1)
    d[8] = flags
    struct.pack_into("<H", d, 10, fmt)
    e.words[root] = struct.unpack_from("<Q", d, 0)[0]
    e.words[root + 1] = struct.unpack_from("<Q", d, 8)[0]
    P = root + 2  # pointer section

    # liteTree (ptr 0): struct with 0 data words, 2 pointers
    lt = e.alloc(2)
    e.put_struct_ptr(P + 0, lt, 0, 2)
    # liteNodes: composite (1 data word, 1 ptr)
    el0 = e.composite_list(lt + 0, len(node_ids), 1, 1)
    for i, (nm, par, idp) in enumerate(zip(node_ids, parents, ident)):
        base = el0 + i * 2
        e.words[base] = par | ((1 if idp else 0) << 32)
        e.text(base + 1, nm)
    # blockRanges: composite (1 data word, 0 ptrs)
    el1 = e.composite_list(lt + 1, len(branges), 1, 0)
    for i, (a, b) in enumerate(branges):
        e.words[el1 + i] = a | (b << 32)

    # seedChangeHashes (ptr 1): List(List(u64)) — split into `segments`
    def ragged(pi, values, esize, bytes_per):
        outer = e.alloc(segments)
        e.put_list_ptr(P + pi, outer, 6, segments)
        n = len(values)
        per = (n + segments - 1) // segments
        for si in range(segments):
            chunk = values[si * per : (si + 1) * per]
            e.prim_list(outer + si, chunk, esize, bytes_per)

    ragged(1, [int(h) for h in hashes], 5, 8)
    ragged(2, [int(x) for x in pc], 3, 2)
    ragged(3, [int(x) for x in cc], 3, 2)
    e.prim_list(P + 4, [int(x) for x in offs], 5, 8)
    # mgsr fields (5..9) left null
    e.f64_list(P + 10, list(sub))

    hdr = bytearray(IDX_HEADER_SIZE)
    struct.pack_into("<6I", hdr, 0, IDX_MAGIC, 1, k, s, t, l)
    hdr[24] = 1 if hpc else 0
    hdr[25] = 1 if open_ else 0
    hdr[26] = 1  # uncompressed
    return bytes(hdr), e.message()


def _fixture():
    rng = np.random.default_rng(3)
    node_ids = ["root", "a", "b", "c"]
    parents = [0, 0, 1, 1]
    ident = [False, False, True, False]
    branges = [(0, 100), (100, 220)]
    offs = [0, 3, 5, 5, 8]
    T = offs[-1]
    hashes = rng.integers(1, 1 << 62, T, dtype=np.uint64)
    pc = rng.integers(-3, 4, T).astype(np.int16)
    cc = rng.integers(-3, 4, T).astype(np.int16)
    sub = rng.random(16)
    return node_ids, parents, ident, branges, hashes, pc, cc, offs, sub


@pytest.mark.parametrize("segments", [1, 2])
def test_read_ref_index_raw(tmp_path, segments):
    node_ids, parents, ident, branges, hashes, pc, cc, offs, sub = _fixture()
    hdr, msg = _encode_lite_index(19, 8, 0, 3, False, True, node_ids,
                                  parents, ident, branges, hashes, pc, cc,
                                  offs, sub, segments=segments)
    path = tmp_path / "x.idx"
    path.write_bytes(hdr + msg)
    h = read_idx_header(str(path))
    assert (h["k"], h["s"], h["t"], h["l"]) == (19, 8, 0, 3)
    assert h["hpc"] and not h["open"] and h["uncompressed"]
    idx = read_ref_index(str(path))
    assert idx.node_ids == node_ids
    assert idx.parent_index.tolist() == parents
    assert idx.identical_to_parent.tolist() == ident
    assert idx.block_ranges.tolist() == [list(x) for x in branges]
    assert np.array_equal(idx.seed_hashes, hashes)
    assert np.array_equal(idx.parent_counts, pc)
    assert np.array_equal(idx.child_counts, cc)
    assert idx.node_offsets.tolist() == offs
    assert np.allclose(idx.substitution_matrix, sub)
    assert idx.params.k == 19 and idx.params.hpc and not idx.params.open


def test_read_ref_index_zstd(tmp_path):
    import zstandard

    node_ids, parents, ident, branges, hashes, pc, cc, offs, sub = _fixture()
    hdr, msg = _encode_lite_index(21, 11, 2, 1, True, False, node_ids,
                                  parents, ident, branges, hashes, pc, cc,
                                  offs, sub)
    hdr = bytearray(hdr)
    hdr[26] = 0  # compressed
    # two independent frames, like panmap_zstd::compressToFile
    cctx = zstandard.ZstdCompressor(level=3)
    half = len(msg) // 2 // 8 * 8  # keep word alignment per frame? not
    # required — frames concatenate to the original byte stream
    blob = cctx.compress(msg[:half]) + cctx.compress(msg[half:])
    path = tmp_path / "y.idx"
    path.write_bytes(bytes(hdr) + blob)
    idx = read_ref_index(str(path))
    assert idx.node_ids == node_ids
    assert np.array_equal(idx.seed_hashes, hashes)
    assert idx.params.open and not idx.params.hpc and idx.params.s == 11


def test_cross_validate_against_reference_idx():
    """Row-for-row cross-validation against a REFERENCE-BUILT index.  The
    reference binary is not built in this image, so this runs only when the
    artifacts are supplied: PANMAP_REF_IDX=<.idx> PANMAP_REF_PANMAN=<.panman>
    (tools/validate_ref_idx.py is the standalone form)."""
    ref_idx = os.environ.get("PANMAP_REF_IDX")
    panman = os.environ.get("PANMAP_REF_PANMAN")
    if not ref_idx or not panman:
        pytest.skip("no reference-built .idx supplied "
                    "(set PANMAP_REF_IDX + PANMAP_REF_PANMAN)")
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/validate_ref_idx.py", ref_idx, panman],
        capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.parametrize("compressed", [False, True])
def test_write_ref_index_round_trip(tmp_path, compressed):
    """write_ref_index (the interop writer) round-trips through
    read_ref_index bit-for-bit on a synthetic IndexArrays, raw and ZSTD."""
    from panmap_tpu.index.builder import IndexArrays, IndexParams
    from panmap_tpu.io.refidx import write_ref_index

    rng = np.random.default_rng(7)
    n_nodes = 6
    offs = np.array([0, 4, 7, 7, 12, 15, 20], np.uint64)
    T = int(offs[-1])
    idx = IndexArrays(
        params=IndexParams(k=21, s=11, t=2, l=1, open=True, hpc=False),
        node_ids=[f"node_{i}" for i in range(n_nodes)],
        parent_index=np.array([0, 0, 1, 1, 3, 3], np.uint32),
        identical_to_parent=np.array([0, 0, 1, 0, 0, 1], bool),
        block_ranges=np.array([[0, 111], [111, 230]], np.uint32),
        seed_hashes=rng.integers(1, 1 << 62, T, dtype=np.uint64),
        parent_counts=rng.integers(-5, 6, T).astype(np.int16),
        child_counts=rng.integers(-5, 6, T).astype(np.int16),
        node_offsets=offs,
        substitution_matrix=rng.random(16),
    )
    path = tmp_path / "ours.idx"
    write_ref_index(str(path), idx, compressed=compressed)
    got = read_ref_index(str(path))
    assert got.node_ids == idx.node_ids
    assert np.array_equal(got.parent_index, idx.parent_index)
    assert np.array_equal(got.identical_to_parent, idx.identical_to_parent)
    assert np.array_equal(got.block_ranges, idx.block_ranges)
    assert np.array_equal(got.seed_hashes, idx.seed_hashes)
    assert np.array_equal(got.parent_counts, idx.parent_counts)
    assert np.array_equal(got.child_counts, idx.child_counts)
    assert np.array_equal(got.node_offsets, idx.node_offsets)
    assert np.allclose(got.substitution_matrix,
                       idx.substitution_matrix.reshape(-1))
    pp = got.params
    assert (pp.k, pp.s, pp.t, pp.l, pp.open, pp.hpc) == (21, 11, 2, 1,
                                                         True, False)
