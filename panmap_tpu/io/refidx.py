"""Reference `.idx` compatibility reader (VERDICT item 7 / SURVEY §7 step 3).

Reads an index file written by the reference binary's
`IndexBuilder::writeIndex` (src/index_single_mode.cpp:1593-1636): a 32-byte
uncompressed parameter header ("PMI1" magic, version, k/s/t/l, hpc/open/
uncompressed flags) followed by either the raw Cap'n Proto flat message or
independent 64MB ZSTD frames of it.  The payload is the LiteIndex struct
(src/index_lite.capnp:36-70) — decoded with the repo's schema-less capnp
walker into the same IndexArrays our own builder produces, so a
reference-built index can drive placement directly and, more importantly,
cross-validate our builder row-for-row (tools/validate_ref_idx.py).

Capnp field -> slot map for LiteIndex (field numbers from the schema;
pointer index = declaration order among pointer fields):
  data:  k u16@0, s u16@2, t u16@4, l u16@6, open bit@64, hpc bit@65,
         formatVersion u16@10
  ptrs:  0 liteTree, 1 seedChangeHashes, 2 seedChangeParentCounts,
         3 seedChangeChildCounts, 4 nodeChangeOffsets, 5..8 mgsr fields,
         9 perNodeChanges, 10 substitutionMatrix
"""

from __future__ import annotations

import struct

import numpy as np

from ..index.builder import IndexArrays, IndexParams
from .capnp import CapnpMessage

IDX_MAGIC = 0x31494D50  # "PMI1" little-endian
IDX_HEADER_VERSION = 1
IDX_HEADER_SIZE = 32


def read_idx_header(path: str) -> dict:
    """The 32-byte uncompressed parameter header (encodeIndexHeader)."""
    with open(path, "rb") as fh:
        h = fh.read(IDX_HEADER_SIZE)
    if len(h) < IDX_HEADER_SIZE:
        raise ValueError(f"{path}: truncated index header")
    magic, ver, k, s, t, l = struct.unpack_from("<6I", h, 0)
    if magic != IDX_MAGIC or ver != IDX_HEADER_VERSION:
        raise ValueError(f"{path}: not a reference .idx (magic/version)")
    return dict(k=k, s=s, t=t, l=l, hpc=h[24] != 0, open=h[25] != 0,
                uncompressed=h[26] != 0)


def _payload(path: str, uncompressed: bool) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(IDX_HEADER_SIZE)
        blob = fh.read()
    if uncompressed:
        return blob
    import zstandard

    # concatenated independent frames: decompress them in sequence
    out = []
    off = 0
    dctx = zstandard.ZstdDecompressor()
    while off < len(blob):
        # one decompressobj per frame: it stops at frame end and reports
        # the remainder via unused_data
        dobj = dctx.decompressobj()
        chunk = dobj.decompress(blob[off:])
        out.append(chunk)
        consumed = len(blob) - off - len(dobj.unused_data)
        if consumed <= 0:
            raise ValueError("zstd frame did not advance")
        off += consumed
    return b"".join(out)


def _concat_ragged(lst, dtype):
    """List(List(T)) (the 500M-row segmenting of index_lite.capnp:45-48)
    concatenated into one array."""
    parts = []
    for i in range(len(lst)):
        inner = lst.ptr(i)
        parts.append(inner.as_numpy(dtype) if inner is not None
                     else np.empty(0, dtype))
    return (np.concatenate(parts) if parts else np.empty(0, dtype))


def read_ref_index(path: str) -> IndexArrays:
    """Decode a reference-built .idx into IndexArrays."""
    hdr = read_idx_header(path)
    msg = CapnpMessage(_payload(path, hdr["uncompressed"]))
    root = msg.root()

    k = root.u16(0)
    s = root.u16(2)
    t = root.u16(4)
    l = root.u16(6)
    open_ = root.bool_(64)
    hpc = root.bool_(65)
    fmt = root.u16(10)
    if fmt not in (0, 4):
        raise ValueError(f"{path}: unsupported formatVersion {fmt}")

    tree = root.ptr(0)
    nodes = tree.ptr(0) if tree is not None else None
    node_ids = []
    parent_index = []
    identical = []
    if nodes is not None:
        for nd in nodes.structs():
            node_ids.append(nd.text(0) or "")
            parent_index.append(nd.u32(0))
            identical.append(nd.bool_(32))
    brs = tree.ptr(1) if tree is not None else None
    if brs is not None and len(brs):
        block_ranges = np.stack(
            [np.array([b.u32(0), b.u32(4)], np.uint32)
             for b in brs.structs()])
    else:
        block_ranges = np.zeros((0, 2), np.uint32)

    def ragged(pi, dtype):
        lst = root.ptr(pi)
        return (_concat_ragged(lst, dtype) if lst is not None
                else np.empty(0, dtype))

    hashes = ragged(1, "<u8")
    pcounts = ragged(2, "<i2")
    ccounts = ragged(3, "<i2")
    offs_l = root.ptr(4)
    offsets = (offs_l.as_numpy("<u8") if offs_l is not None
               else np.zeros(1, np.uint64))
    sub_l = root.ptr(10)
    sub = (sub_l.as_numpy("<f8") if sub_l is not None else np.zeros(16))

    return IndexArrays(
        params=IndexParams(k=int(k), s=int(s), t=int(t), l=int(l),
                           open=bool(open_), hpc=bool(hpc)),
        node_ids=node_ids,
        parent_index=np.asarray(parent_index, np.uint32),
        identical_to_parent=np.asarray(identical, bool),
        block_ranges=block_ranges,
        seed_hashes=np.ascontiguousarray(hashes),
        parent_counts=np.ascontiguousarray(pcounts),
        child_counts=np.ascontiguousarray(ccounts),
        node_offsets=np.ascontiguousarray(offsets),
        substitution_matrix=np.asarray(sub, np.float64),
    )
