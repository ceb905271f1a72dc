"""PanMAN file reader: lzma-compressed Cap'n Proto pangenome trees.

Schema reverse-engineered from the wire format of TurakhiaLab/panman v0.1.4 files
(the reference consumes them via the panman library; see
/root/reference/src/main.cpp:313-325 `loadPanMAN` and the consumer API usage in
/root/reference/src/panmap_utils.hpp:229-279 `BlockSequences`).

Wire layout (validated against examples/expected/single_sample/isolate.ref.fa):

  TreeGroup: struct{ptrs: [List(Tree), List(ComplexMutation)]}
  Tree:      struct{ptrs: [newick Text, List(Node), List(ConsensusSeqToBlockIds),
                           List(GapList), blockGaps, circular, rotation, inverted, ...]}
  Node:      struct{ptrs: [List(Mutation), List(Text) annotations]}
  Mutation:  struct{data: blockId i64 @0; flags byte8: bit0=blockGapExist,
                    bit1=blockMutExist, bit2=blockMutInfo(insertion), bit3=blockInversion;
                    ptrs: [List(NucMut)]}
  NucMut:    struct{data 2w: nucPosition i32 @0, nucGapPosition i32 @4,
                    (unused u32 @8), packed u32 @12 = mutInfo u8 | nuc nibbles}
  ConsensusSeqToBlockIds: struct{ptrs: [List(u64) blockIds, List(u32) nibble-packed
                    consensus, List(bool) blockGapExist]}
  GapList:   struct{data: blockId i64; ptrs: [List(i32) nucPosition, List(i32) nucGapLength]}

Nucleotide codes are one-hot IUPAC (A=1,C=2,G=4,T=8; combinations = ambiguity codes;
0 terminates a consensus block / encodes '-' in mutations), decoded identically to
panman's getNucleotideFromCode as used throughout the reference.
"""

from __future__ import annotations

import lzma
from dataclasses import dataclass, field

import numpy as np

from .capnp import CapnpMessage

# code -> nucleotide character (index = 4-bit one-hot/IUPAC code)
NUC_FROM_CODE = np.frombuffer(b"-ACMGRSVTWYHKDBN", dtype="S1")
NUC_CODE_BYTE = NUC_FROM_CODE.view(np.uint8)  # same table as raw byte values
_COMP = {
    "A": "T", "T": "A", "C": "G", "G": "C",
    "R": "Y", "Y": "R", "S": "S", "W": "W", "K": "M", "M": "K",
    "B": "V", "V": "B", "D": "H", "H": "D", "N": "N", "-": "-", "x": "x",
}
COMP_TABLE = bytes(
    ord(_COMP.get(chr(c), "N")) if chr(c) in _COMP else c for c in range(256)
)


def nuc_from_code(code: int) -> str:
    return NUC_FROM_CODE[code].decode()


@dataclass
class NucMutation:
    """One nucleotide mutation record (1..6 bases)."""

    block_id: int
    nuc_position: int
    nuc_gap_position: int  # -1 when targeting the main nucleotide
    length: int
    codes: tuple  # new nucleotide codes, one per offset
    mut_type: int = 0  # panman NucMutationType (NS=0/ND=1/NI=2/NSNPS=3/...)


@dataclass
class BlockMutation:
    block_id: int
    is_insertion: bool  # blockMutInfo
    is_inversion: bool


@dataclass
class PanmanNode:
    identifier: str
    parent: "PanmanNode | None" = None
    children: list = field(default_factory=list)
    branch_length: float = 0.0
    block_mutations: list = field(default_factory=list)
    nuc_mutations: list = field(default_factory=list)
    annotations: list = field(default_factory=list)
    dfs_index: int = -1


@dataclass
class Block:
    block_id: int
    consensus_codes: np.ndarray  # uint8 nucleotide codes (1..15), 0-terminator stripped


@dataclass
class GapList:
    block_id: int
    nuc_positions: np.ndarray
    nuc_gap_lengths: np.ndarray


class PanmanTree:
    """One tree of a PanMAN: topology + blocks + gaps + per-node mutations."""

    def __init__(self):
        self.root: PanmanNode | None = None
        self.all_nodes: dict[str, PanmanNode] = {}
        self.dfs_order: list[PanmanNode] = []
        self.blocks: list[Block] = []
        self.gaps: list[GapList] = []
        self.newick: str = ""

    # ------------------------------------------------------------------
    # Materialization (mirrors panmap_utils.cpp:7-190 getStringFromReference)
    # ------------------------------------------------------------------
    def path_from_root(self, identifier: str) -> list[PanmanNode]:
        node = self.all_nodes[identifier]
        path = []
        while node is not None:
            path.append(node)
            node = node.parent
        path.reverse()
        return path

    def get_string(self, identifier: str, aligned: bool = False) -> str:
        """Materialize a node's sequence (ungapped unless aligned=True)."""
        path = self.path_from_root(identifier)

        nblocks = len(self.blocks)
        # final block presence along the path (panmap_utils.cpp:29-43)
        block_on = np.zeros(nblocks + 1, dtype=bool)
        for node in path:
            for bm in node.block_mutations:
                if bm.is_insertion:
                    block_on[bm.block_id] = True
                elif not bm.is_inversion:
                    block_on[bm.block_id] = False

        # main-sequence chars per block (consensus + 'x' sentinel), gap arrays
        main: list[np.ndarray | None] = [None] * nblocks
        gaps_per_pos: list[dict | None] = [None] * nblocks
        for b in self.blocks:
            if block_on[b.block_id]:
                arr = np.concatenate(
                    [NUC_FROM_CODE[b.consensus_codes], np.frombuffer(b"x", dtype="S1")]
                ).copy()
                main[b.block_id] = arr
                gaps_per_pos[b.block_id] = {}
        for g in self.gaps:
            if block_on[g.block_id] and gaps_per_pos[g.block_id] is not None:
                gp = gaps_per_pos[g.block_id]
                for pos, ln in zip(g.nuc_positions.tolist(), g.nuc_gap_lengths.tolist()):
                    gp[int(pos)] = np.full(int(ln), b"-", dtype="S1")

        block_exists = np.zeros(nblocks, dtype=bool)
        block_strand = np.ones(nblocks, dtype=bool)

        for node in path:
            for bm in node.block_mutations:
                bid = bm.block_id
                if not block_on[bid]:
                    continue
                if bm.is_insertion:
                    block_exists[bid] = True
                    block_strand[bid] = not bm.is_inversion
                elif bm.is_inversion:
                    block_strand[bid] = not block_strand[bid]
                else:
                    block_exists[bid] = False
                    block_strand[bid] = True
            for nm in node.nuc_mutations:
                bid = nm.block_id
                if not block_on[bid] or main[bid] is None:
                    continue
                seq = main[bid]
                blen = len(seq)
                for i in range(nm.length):
                    if nm.nuc_gap_position == -1:
                        pos = nm.nuc_position + i
                        # skip sentinel & out-of-range (panmap_utils.cpp:121-125)
                        if pos >= blen - 1:
                            continue
                        seq[pos] = NUC_FROM_CODE[nm.codes[i]]
                    else:
                        pos = nm.nuc_position
                        if pos >= blen:
                            continue
                        gp = gaps_per_pos[bid]
                        garr = gp.get(pos)
                        gpos = nm.nuc_gap_position + i
                        if garr is None or gpos >= len(garr):
                            continue
                        garr[gpos] = NUC_FROM_CODE[nm.codes[i]]

        out = []
        for bid in range(nblocks):
            if not block_exists[bid]:
                if aligned and main[bid] is not None:
                    # inactive-but-decoded blocks contribute '-' runs in aligned mode
                    out.append(b"-" * (len(main[bid]) - 1))
                continue
            seq = main[bid]
            gp = gaps_per_pos[bid] or {}
            parts = []
            for pos in range(len(seq)):
                if pos in gp:
                    parts.append(gp[pos].tobytes())
                parts.append(seq[pos].tobytes())
            s = b"".join(parts)
            if block_strand[bid]:
                if aligned:
                    out.append(s.replace(b"x", b""))
                else:
                    out.append(s.replace(b"-", b"").replace(b"x", b""))
            else:
                rc = s.translate(COMP_TABLE)[::-1]
                if aligned:
                    out.append(rc.replace(b"x", b""))
                else:
                    out.append(rc.replace(b"-", b"").replace(b"x", b""))
        return b"".join(out).decode()


# ----------------------------------------------------------------------
# Newick parsing (names, including internal labels, are stored verbatim)
# ----------------------------------------------------------------------
def parse_newick(newick: str) -> PanmanNode:
    """Parse a newick string into PanmanNode topology (preorder dfs matches the
    capnp nodes list order used by the panman writer)."""
    s = newick.strip()
    if s.endswith(";"):
        s = s[:-1]
    pos = 0

    def parse_node(parent):
        nonlocal pos
        node = PanmanNode(identifier="", parent=parent)
        if pos < len(s) and s[pos] == "(":
            pos += 1
            while True:
                child = parse_node(node)
                node.children.append(child)
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                break
            assert s[pos] == ")", f"newick parse error at {pos}"
            pos += 1
        # label
        start = pos
        while pos < len(s) and s[pos] not in ",():;":
            pos += 1
        node.identifier = s[start:pos]
        if pos < len(s) and s[pos] == ":":
            pos += 1
            start = pos
            while pos < len(s) and s[pos] not in ",()":
                pos += 1
            node.branch_length = float(s[start:pos])
        return node

    root = parse_node(None)
    assert pos == len(s), f"trailing newick content at {pos}"
    return root


def _decode_consensus(words: np.ndarray) -> np.ndarray:
    """Unpack 8 4-bit codes per u32 (big-nibble-first), stop at first 0 code."""
    w = words.astype(np.uint32)
    shifts = np.arange(7, -1, -1, dtype=np.uint32) * 4
    codes = ((w[:, None] >> shifts[None, :]) & 0xF).astype(np.uint8).reshape(-1)
    zeros = np.flatnonzero(codes == 0)
    if len(zeros):
        codes = codes[: zeros[0]]
    return codes


def _decode_nucmut(st, block_id: int) -> NucMutation:
    pos = st.i32(0)
    gap_pos = st.i32(4)
    packed = st.u32(12)
    mut_info = packed & 0xFF
    length = mut_info >> 4
    # nibble i (offset i within the run) sits at bits 8+4*(length-1-i) of the packed
    # word: the first base of the run occupies the highest used nibble.
    codes = tuple((packed >> (8 + 4 * (length - 1 - i))) & 0xF for i in range(length))
    gap_exist = bool(st.u8(8) & 1)
    return NucMutation(
        block_id=block_id,
        nuc_position=pos,
        nuc_gap_position=gap_pos if gap_exist else -1,
        length=length,
        codes=codes,
        mut_type=mut_info & 0x7,
    )


def load_panman(path: str, tree_index: int = 0) -> PanmanTree:
    with lzma.open(path, "rb") as fh:
        data = fh.read()
    msg = CapnpMessage(data)
    tg = msg.root()
    trees = tg.ptr(0)
    t = trees.struct(tree_index)

    tree = PanmanTree()
    tree.newick = t.text(0)
    tree.root = parse_newick(tree.newick)

    # preorder DFS; must match writer's node order
    stack = [tree.root]
    order = []
    while stack:
        node = stack.pop()
        node.dfs_index = len(order)
        order.append(node)
        tree.all_nodes[node.identifier] = node
        stack.extend(reversed(node.children))
    tree.dfs_order = order

    # The writer emits one record per node in DFS preorder plus one trailing empty
    # record (observed in every v0.1.4 file; the extra record carries no mutations).
    nodes = t.ptr(1)
    assert len(nodes) in (len(order), len(order) + 1), (
        f"{len(nodes)} capnp nodes vs {len(order)} newick nodes"
    )
    for i, node in enumerate(order):
        nrec = nodes.struct(i)
        muts = nrec.ptr(0)
        if muts is not None:
            for m in muts.structs():
                # blockId packs (primaryBlockId << 32 | secondary); secondary is
                # retired in panmap (always 0/none), keep the primary
                block_id = m.i64(0) >> 32
                flags = m.u8(8)
                if flags & 2:  # blockMutExist
                    node.block_mutations.append(
                        BlockMutation(
                            block_id=block_id,
                            is_insertion=bool(flags & 4),
                            is_inversion=bool(flags & 8),
                        )
                    )
                nm_list = m.ptr(0)
                if nm_list is not None:
                    for s in nm_list.structs():
                        node.nuc_mutations.append(_decode_nucmut(s, block_id))
        ann = nrec.ptr(1)
        if ann is not None and ann.count:
            for j in range(ann.count):
                p = ann.ptr(j)
                if p is not None:
                    raw = bytes(p.raw_bytes())
                    node.annotations.append(raw[:-1].decode() if raw else "")

    # consensus blocks
    cmap = t.ptr(2)
    blocks: dict[int, Block] = {}
    if cmap is not None:
        for e in cmap.structs():
            block_ids = e.ptr(0).as_numpy("<u8") >> np.uint64(32)
            codes = _decode_consensus(e.ptr(1).as_numpy("<u4"))
            for bid in block_ids.tolist():
                blocks[int(bid)] = Block(block_id=int(bid), consensus_codes=codes)
    tree.blocks = [blocks[k] for k in sorted(blocks)]

    gaps = t.ptr(3)
    if gaps is not None and gaps.count:
        for g in gaps.structs():
            bid = g.i64(0) >> 32
            # wire order: ptr0 = nucGapLength, ptr1 = nucPosition
            lenl = g.ptr(0)
            posl = g.ptr(1)
            tree.gaps.append(
                GapList(
                    block_id=bid,
                    nuc_positions=posl.as_numpy("<i4") if posl is not None else np.empty(0, "<i4"),
                    nuc_gap_lengths=lenl.as_numpy("<i4") if lenl is not None else np.empty(0, "<i4"),
                )
            )
    return tree
