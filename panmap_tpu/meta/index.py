"""Metagenomic (mgsr) index: per-node positioned k-min-mer deltas.

The meta twin of the single-sample builder (reference: mgsrIndexBuilder,
src/mgsr.cpp:2624-4144): instead of hash-count deltas it records which
*positioned, oriented* k-min-mers appear/disappear at each node — what
per-read scoring and the EM consume.  It runs the same DFS as the single
builder (index/builder.py run_dfs) with a positional-diff emitter: a changed
hash/orientation at a kept position emits delete+add, matching the reference's
delta encoding (seedDeltaIndices + seedDeltaIsDeleted, index_lite.capnp:55-60).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from ..index.builder import IndexParams, run_dfs
from ..io.panman import PanmanTree


@dataclass
class MetaIndexArrays:
    """Flat meta index: positioned-seed table + per-node delta ranges (CSR)."""

    params: IndexParams
    node_ids: list
    parent_index: np.ndarray  # u32[N]
    seed_hash: np.ndarray  # u64[S]
    seed_rev: np.ndarray  # bool[S]
    seed_pos: np.ndarray  # i64[S]
    delta_seed: np.ndarray  # i32[D] indices into the seed table
    delta_is_del: np.ndarray  # bool[D]
    node_offsets: np.ndarray  # i64[N+1]


def build_meta_index(tree: PanmanTree, params: IndexParams | None = None,
                     progress=None) -> MetaIndexArrays:
    params = params or IndexParams()
    n_nodes = len(tree.dfs_order)
    node_deltas: list[list] = [[] for _ in range(n_nodes)]

    seed_key_to_id: dict = {}
    seed_rows: list = []

    def seed_id(pos: int, h: int, rev: bool) -> int:
        key = (pos, h, rev)
        sid = seed_key_to_id.get(key)
        if sid is None:
            sid = len(seed_rows)
            seed_key_to_id[key] = sid
            seed_rows.append(key)
        return sid

    def emit(dfs_index, parent_state, child_state, changed):
        if not changed:
            return
        p_hash, p_rev, p_pos = parent_state[5], parent_state[6], parent_state[7]
        c_hash, c_rev, c_pos = child_state[5], child_state[6], child_state[7]
        out = node_deltas[dfs_index]
        i = j = 0
        np_, nc = len(p_pos), len(c_pos)
        while i < np_ or j < nc:
            if j >= nc or (i < np_ and p_pos[i] < c_pos[j]):
                out.append((seed_id(int(p_pos[i]), int(p_hash[i]), bool(p_rev[i])), True))
                i += 1
            elif i >= np_ or c_pos[j] < p_pos[i]:
                out.append((seed_id(int(c_pos[j]), int(c_hash[j]), bool(c_rev[j])), False))
                j += 1
            else:
                if p_hash[i] != c_hash[j] or p_rev[i] != c_rev[j]:
                    out.append((seed_id(int(p_pos[i]), int(p_hash[i]), bool(p_rev[i])), True))
                    out.append((seed_id(int(c_pos[j]), int(c_hash[j]), bool(c_rev[j])), False))
                i += 1
                j += 1

    run_dfs(tree, params, emit, progress)

    total = sum(len(d) for d in node_deltas)
    delta_seed = np.empty(total, dtype=np.int32)
    delta_is_del = np.empty(total, dtype=bool)
    node_offsets = np.zeros(n_nodes + 1, dtype=np.int64)
    off = 0
    for i, d in enumerate(node_deltas):
        node_offsets[i] = off
        for sid, isdel in d:
            delta_seed[off] = sid
            delta_is_del[off] = isdel
            off += 1
    node_offsets[n_nodes] = off

    parent_index = np.zeros(n_nodes, dtype=np.uint32)
    for node in tree.dfs_order:
        parent_index[node.dfs_index] = node.parent.dfs_index if node.parent else 0

    return MetaIndexArrays(
        params=params,
        node_ids=[n.identifier for n in tree.dfs_order],
        parent_index=parent_index,
        seed_hash=np.array([r[1] for r in seed_rows], dtype=np.uint64),
        seed_rev=np.array([r[2] for r in seed_rows], dtype=bool),
        seed_pos=np.array([r[0] for r in seed_rows], dtype=np.int64),
        delta_seed=delta_seed,
        delta_is_del=delta_is_del,
        node_offsets=node_offsets,
    )


META_FORMAT_VERSION = 1


def save_meta_index(path: str, idx: MetaIndexArrays):
    header = {
        "format_version": META_FORMAT_VERSION,
        "k": idx.params.k, "s": idx.params.s, "t": idx.params.t,
        "l": idx.params.l, "open": idx.params.open, "hpc": idx.params.hpc,
        "flank_mask_bp": idx.params.flank_mask_bp,
    }
    np.savez(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        node_ids=np.frombuffer("\n".join(idx.node_ids).encode(), dtype=np.uint8),
        parent_index=idx.parent_index,
        seed_hash=idx.seed_hash,
        seed_rev=idx.seed_rev,
        seed_pos=idx.seed_pos,
        delta_seed=idx.delta_seed,
        delta_is_del=idx.delta_is_del,
        node_offsets=idx.node_offsets,
    )


def read_meta_params(path: str) -> dict:
    with np.load(path) as z:
        return json.loads(bytes(z["header"]).decode())


def load_meta_index(path: str) -> MetaIndexArrays:
    z = np.load(path)
    header = json.loads(bytes(z["header"]).decode())
    if header.get("format_version") != META_FORMAT_VERSION:
        raise RuntimeError("Meta index format mismatch; rebuild the .ptmidx")
    params = IndexParams(
        k=header["k"], s=header["s"], t=header["t"], l=header["l"],
        open=header["open"], hpc=header["hpc"],
        flank_mask_bp=header["flank_mask_bp"],
    )
    return MetaIndexArrays(
        params=params,
        node_ids=bytes(z["node_ids"]).decode().split("\n"),
        parent_index=z["parent_index"],
        seed_hash=z["seed_hash"],
        seed_rev=z["seed_rev"],
        seed_pos=z["seed_pos"],
        delta_seed=z["delta_seed"],
        delta_is_del=z["delta_is_del"],
        node_offsets=z["node_offsets"],
    )
