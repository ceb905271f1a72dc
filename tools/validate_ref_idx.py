#!/usr/bin/env python
"""Cross-validate a REFERENCE-BUILT .idx against our index builder.

Usage: python tools/validate_ref_idx.py <reference.idx> <panman> [k s t l]

Loads the reference index through the compatibility reader
(panmap_tpu/io/refidx.py), builds our own index from the same panman with
the same seeding parameters, and compares per node:
 - the DFS node-id sequence and parent indices,
 - the per-node multiset of (seed hash, parentCount, childCount) delta rows.

This is the strongest builder oracle available (VERDICT item 7 / SURVEY §7
step 3): the reference's own DFS emitted those rows.  Exit 0 = identical.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from panmap_tpu.index.builder import IndexParams, build_index  # noqa: E402
from panmap_tpu.io.panman import load_panman  # noqa: E402
from panmap_tpu.io.refidx import read_ref_index  # noqa: E402


def node_row_sets(idx):
    offs = idx.node_offsets.astype(np.int64)
    out = []
    for i in range(len(idx.node_ids)):
        a, b = int(offs[i]), int(offs[i + 1])
        rows = sorted(zip(idx.seed_hashes[a:b].tolist(),
                          idx.parent_counts[a:b].tolist(),
                          idx.child_counts[a:b].tolist()))
        out.append(rows)
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    ref_idx = read_ref_index(sys.argv[1])
    p = ref_idx.params
    print(f"[ref] {len(ref_idx.node_ids)} nodes, "
          f"{len(ref_idx.seed_hashes)} rows, k={p.k} s={p.s} t={p.t} "
          f"l={p.l} open={p.open} hpc={p.hpc}")
    tree = load_panman(sys.argv[2])
    ours = build_index(tree, IndexParams(k=p.k, s=p.s, t=p.t, l=p.l,
                                         open=p.open, hpc=p.hpc))
    print(f"[ours] {len(ours.node_ids)} nodes, {len(ours.seed_hashes)} rows")

    bad = 0
    if ref_idx.node_ids != ours.node_ids:
        print("MISMATCH: node id order differs")
        bad += 1
    if not np.array_equal(ref_idx.parent_index, ours.parent_index):
        print("MISMATCH: parent indices differ")
        bad += 1
    a_sets = node_row_sets(ref_idx)
    b_sets = node_row_sets(ours)
    diff_nodes = [i for i, (x, y) in enumerate(zip(a_sets, b_sets)) if x != y]
    if diff_nodes:
        bad += 1
        print(f"MISMATCH: {len(diff_nodes)} nodes differ; first 5:")
        for i in diff_nodes[:5]:
            only_ref = set(a_sets[i]) - set(b_sets[i])
            only_ours = set(b_sets[i]) - set(a_sets[i])
            print(f"  node {i} ({ref_idx.node_ids[i]}): "
                  f"ref-only {sorted(only_ref)[:3]} "
                  f"ours-only {sorted(only_ours)[:3]}")
    print("IDENTICAL" if bad == 0 else f"{bad} mismatch classes")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
