"""Degapped-coordinate tracking for pseudochain scoring.

GapTracker replays the meta index's per-node gap events (character gap-ness
flips + block presence/strand changes) and must reproduce, at every node, the
reference getLocalGap semantics: the count of non-gap columns of the node's
alignment between two reading scalars.  The oracle observes the LIVE builder
state via run_dfs's state_probe and recomputes counts from first principles
(reading-order scan of present blocks), sharing no code with the tracker."""

import os
import shutil

import numpy as np
import pytest

from panmap_tpu.index.builder import GAP, IndexParams, run_dfs
from panmap_tpu.io.panman import load_panman
from panmap_tpu.meta.engine import GapTracker
from panmap_tpu.meta.index import build_meta_index

DATA = "/root/reference/src/test/data"
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache")

pytestmark = pytest.mark.e2e  # builds the rsv meta index (covers real
# block insertions/deletions/inversions: 6114/7448/93 events)


def _truth_F(bits_nongap, present, strand, block_lo, block_hi, x):
    """Ground-truth F(x): non-gap present columns at reading scalars <= x,
    via an explicit reading-order scan (independent formulation)."""
    total = 0
    for b in range(len(block_lo)):
        if not present[b]:
            continue
        lo, hi = int(block_lo[b]), int(block_hi[b])
        if hi < 0:
            continue
        if x >= hi:
            total += int(bits_nongap[lo:hi + 1].sum())
        elif x >= lo:
            # reading scalar r inside block b corresponds to forward
            # column r (strand+) or lo+hi-r (strand-); reading scalars
            # <= x within the block are [lo..x]
            if strand[b]:
                total += int(bits_nongap[lo:x + 1].sum())
            else:
                fx = lo + hi - x
                total += int(bits_nongap[fx:hi + 1].sum())
        # blocks entirely after x contribute 0
        if lo > x:
            break
    return total


def test_gap_tracker_matches_builder_state(tmp_path):
    panman = tmp_path / "rsv_4K.panman"
    shutil.copy(f"{DATA}/rsv_4K.panman", panman)
    tree = load_panman(str(panman))
    params = IndexParams()

    midx_path = os.path.join(CACHE, "rsv4k.ptmidx.npz")
    from panmap_tpu.meta.index import load_meta_index, save_meta_index

    try:
        midx = load_meta_index(midx_path)
        if len(midx.node_ids) != len(tree.dfs_order):
            raise RuntimeError
    except Exception:
        midx = build_meta_index(tree, params)
        save_meta_index(midx_path, midx)

    # sample nodes spread across the DFS; snapshot live builder state there
    n_nodes = len(tree.dfs_order)
    rng = np.random.default_rng(5)
    sample = set(rng.choice(n_nodes, size=60, replace=False).tolist())
    sample.add(0)
    snaps = {}

    def probe(dfs_index, chars, block_exists, block_strand):
        if dfs_index in sample:
            snaps[dfs_index] = ((chars != GAP).copy(), block_exists.copy(),
                                block_strand.copy())

    run_dfs(tree, params, lambda *a: None, state_probe=probe)
    assert len(snaps) == len(sample)

    # replay the tracker over the same DFS; at sampled nodes compare
    # local_gap against the oracle for random position pairs
    gap = GapTracker(midx)
    children: list = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[int(midx.parent_index[i])].append(i)
    checked = 0
    stack = [(0, False, None)]
    while stack:
        node, done, undo = stack.pop()
        if done:
            gap.leave(undo)
            continue
        undo = gap.enter(node)
        if node in snaps:
            bits, exists, strand = snaps[node]
            # candidate reading scalars: non-gap columns of present blocks
            pres_col = np.zeros(len(bits), bool)
            rd_of = np.arange(len(bits))
            for b in np.flatnonzero(exists):
                lo, hi = int(midx.block_lo[b]), int(midx.block_hi[b])
                pres_col[lo:hi + 1] = bits[lo:hi + 1]
                if not strand[b]:
                    # reading scalar of forward col f is lo+hi-f
                    seg = rd_of[lo:hi + 1]
                    rd_of[lo:hi + 1] = lo + hi - seg
            cand_fwd = np.flatnonzero(pres_col)
            if len(cand_fwd) < 2:
                stack.append((node, True, undo))
                for c in reversed(children[node]):
                    stack.append((c, False, None))
                continue
            pick = rng.choice(len(cand_fwd), size=min(12, len(cand_fwd)),
                              replace=False)
            rpos = rd_of[cand_fwd[pick]]
            for i2 in range(0, len(rpos) - 1, 2):
                a, b2 = int(rpos[i2]), int(rpos[i2 + 1])
                want = abs(
                    _truth_F(bits, exists, strand, midx.block_lo,
                             midx.block_hi, b2)
                    - _truth_F(bits, exists, strand, midx.block_lo,
                               midx.block_hi, a))
                got = gap.local_gap(a, b2)
                assert got == want, (node, a, b2, got, want)
                checked += 1
        stack.append((node, True, undo))
        for c in reversed(children[node]):
            stack.append((c, False, None))
    assert checked > 200


def test_pseudochain_deletion_spanning(tmp_path):
    """--pseudochain chain mechanics end-to-end on rsv: a read spanning a
    small deletion (|qgap-rgap| < 50) scores both chains; a read spanning a
    large deletion scores only its longest chain; rgap is degapped through
    GapTracker (mgsr.cpp:5312-5388 + getLocalGap)."""
    from panmap_tpu.io.index_io import load_index
    from panmap_tpu.meta.engine import MetaScorer, sketch_meta_reads_full
    from panmap_tpu.meta.index import load_meta_index

    midx = load_meta_index(os.path.join(CACHE, "rsv4k.ptmidx.npz"))
    panman = tmp_path / "rsv_4K.panman"
    shutil.copy(f"{DATA}/rsv_4K.panman", panman)
    tree = load_panman(str(panman))
    leaf = "MZ515733.1"
    g = tree.get_string(leaf)
    x = 5000
    read_small_del = g[x:x + 300] + g[x + 330:x + 630]    # 30bp deletion
    read_large_del = g[x:x + 300] + g[x + 800:x + 1100]   # 500bp deletion
    read_clean = g[x:x + 600]
    seqs = [read_clean, read_small_del, read_large_del]
    p = midx.params
    reads, dup_index, _ = sketch_meta_reads_full(seqs, p.k, p.s, p.t, p.l,
                                                 p.open)
    scorer = MetaScorer(midx, reads)
    node_idx = midx.node_ids.index(leaf)
    ms, snap = scorer.score_all_pseudo([node_idx])
    at_leaf = snap[0]
    # dup_index maps unique set -> original read indices; invert it
    uniq_of = {}
    for u, members in enumerate(dup_index):
        for m in members:
            uniq_of[int(m)] = u
    sc = {i: int(at_leaf[uniq_of[i]]) for i in range(3)}
    n_clean, n_small, n_large = sc[0], sc[1], sc[2]
    assert n_clean > 10
    # small deletion: both chains colinear -> nearly the clean score
    assert n_small > 0.7 * n_clean, (n_small, n_clean)
    # large deletion: colinearity rejected -> at most one side's chain
    assert n_large < 0.75 * n_small, (n_large, n_small)


def test_pseudochain_native_matches_python(tmp_path):
    """The threaded native pseudochain core must be bit-equal to the python
    oracle (max scores and candidate snapshots) on mixed-leaf reads with
    insertions/deletions/reversals in the query set."""
    import numpy as np

    from panmap_tpu.meta.engine import MetaScorer, sketch_meta_reads_full
    from panmap_tpu.meta.index import load_meta_index
    from panmap_tpu.native import get_lib
    from panmap_tpu.sketch.cpu import reverse_complement

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    midx = load_meta_index(os.path.join(CACHE, "rsv4k.ptmidx.npz"))
    panman = tmp_path / "rsv_4K.panman"
    shutil.copy(f"{DATA}/rsv_4K.panman", panman)
    tree = load_panman(str(panman))
    g = tree.get_string("MZ515733.1")
    g2 = tree.get_string("MZ515704.1")
    rng = __import__("random").Random(7)
    seqs = []
    for src in (g, g2):
        for i in range(0, len(src) - 400, 977):
            r = src[i:i + 400]
            roll = rng.random()
            if roll < 0.25:
                r = r[:150] + r[180:]          # deletion
            elif roll < 0.5:
                r = r[:200] + "ACGTAC" * 5 + r[200:]  # insertion
            elif roll < 0.7:
                r = reverse_complement(r)
            seqs.append(r)
    p = midx.params
    reads, _, _ = sketch_meta_reads_full(seqs, p.k, p.s, p.t, p.l, p.open)
    scorer = MetaScorer(midx, reads)
    cands = [0, 17, 900, midx.node_ids.index("MZ515733.1"), 3999]
    # call the native path DIRECTLY so the test cannot silently degrade to
    # python-vs-python when the .so or the v3 index arrays are missing
    native = scorer._score_pseudo_native(cands, 50)
    assert native is not None, "native pseudochain core not exercised"
    ms_n, snap_n = native
    old = os.environ.get("PANMAP_TPU_NO_NATIVE")
    os.environ["PANMAP_TPU_NO_NATIVE"] = "1"
    try:
        ms_p, snap_p = scorer.score_all_pseudo(cands)
    finally:
        if old is None:
            os.environ.pop("PANMAP_TPU_NO_NATIVE", None)
        else:
            os.environ["PANMAP_TPU_NO_NATIVE"] = old
    assert np.array_equal(ms_n, ms_p)
    assert np.array_equal(snap_n, snap_p)
    assert ms_n.max() > 10  # non-trivial workload


def test_simple_scorer_native_matches_python(tmp_path):
    """pt_score_simple must be bit-equal to the python simple-mode DFS
    (max scores, candidate snapshots, AND the sparse node_scores stream the
    assignment replay consumes)."""
    import numpy as np

    from panmap_tpu.meta.engine import MetaScorer, sketch_meta_reads_full
    from panmap_tpu.meta.index import load_meta_index
    from panmap_tpu.native import get_lib
    from panmap_tpu.sketch.cpu import reverse_complement

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    midx = load_meta_index(os.path.join(CACHE, "rsv4k.ptmidx.npz"))
    panman = tmp_path / "rsv_4K.panman"
    shutil.copy(f"{DATA}/rsv_4K.panman", panman)
    tree = load_panman(str(panman))
    g = tree.get_string("MZ515733.1")
    g2 = tree.get_string("MZ515704.1")
    seqs = ([g[i:i + 150] for i in range(0, len(g) - 150, 31)]
            + [reverse_complement(g2[i:i + 140])
               for i in range(0, len(g2) - 140, 37)])
    p = midx.params
    reads, _, _ = sketch_meta_reads_full(seqs, p.k, p.s, p.t, p.l, p.open)
    scorer = MetaScorer(midx, reads)
    cands = [0, 17, 900, midx.node_ids.index("MZ515733.1"), 3999]
    native = scorer._score_simple_native(cands, True)
    assert native is not None, "native simple core not exercised"
    ms_n, snap_n, ns_n = native
    old = os.environ.get("PANMAP_TPU_NO_NATIVE")
    os.environ["PANMAP_TPU_NO_NATIVE"] = "1"
    try:
        ms_p, snap_p, ns_p = scorer.score_all(cands, collect_node_scores=True)
    finally:
        if old is None:
            os.environ.pop("PANMAP_TPU_NO_NATIVE", None)
        else:
            os.environ["PANMAP_TPU_NO_NATIVE"] = old
    assert np.array_equal(ms_n, ms_p)
    assert np.array_equal(snap_n, snap_p)
    assert ns_n == ns_p
    assert ms_n.max() > 10
