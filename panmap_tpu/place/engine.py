"""Placement scoring engine — exact (float64) parity path.

Computes the reference's five per-node similarity metrics from the index's
per-node seed-count delta rows (src/placement.cpp:242-345 computeChildMetrics,
src/placement.hpp:108-155 NodeMetrics) as array programs:

 - per-row metric deltas are vectorized over the whole row table;
 - per-node totals accumulate parent->child down the DFS with the same
   sequential f64 addition order as the reference's BFS (row order within a
   node is the on-disk hash-sorted order, matching the index writer).

Best-node / tie selection follows the tolerance rule of src/placement.cpp:355-401:
tolerance = max(best * 1e-4, 1e-9); ties resolve to the lowest DFS index.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from ..index.builder import IndexArrays
from ..sketch.cpu import U64, read_kminmer_counts, rol

METRICS = ("log_raw", "log_cosine", "containment", "weighted_containment", "log_containment")


def homopolymer_hashes(k: int) -> list[int]:
    """Canonical hashes of all-A/C/G/T k-mers (src/placement.cpp:41-76)."""
    from ..sketch.cpu import _HASH_A, _HASH_C, _HASH_G, _HASH_T

    vals = {"A": _HASH_A, "C": _HASH_C, "G": _HASH_G, "T": _HASH_T}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for base in "ACGT":
        f = np.uint64(0)
        r = np.uint64(0)
        for i in range(k):
            f ^= rol(vals[base], k - i - 1)
            r ^= rol(vals[comp[base]], k - i - 1)
        out.append(int(min(f, r)))
    return out


@dataclass
class ReadSketch:
    """Read-side seed statistics (PlacementGlobalState equivalent)."""

    seed_freq: dict  # hash -> read count (pre-filtering)
    sorted_hashes: np.ndarray = field(default_factory=lambda: np.empty(0, U64))
    log_counts: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    read_unique_seed_count: int = 0
    total_read_seed_frequency: int = 0
    log_read_magnitude: float = 0.0
    log_containment_denominator: float = 0.0
    min_support: int = 1
    total_reads: int = 0


def _sketch_reads_py(seqs: list, k: int, s: int, t: int, l: int, open_: bool,
                     dedup_reads: bool = False, trim_start: int = 0,
                     trim_end: int = 0) -> dict:
    """Pure-Python seedFreqInReads (count-exact oracle for the native path)."""
    uniq = Counter(seqs)
    useqs = list(uniq.keys())
    mult = None if dedup_reads else [uniq[x] for x in useqs]
    return read_kminmer_counts(useqs, k, s, t, l, open_, mult, trim_start, trim_end)


def sketch_reads(seqs: list, k: int, s: int, t: int, l: int, open_: bool,
                 dedup_reads: bool = False, trim_start: int = 0, trim_end: int = 0,
                 hpc: bool = False):
    """seedFreqInReads: canonical k-min-mer counts over deduplicated reads.
    Returns a (hashes u64, counts i64) pair from the threaded native sketcher
    when available, else a dict (both accepted by prepare_read_sketch)."""
    if hpc:
        from ..sketch.cpu import hpc_compress

        seqs = [hpc_compress(x) for x in seqs]
    if dedup_reads:
        seqs = list(Counter(seqs).keys())
        dedup_reads = False  # already collapsed to one copy per unique read
    from ..native import sketch_count_native

    res = sketch_count_native(seqs, k, s, t, bool(open_), l,
                              trim_start=trim_start, trim_end=trim_end)
    if res is not None:
        return res[0], res[1].astype(np.int64)
    return _sketch_reads_py(seqs, k, s, t, l, open_, dedup_reads,
                            trim_start, trim_end)


def sketch_reads_quality(seqs: list, quals: list, k: int, s: int, t: int,
                         l: int, open_: bool, min_seed_quality: float,
                         trim_start: int = 0, trim_end: int = 0) -> dict:
    """Quality-filtered sketch (--min-seed-quality; placement.cpp:1388-1545):
    a syncmer passes when the mean Phred over its k-mer reaches the threshold
    and its start is inside the primer-trim range; a k-min-mer counts only
    when all l member syncmers pass."""
    from ..sketch.cpu import kminmer_hashes_oriented, syncmer_list

    freq: dict = {}
    for seq, qual in zip(seqs, quals):
        pos, H, rev = syncmer_list(seq, k, s, open_, t)
        if len(H) < l:
            continue
        q = np.frombuffer(qual.encode(), dtype=np.uint8).astype(np.float64) - 33.0
        cq = np.concatenate(([0.0], np.cumsum(q)))
        lo = trim_start
        hi = len(seq) - trim_end - k
        passes = np.empty(len(pos), dtype=bool)
        for j, p in enumerate(pos):
            avg = (cq[min(p + k, len(q))] - cq[p]) / k
            passes[j] = lo <= p <= hi and avg >= min_seed_quality
        if l == 1:
            for h, ok in zip(H.tolist(), passes.tolist()):
                if ok:
                    freq[h] = freq.get(h, 0) + 1
            continue
        km, valid, _ = kminmer_hashes_oriented(H, k, l, rev)
        win_ok = np.ones(len(km), dtype=bool)
        for j in range(l):
            win_ok &= passes[j : j + len(km)]
        for h in km[valid & win_ok].tolist():
            freq[h] = freq.get(h, 0) + 1
    return freq


def resolve_min_read_support(seed_freq: dict, configured: int) -> int:
    """Auto min-read-support from estimated coverage (src/placement.cpp:931-955)."""
    if configured >= 0:
        return configured
    s = 0
    n = 0
    for cnt in seed_freq.values():
        if cnt >= 2:
            s += cnt
            n += 1
    est = s / n if n else 0.0
    return 2 if est > 3.0 else 1


def prepare_read_sketch(seed_freq, k: int, total_reads: int,
                        min_read_support: int = -1,
                        seed_mask_fraction: float = 0.0) -> ReadSketch:
    """Homopolymer removal, optional top-fraction masking, magnitudes
    (src/placement.cpp:1703-1851, 957-984).  seed_freq is a dict or a
    (hashes u64, counts i64) pair from the native sketcher; masking uses the
    dict path (its tie-break follows dict insertion order)."""
    if isinstance(seed_freq, tuple) and seed_mask_fraction > 0.0:
        seed_freq = dict(zip(seed_freq[0].tolist(), seed_freq[1].tolist()))
    if isinstance(seed_freq, tuple):
        hashes, counts = seed_freq
        counts = counts.astype(np.int64, copy=False)
        homo = np.fromiter(homopolymer_hashes(k), dtype=U64)
        keep_h = ~np.isin(hashes, homo)
        hashes, counts = hashes[keep_h], counts[keep_h]
        sk = ReadSketch(seed_freq=None, total_reads=total_reads)
        if min_read_support >= 0:
            sk.min_support = min_read_support
        else:
            big = counts >= 2
            n = int(big.sum())
            est = float(counts[big].sum()) / n if n else 0.0
            sk.min_support = 2 if est > 3.0 else 1
    else:
        seed_freq = dict(seed_freq)
        for h in homopolymer_hashes(k):
            seed_freq.pop(h, None)

        if seed_mask_fraction > 0.0 and seed_freq:
            n_mask = int(seed_mask_fraction * len(seed_freq))
            if n_mask > 0:
                by_freq = sorted(seed_freq.items(), key=lambda kv: -kv[1])
                for h, _ in by_freq[:n_mask]:
                    del seed_freq[h]

        sk = ReadSketch(seed_freq=seed_freq, total_reads=total_reads)
        sk.min_support = resolve_min_read_support(seed_freq, min_read_support)

        hashes = np.fromiter(seed_freq.keys(), dtype=U64, count=len(seed_freq))
        counts = np.fromiter(seed_freq.values(), dtype=np.int64, count=len(seed_freq))
    sk.total_read_seed_frequency = int(counts.sum()) if len(counts) else 0
    order = np.argsort(hashes)
    hashes, counts = hashes[order], counts[order]
    keep = counts >= sk.min_support
    sk.sorted_hashes = hashes[keep]
    sk.log_counts = np.log1p(counts[keep].astype(np.float64))
    sk.read_unique_seed_count = int(keep.sum())
    sk.log_read_magnitude = math.sqrt(float(np.sum(sk.log_counts * sk.log_counts)))
    sk.log_containment_denominator = float(np.sum(sk.log_counts))
    return sk


@dataclass
class PlacementScores:
    """Per-node metric scores + best/tie selections."""

    scores: np.ndarray  # f64[N,5], metric order = METRICS
    best_index: dict = field(default_factory=dict)  # metric -> dfs index
    best_score: dict = field(default_factory=dict)
    tied_indices: dict = field(default_factory=dict)  # metric -> sorted list


def score_nodes(index: IndexArrays, sk: ReadSketch, force_leaf: bool = False,
                skip_node_index: int | None = None) -> PlacementScores:
    H = index.seed_hashes
    P = index.parent_counts.astype(np.int64)
    C = index.child_counts.astype(np.int64)
    n_nodes = len(index.node_offsets) - 1
    offs = index.node_offsets.astype(np.int64)

    # hash -> logReadCount lookup over the sorted read table
    if len(sk.sorted_hashes):
        ii = np.searchsorted(sk.sorted_hashes, H)
        ii_c = np.minimum(ii, len(sk.sorted_hashes) - 1)
        found = sk.sorted_hashes[ii_c] == H
        lrc = np.where(found, sk.log_counts[ii_c], 0.0)
    else:
        found = np.zeros(len(H), dtype=bool)
        lrc = np.zeros(len(H))

    log_child = np.where(C > 0, np.log1p(C.astype(np.float64)), 0.0)
    log_parent = np.where(P > 0, np.log1p(P.astype(np.float64)), 0.0)

    mag_delta = log_child * log_child - log_parent * log_parent
    uniq_delta = (C > 0).astype(np.int64) - (P > 0).astype(np.int64)

    active = ((C - P) != 0) & found
    became_present = ((P == 0) & (C != 0)).astype(np.int64)
    became_absent = ((C == 0) & (P != 0)).astype(np.int64)
    presence_delta = np.where(active, became_present - became_absent, 0)

    with np.errstate(divide="ignore", invalid="ignore"):
        old_contrib = np.where(P > 0, lrc / P, 0.0)
        new_contrib = np.where(C > 0, lrc / C, 0.0)
        old_wc = np.where(P > 0, 1.0 / P, 0.0)
        new_wc = np.where(C > 0, 1.0 / C, 0.0)
    lograw_delta = np.where(active, new_contrib - old_contrib, 0.0)
    logcos_delta = np.where(active, lrc * (log_child - log_parent), 0.0)
    wc_delta = np.where(active, new_wc - old_wc, 0.0)
    logcont_delta = presence_delta * lrc

    # weighted-containment denominator from the root's rows, in stored order
    # (src/placement.cpp:1861-1876)
    root_rows = slice(int(offs[0]), int(offs[1]))
    root_mask = (C[root_rows] > 0) & found[root_rows]
    wc_den = float(np.cumsum(np.where(root_mask, new_wc[root_rows], 0.0))[-1]) if offs[1] > offs[0] else 0.0

    # accumulate parent->child with sequential f64 adds (reference add order)
    f64_metrics = (mag_delta, lograw_delta, logcos_delta, wc_delta, logcont_delta)
    int_metrics = (uniq_delta, presence_delta)
    parent = index.parent_index
    from ..native import tree_accumulate_native

    acc = tree_accumulate_native(list(f64_metrics), list(int_metrics),
                                 offs, parent)
    if acc is not None:
        acc_f, acc_i = acc
    else:
        acc_f = np.zeros((n_nodes, len(f64_metrics)))
        acc_i = np.zeros((n_nodes, len(int_metrics)), dtype=np.int64)
        for i in range(n_nodes):
            a, b = int(offs[i]), int(offs[i + 1])
            p = int(parent[i]) if i else None
            if p is None:
                base_f = np.zeros(len(f64_metrics))
                base_i = np.zeros(len(int_metrics), dtype=np.int64)
            else:
                base_f = acc_f[p]
                base_i = acc_i[p]
            if a == b:
                acc_f[i] = base_f
                acc_i[i] = base_i
                continue
            for m, arr in enumerate(f64_metrics):
                acc_f[i, m] = np.cumsum(np.concatenate(([base_f[m]], arr[a:b])))[-1]
            for m, arr in enumerate(int_metrics):
                acc_i[i, m] = base_i[m] + arr[a:b].sum()

    genome_mag_sq = acc_f[:, 0]
    lograw_num = acc_f[:, 1]
    logcos_num = acc_f[:, 2]
    wc_num = acc_f[:, 3]
    logcont_num = acc_f[:, 4]
    presence = acc_i[:, 1].astype(np.float64)

    lrm = sk.log_read_magnitude
    genome_mag = np.sqrt(np.maximum(genome_mag_sq, 0.0))
    scores = np.zeros((n_nodes, 5))
    if lrm > 0:
        scores[:, 0] = lograw_num / lrm
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(genome_mag > 0, logcos_num / (lrm * genome_mag), 0.0)
        scores[:, 1] = np.clip(cos, 0.0, 1.0)
    if sk.read_unique_seed_count > 0:
        scores[:, 2] = presence / sk.read_unique_seed_count
    if wc_den > 0:
        scores[:, 3] = wc_num / wc_den
    if sk.log_containment_denominator > 0:
        scores[:, 4] = logcont_num / sk.log_containment_denominator

    return select_best(scores, parent, force_leaf=force_leaf,
                       skip_node_index=skip_node_index)


def select_best(scores: np.ndarray, parent_index: np.ndarray,
                force_leaf: bool = False,
                skip_node_index: int | None = None) -> PlacementScores:
    """Tolerance-aware best/tie selection over a [N,5] score matrix
    (src/placement.cpp:355-401); shared by the f64 engine and the TPU path."""
    n_nodes = scores.shape[0]
    result = PlacementScores(scores=scores)
    eligible = np.ones(n_nodes, dtype=bool)
    if skip_node_index is not None:
        eligible[skip_node_index] = False
    if force_leaf:
        is_parent = np.zeros(n_nodes, dtype=bool)
        is_parent[parent_index[1:]] = True
        eligible &= ~is_parent

    for m, name in enumerate(METRICS):
        col = np.where(eligible, scores[:, m], -np.inf)
        best = float(col.max()) if n_nodes else 0.0
        tol = max(best * 1e-4, 1e-9)
        tied = np.flatnonzero((col >= best - tol) & (col > 0))
        result.best_score[name] = best if best > -np.inf else 0.0
        result.tied_indices[name] = tied.tolist()
        result.best_index[name] = int(tied[0]) if len(tied) else None
    return result


def write_placement_tsv(path: str, index: IndexArrays, res: PlacementScores):
    """.placement.tsv writer (src/placement.cpp:1952-2009 format)."""
    with open(path, "w") as fh:
        fh.write("metric\tscore\tnodes\n")
        for name in METRICS:
            score = res.best_score[name]
            tied = res.tied_indices[name]
            ids = ",".join(index.node_ids[i] for i in tied)
            fh.write(f"{name}\t{score:.6f}\t{ids}\n")
