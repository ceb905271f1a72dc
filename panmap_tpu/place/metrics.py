"""The single definition site for the five placement metrics' row-delta math.

The reference maintains its metrics as per-row deltas streamed over each
node's SoA range (src/placement.cpp:242-345 computeChildMetrics; the metric
formulas live in the NodeMetrics getters, src/placement.hpp:108-155).  This
module is the one traced/vectorized body consumed by every scoring path:

 - place/engine.py       (numpy float64 — the byte-exact parity oracle)
 - place/engine_tpu.py   (jitted f32 device program)
 - place/query_tpu.py    (fused on-device sketch+score program)
 - parallel/mesh.py      (rows sharded over a device mesh, psum combine)

All four call ``row_metric_deltas`` with their own array namespace (``numpy``
or ``jax.numpy``); dtype follows the inputs, so the f64 oracle and the f32
device programs share one formula by construction.  ``finalize_scores`` is the
shared accumulator->score division, and ``euler_prefix`` the shared
ancestor-accumulation (the device replacement for the reference's
level-synchronous BFS, src/placement.cpp:701-918).

ACCUMULATOR ORDER (axis 1 of everything downstream):
  0 genome-magnitude^2   1 logRaw numerator   2 logCosine numerator
  3 weightedContainment numerator             4 logContainment numerator
  5 presence (containment numerator)
"""

from __future__ import annotations

METRICS = ("log_raw", "log_cosine", "containment", "weighted_containment",
           "log_containment")

N_ACC = 6  # accumulator columns (see module docstring)


def row_metric_deltas(xp, lrc, P, C, found):
    """Per-row metric deltas (placement.cpp:242-345).

    xp     numpy or jax.numpy — selects host-f64 vs traced-f32 execution
    lrc    float[T] log1p(read count) of the row's hash, 0 where not found
    P, C   float[T] parent/child seed counts of the row
    found  bool[T]  row hash present in the (filtered) read seed table

    Returns the 6 delta arrays in accumulator order.  Divisions guard with
    ``maximum(x, 1)`` instead of errstate so the same expression traces under
    jit; for P >= 1 the quotient is bit-identical to the unguarded division.
    """
    one = lrc.dtype.type(1.0) if hasattr(lrc.dtype, "type") else 1.0
    log_child = xp.where(C > 0, xp.log1p(C), 0.0)
    log_parent = xp.where(P > 0, xp.log1p(P), 0.0)
    mag_delta = log_child * log_child - log_parent * log_parent

    active = ((C - P) != 0) & found
    became_present = ((P == 0) & (C != 0)).astype(lrc.dtype)
    became_absent = ((C == 0) & (P != 0)).astype(lrc.dtype)
    presence_delta = xp.where(active, became_present - became_absent, 0.0)

    old_contrib = xp.where(P > 0, lrc / xp.maximum(P, one), 0.0)
    new_contrib = xp.where(C > 0, lrc / xp.maximum(C, one), 0.0)
    old_wc = xp.where(P > 0, 1.0 / xp.maximum(P, one), 0.0)
    new_wc = xp.where(C > 0, 1.0 / xp.maximum(C, one), 0.0)
    lograw_delta = xp.where(active, new_contrib - old_contrib, 0.0)
    logcos_delta = xp.where(active, lrc * (log_child - log_parent), 0.0)
    wc_delta = xp.where(active, new_wc - old_wc, 0.0)
    logcont_delta = presence_delta * lrc
    return (mag_delta, lograw_delta, logcos_delta, wc_delta, logcont_delta,
            presence_delta)


def wc_denominator(xp, lrc_root, C_root, found_root):
    """Weighted-containment denominator over the ROOT node's rows in stored
    order (src/placement.cpp:1861-1876).  The numpy path sums via cumsum so
    the f64 addition order is sequential, matching the reference's
    accumulation loop (np.sum is pairwise and can differ in the last bit)."""
    import numpy as _np

    one = lrc_root.dtype.type(1.0) if hasattr(lrc_root.dtype, "type") else 1.0
    inv = xp.where((C_root > 0) & found_root,
                   1.0 / xp.maximum(C_root, one), 0.0)
    if xp is _np:
        return _np.cumsum(inv)[-1] if len(inv) else 0.0
    return xp.sum(inv)


def row_node_sums(lrc, P, C, found, row_node, n_nodes):
    """Traced: stack the deltas and segment-sum them per node.  Used by every
    device path; the mesh path psums the result across row shards.  P/C may
    arrive as narrow integers (the index uploads counts as i16 to halve the
    transfer) — cast to the compute dtype here."""
    import jax
    import jax.numpy as jnp

    P = P.astype(lrc.dtype)
    C = C.astype(lrc.dtype)
    deltas = jnp.stack(row_metric_deltas(jnp, lrc, P, C, found), axis=1)
    # rows are CSR-grouped by node, so the segment ids are sorted — the
    # hint lets XLA lower a sorted scatter (measured 46 -> 30 ms/step on
    # the 2.4M-row sars index on v5e).  A prefix-difference formulation
    # would be 4x faster still but its f32 error over the multi-million-row
    # global cumsum reaches ~10 absolute on the accumulators (vs 1e-3 for
    # per-segment summation) — measured on the real workload and rejected.
    return jax.ops.segment_sum(deltas, row_node, num_segments=n_nodes,
                               indices_are_sorted=True)


class BlockSegments:
    """Static per-index structure for the blocked per-node reduction.

    row_node is FIXED per DeviceIndex, so every segment boundary is known on
    the host.  That turns the per-node sum into: one block-local cumsum
    (native XLA op — unlike the 2.4M-row sorted scatter it is HBM-speed and
    compiles in seconds), gathers at STATIC positions, a tiny segmented scan
    over the B block totals for segments spanning block boundaries, and one
    M-row scatter (M = #non-empty nodes, ~60x smaller than the row count).

    f32 error semantics: per-segment, bounded by the BLOCK-local cumsum
    magnitude (<= L rows) — measured ~25x tighter than the sorted scatter's
    own accumulation error at bench shapes, and far from the rejected
    global-cumsum prefix-difference (see row_node_sums note).
    """

    __slots__ = ("L", "B", "pad", "lastp", "base", "has_base", "spanning",
                 "seg_node", "eb_blk", "q_flat", "has_bnd", "n_rows")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def make_block_segments(row_node, n_nodes, L=1024):
    """Host: sorted row_node i32[T] -> BlockSegments (device-resident consts).

    Pad rows (to a block multiple) join the final segment; their metric
    deltas are zero-padded in row_node_sums_blocked so the absorption is
    inert — the same scheme the mesh pad uses (engine_tpu.py:104-108).
    """
    import numpy as np
    import jax.numpy as jnp

    T = len(row_node)
    B = max(-(-T // L), 1)
    pad = B * L - T
    rn_pad = np.concatenate([row_node,
                             np.full(pad, row_node[-1] if T else 0, np.int32)])
    lastp = np.nonzero(np.diff(rn_pad, append=np.int32(n_nodes)))[0]
    seg_node = rn_pad[lastp]
    eb_blk = lastp // L
    prev_end = np.concatenate(([-1], lastp[:-1]))
    has_base = (prev_end >= 0) & (prev_end // L == eb_blk)
    firstp = prev_end + 1
    spanning = (firstp // L) < eb_blk
    q = np.full(B, -1, np.int64)
    np.maximum.at(q, eb_blk, lastp % L)
    has_bnd = q >= 0
    q_flat = np.arange(B) * L + np.maximum(q, 0)
    return BlockSegments(
        L=L, B=B, pad=pad, n_rows=T,
        lastp=jnp.asarray(lastp.astype(np.int32)),
        base=jnp.asarray(np.where(has_base, prev_end, 0).astype(np.int32)),
        has_base=jnp.asarray(has_base),
        spanning=jnp.asarray(spanning),
        seg_node=jnp.asarray(seg_node.astype(np.int32)),
        eb_blk=jnp.asarray(eb_blk.astype(np.int32)),
        q_flat=jnp.asarray(q_flat.astype(np.int32)),
        has_bnd=jnp.asarray(has_bnd),
    )


def row_node_sums_blocked(lrc, P, C, found, blk: BlockSegments, n_nodes):
    """Traced: the blocked-cumsum twin of row_node_sums (same deltas, same
    per-segment f32 error class, no row-count-sized scatter).  Numerically it
    is NOT bit-identical to the scatter — both are f32 approximations of the
    f64 oracle and place_exact's guards budget either one; measured error vs
    f64 is ~25x SMALLER than the scatter's at bench shapes."""
    import jax
    import jax.numpy as jnp

    P = P.astype(lrc.dtype)
    C = C.astype(lrc.dtype)
    deltas = jnp.stack(row_metric_deltas(jnp, lrc, P, C, found), axis=1)
    K = deltas.shape[1]
    dp = jnp.pad(deltas, ((0, blk.pad), (0, 0)))
    cum = jnp.cumsum(dp.reshape(blk.B, blk.L, K), axis=1).reshape(-1, K)
    head = cum[blk.lastp] - jnp.where(blk.has_base[:, None], cum[blk.base],
                                      0.0)
    blk_tot = cum[blk.L - 1 :: blk.L]
    tail = blk_tot - jnp.where(blk.has_bnd[:, None], cum[blk.q_flat], 0.0)

    # inclusive segmented scan over block tails: run[b] = tail[b] + (boundary
    # in b ? 0 : run[b-1]); the carry INTO block b is then run[b-1]
    def comb(x, y):
        vx, fx = x
        vy, fy = y
        return jnp.where(fy[:, None], vy, vx + vy), fx | fy

    run, _ = jax.lax.associative_scan(comb, (tail, blk.has_bnd))
    carry = jnp.concatenate([jnp.zeros((1, K), deltas.dtype), run[:-1]])
    out_c = head + jnp.where(blk.spanning[:, None], carry[blk.eb_blk], 0.0)
    return jnp.zeros((n_nodes, K), deltas.dtype).at[blk.seg_node].set(
        out_c, unique_indices=True)


def euler_prefix(node_sums, euler_in, euler_out, n_nodes):
    """Traced: ancestor accumulation down the DFS as an Euler-tour signed
    prefix sum (+delta at subtree entry, -delta past exit, one cumsum over
    2N+1 slots) — the parallel-scan replacement for the reference's BFS."""
    import jax.numpy as jnp

    slots = jnp.zeros((2 * n_nodes + 1, node_sums.shape[1]),
                      dtype=node_sums.dtype)
    slots = slots.at[euler_in].add(node_sums)
    slots = slots.at[euler_out + 1].add(-node_sums)
    pref = jnp.cumsum(slots, axis=0)
    return pref[euler_in]


def finalize_scores(xp, acc, log_mag, read_unique, logcont_den, wc_den):
    """Accumulator [N,6] -> scores [N,5] in METRICS order (the NodeMetrics
    getters, src/placement.hpp:120-149).  Division guards via where-on-both-
    sides so the same body runs as numpy f64 (scalar stats) and traced f32
    (0-d array stats)."""
    gmsq, lograw, logcos, wc_num, logcont, presence = (
        acc[:, i] for i in range(N_ACC))
    z = xp.zeros_like(lograw)
    ok_mag = log_mag > 0
    s0 = xp.where(ok_mag, lograw / xp.where(ok_mag, log_mag, 1.0), z)
    gm = xp.sqrt(xp.maximum(gmsq, 0.0))
    den = log_mag * gm
    s1 = xp.clip(xp.where(den > 0, logcos / xp.where(den > 0, den, 1.0), z),
                 0.0, 1.0)
    s2 = xp.where(read_unique > 0,
                  presence / xp.where(read_unique > 0, read_unique, 1), z)
    s3 = xp.where(wc_den > 0, wc_num / xp.where(wc_den > 0, wc_den, 1.0), z)
    s4 = xp.where(logcont_den > 0,
                  logcont / xp.where(logcont_den > 0, logcont_den, 1.0), z)
    return xp.stack([s0, s1, s2, s3, s4], axis=1)
