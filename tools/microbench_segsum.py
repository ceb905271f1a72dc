#!/usr/bin/env python
"""Micro-bench: per-node segment sum formulations at real index shapes.

The placement program's dominant on-chip cost is the per-node reduction of
2.4M row deltas into ~40k node accumulators (sorted scatter, ~30 ms/step on
v5e).  row_node is STATIC per index, so the last-row position of every
non-empty node is host-precomputable — that turns the reduction into

  segmented associative scan (reset at segment starts, f32 error identical
  to per-segment summation) -> gather at M static positions -> M-row scatter

with no 2.4M-element scatter at all.  This script measures both (plus the
unsorted-scatter strawman) with device-resident inputs, single-dispatch and
queued steady-state.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=8, queue=8):
    fn_j = jax.jit(fn)
    t0 = time.time()
    out = fn_j(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    print(f"{name}: compile+first {time.time()-t0:.1f} s", file=sys.stderr,
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.time() - t0)
    # queued steady state: overlap dispatch latency
    t0 = time.time()
    outs = [fn_j(*args) for _ in range(queue)]
    jax.tree_util.tree_leaves(outs[-1])[0].block_until_ready()
    tq = (time.time() - t0) / queue
    print(f"{name}: single {min(ts)*1e3:.1f} ms   queued {tq*1e3:.1f} ms",
          file=sys.stderr)
    return out


def main():
    rng = np.random.default_rng(0)
    T = 2_422_142
    N = 40_000
    K = 6

    # realistic row_node: sorted, ~35% of nodes empty, heavy-tailed sizes
    sizes = rng.pareto(1.2, N).astype(np.int64) + 1
    sizes[rng.random(N) < 0.35] = 0
    sizes = (sizes * (T / max(sizes.sum(), 1))).astype(np.int64)
    sizes[0] += T - sizes.sum()
    row_node_np = np.repeat(np.arange(N, dtype=np.int32), sizes)[:T]
    row_node_np.sort()

    deltas = jnp.asarray(rng.standard_normal((T, K), dtype=np.float32))
    row_node = jnp.asarray(row_node_np)

    # static per-index precompute (host, once per DeviceIndex build)
    t0 = time.time()
    last = np.nonzero(np.diff(row_node_np, append=np.int32(N)))[0]
    seg_node_np = row_node_np[last]          # i32[M] node of each segment
    first = np.concatenate(([0], last[:-1] + 1))
    prep_ms = (time.time() - t0) * 1e3
    M = len(last)
    print(f"T={T} N={N} M={M} (static prep {prep_ms:.1f} ms)", file=sys.stderr)

    last_j = jnp.asarray(last.astype(np.int32))
    seg_node_j = jnp.asarray(seg_node_np)
    # reset flags: True at every segment start (static)
    flags_np = np.zeros(T, bool)
    flags_np[first] = True
    flags = jnp.asarray(flags_np)

    def seg_scatter_sorted(d, rn):
        return jax.ops.segment_sum(d, rn, num_segments=N,
                                   indices_are_sorted=True)

    def seg_scatter_unsorted(d, rn):
        return jax.ops.segment_sum(d, rn, num_segments=N)

    def seg_scan_gather(d, fl, lst, segn):
        def comb(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb[:, None], vb, va + vb), fa | fb

        v, _ = jax.lax.associative_scan(comb, (d, fl))
        compact = v[lst]
        return jnp.zeros((N, K), d.dtype).at[segn].set(
            compact, unique_indices=True)

    # --- block-local cumsum + static gathers + tiny block-carry scan -------
    # local_cum resets every L rows (native cumsum over [B, L, K]: trivial
    # compile, HBM-speed).  Segment sums are differences of local_cum at
    # STATIC positions plus an exact block-carry for segments spanning block
    # boundaries (segmented scan over the B block totals — tiny).
    L = 1024
    B = -(-T // L)
    TP = B * L
    pad = TP - T
    rn_pad = np.concatenate([row_node_np, np.full(pad, N - 1, np.int32)])
    # segment ends over the PADDED layout (pad rows have delta 0: absorbing
    # them into the final segment is harmless, matching the mesh-pad scheme)
    lastp = np.nonzero(np.diff(rn_pad, append=np.int32(N)))[0]
    segn = rn_pad[lastp]
    firstp = np.concatenate(([0], lastp[:-1] + 1))
    Mp = len(lastp)
    eb_blk = lastp // L                    # block of each segment end
    # previous segment end within the same block (local base), else -1
    prev_end = np.concatenate(([-1], lastp[:-1]))
    same_blk = (prev_end >= 0) & (prev_end // L == eb_blk)
    base_flat = np.where(same_blk, prev_end, 0).astype(np.int32)
    has_base = same_blk
    spanning = (firstp // L) < eb_blk
    # per block: local position of its last segment end (-1 if none)
    q = np.full(B, -1, np.int64)
    np.maximum.at(q, eb_blk, lastp % L)
    has_bnd = q >= 0
    q_flat = (np.arange(B) * L + np.maximum(q, 0)).astype(np.int32)

    lastp_j = jnp.asarray(lastp.astype(np.int32))
    base_j = jnp.asarray(base_flat)
    hasb_j = jnp.asarray(has_base)
    span_j = jnp.asarray(spanning)
    segn_j = jnp.asarray(segn)
    ebblk_j = jnp.asarray(eb_blk.astype(np.int32))
    qflat_j = jnp.asarray(q_flat)
    hbnd_j = jnp.asarray(has_bnd)

    def blocked_cumsum(d):
        dp = jnp.pad(d, ((0, pad), (0, 0)))
        cum = jnp.cumsum(dp.reshape(B, L, K), axis=1).reshape(TP, K)
        head = cum[lastp_j] - jnp.where(hasb_j[:, None], cum[base_j], 0.0)
        blk_tot = cum[L - 1 :: L]                      # [B, K]
        tail = blk_tot - jnp.where(hbnd_j[:, None], cum[qflat_j], 0.0)
        # exclusive segmented scan: c[b] = tail[b-1] + (bnd[b-1] ? 0 : c[b-1])
        def comb(x, y):
            vx, fx = x
            vy, fy = y
            return jnp.where(fy[:, None], vy, vx + vy), fx | fy

        run, _ = jax.lax.associative_scan(comb, (tail, hbnd_j))
        # run[b] = sum of tails since last boundary-block, INCLUSIVE; the
        # carry INTO block b excludes b itself and resets at boundaries:
        c = jnp.concatenate([jnp.zeros((1, K), d.dtype),
                             jnp.where(hbnd_j[:-1, None], tail[:-1],
                                       run[:-1])])
        out_c = head + jnp.where(span_j[:, None], c[ebblk_j], 0.0)
        return jnp.zeros((N, K), d.dtype).at[segn_j].set(
            out_c, unique_indices=True)

    a = bench("sorted scatter  ", seg_scatter_sorted, deltas, row_node)
    bench("unsorted scatter", seg_scatter_unsorted, deltas, row_node)
    c = bench("blockcum+gather ", blocked_cumsum, deltas)
    b = None
    if T <= 200_000:
        b = bench("segscan+gather  ", seg_scan_gather, deltas, flags, last_j,
                  seg_node_j)

    ref = np.zeros((N, K), np.float64)
    np.add.at(ref, row_node_np, np.asarray(deltas, np.float64))
    ea = float(np.max(np.abs(np.asarray(a, np.float64) - ref)))
    eb = ("n/a (variant skipped at this T)" if b is None else
          f"{float(np.max(np.abs(np.asarray(b, np.float64) - ref))):.3e}")
    ec = float(np.max(np.abs(np.asarray(c, np.float64) - ref)))
    print(f"vs f64: scatter {ea:.3e}  scan {eb}  blockcum {ec:.3e}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
