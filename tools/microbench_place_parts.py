#!/usr/bin/env python
"""Component attribution for the fused placement-score step.

Separates the production program into (a) the uid->row gathers, (b) the
delta math + blocked per-node reduction + Euler prefix given a ready lrc
stream, and (c) the full fused program, so the roofline gap has a named
owner before any kernel work.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=4, queue=12):
    fn_j = jax.jit(fn)
    np.asarray(jax.tree_util.tree_leaves(fn_j(*args))[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn_j(*args))[0])
        ts.append(time.time() - t0)
    t0 = time.time()
    outs = [fn_j(*args) for _ in range(queue)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    tq = (time.time() - t0) / queue
    print(f"{name:34s} single {min(ts)*1e3:7.1f} ms   queued {tq*1e3:7.1f} ms",
          file=sys.stderr, flush=True)
    return tq


def main():
    rng = np.random.default_rng(0)
    T = 2_422_142
    N = 40_000
    NU = 1_200_000

    sizes = rng.pareto(1.2, N).astype(np.int64) + 1
    sizes[rng.random(N) < 0.35] = 0
    sizes = (sizes * (T / max(sizes.sum(), 1))).astype(np.int64)
    sizes[0] += T - sizes.sum()
    row_node_np = np.repeat(np.arange(N, dtype=np.int32),
                            np.maximum(sizes, 0))[:T]
    row_node_np.sort()

    row_id = jnp.asarray(rng.integers(0, NU, T, dtype=np.int32))
    rp = jnp.asarray(rng.integers(0, 3, T, dtype=np.int16))
    rc = jnp.asarray(rng.integers(0, 3, T, dtype=np.int16))
    row_node = jnp.asarray(row_node_np)
    uid_logc_np = np.where(rng.random(NU) < 0.2,
                           rng.random(NU), 0.0).astype(np.float32)
    uid_logc = jnp.asarray(uid_logc_np)
    lrc_stream = jnp.asarray(uid_logc_np[np.asarray(row_id)])
    euler_in = jnp.asarray(np.arange(N, dtype=np.int32) * 2)
    euler_out = jnp.asarray(np.arange(N, dtype=np.int32) * 2 + 1)

    from panmap_tpu.place.metrics import (euler_prefix, row_node_sums,
                                          make_block_segments,
                                          row_node_sums_blocked)

    blk = make_block_segments(row_node_np, N)

    def g1(row_id, uid_logc):
        return uid_logc[row_id]

    def deltas_blocked(lrc, rp, rc):
        ns = row_node_sums_blocked(lrc, rp, rc, lrc > 0, blk, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    def full_blocked(row_id, rp, rc, uid_logc):
        lrc = uid_logc[row_id]
        ns = row_node_sums_blocked(lrc, rp, rc, lrc > 0, blk, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    def full_scatter(row_id, rp, rc, row_node, uid_logc):
        lrc = uid_logc[row_id]
        ns = row_node_sums(lrc, rp, rc, lrc > 0, row_node, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    def deltas_scatter(lrc, rp, rc, row_node):
        ns = row_node_sums(lrc, rp, rc, lrc > 0, row_node, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    def pure_stream(lrc, rp, rc):
        # deltas only, summed — pure streaming FLOP/HBM cost, no reduction
        P = rp.astype(jnp.float32)
        C = rc.astype(jnp.float32)
        from panmap_tpu.place.metrics import row_metric_deltas
        d = row_metric_deltas(jnp, lrc, P, C, lrc > 0)
        return sum(x.sum() for x in d)

    # sparse found-rows path at realistic single-sample query sizes
    from panmap_tpu.place.metrics import make_csc_index, row_node_sums_sparse

    csc = make_csc_index(np.asarray(row_id), np.asarray(rp), np.asarray(rc),
                         row_node_np, NU, N)

    for nfound in (4096, 32768):
        uids = np.sort(rng.choice(NU, nfound, replace=False)).astype(np.int32)
        logc = rng.random(nfound).astype(np.float32) + 0.1
        from panmap_tpu.place.metrics import query_found_rows
        F = query_found_rows(csc, uids)
        rcap = 1 << int(np.ceil(np.log2(max(F, 2))))
        fcap = 1 << int(np.ceil(np.log2(max(nfound, 2))))
        rcap = max(rcap, fcap)
        pu = np.full(fcap, NU, np.int32)
        pu[:nfound] = uids
        pl = np.zeros(fcap, np.float32)
        pl[:nfound] = logc
        puj, plj = jnp.asarray(pu), jnp.asarray(pl)

        def sparse_fused(pu, pl, off, P, C, node, mag):
            from panmap_tpu.place.metrics import CscIndex
            c = CscIndex(off=off, P=P, C=C, node=node, mag_static=mag,
                         off_np=None, n_rows=0)
            ns = row_node_sums_sparse(pu, pl, c, N, rcap)
            return euler_prefix(ns, euler_in, euler_out, N)

        bench(f"SPARSE fused nfound={nfound} F={F}", sparse_fused, puj, plj,
              csc.off, csc.P, csc.C, csc.node, csc.mag_static)

        def sparse_prefix(pu, pl, off, P, C, node, mag):
            from panmap_tpu.place.metrics import CscIndex, sparse_prefix_acc
            c = CscIndex(off=off, P=P, C=C, node=node, mag_static=None,
                         mag_prefix=mag, off_np=None, n_rows=0)
            return sparse_prefix_acc(pu, pl, c, euler_in, euler_out, N, rcap)

        bench(f"SPARSE prefix-direct nfound={nfound}", sparse_prefix, puj,
              plj, csc.off, csc.P, csc.C, csc.node, csc.mag_static)

        def sparse_acc_only(pu, pl, off, P, C, node, mag):
            from panmap_tpu.place.metrics import CscIndex
            c = CscIndex(off=off, P=P, C=C, node=node, mag_static=mag,
                         off_np=None, n_rows=0)
            return row_node_sums_sparse(pu, pl, c, N, rcap)

        bench(f"SPARSE acc only nfound={nfound}", sparse_acc_only, puj, plj,
              csc.off, csc.P, csc.C, csc.node, csc.mag_static)

    ns_const = jnp.asarray(rng.random((N, 6), dtype=np.float32))
    bench("euler_prefix alone", lambda ns: euler_prefix(
        ns, euler_in, euler_out, N), ns_const)

    bench("gather uid_logc[row_id]", g1, row_id, uid_logc)
    bench("stream deltas only (sum)", pure_stream, lrc_stream, rp, rc)
    bench("deltas+blocked (lrc ready)", deltas_blocked, lrc_stream, rp, rc)
    bench("deltas+scatter (lrc ready)", deltas_scatter, lrc_stream, rp, rc,
          row_node)
    bench("FULL blocked", full_blocked, row_id, rp, rc, uid_logc)
    bench("FULL scatter", full_scatter, row_id, rp, rc, row_node, uid_logc)


if __name__ == "__main__":
    main()
