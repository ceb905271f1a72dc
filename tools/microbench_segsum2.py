#!/usr/bin/env python
"""Full fused placement-score program: scatter vs blocked-cumsum reduction.

Measures the production-shaped program (row gather + delta math + per-node
reduction + Euler prefix + node-score finalize) with the result FETCHED to
host (np.asarray) so remote-backend laziness cannot fake the numbers, plus a
queued steady-state figure (many dispatches in flight, fetch the last).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=6, queue=12):
    fn_j = jax.jit(fn)
    t0 = time.time()
    np.asarray(fn_j(*args))
    print(f"{name}: compile+first {time.time()-t0:.1f} s", file=sys.stderr,
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn_j(*args))
        ts.append(time.time() - t0)
    t0 = time.time()
    outs = [fn_j(*args) for _ in range(queue)]
    np.asarray(outs[-1])
    tq = (time.time() - t0) / queue
    print(f"{name}: single {min(ts)*1e3:.1f} ms   queued {tq*1e3:.1f} ms",
          file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    T = 2_422_142
    N = 40_000
    K = 6
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
    uid_logc = jnp.asarray(rng.random(NU, dtype=np.float32))
    uid_found = jnp.asarray(rng.random(NU) < 0.2)
    euler_in = jnp.asarray(np.arange(N, dtype=np.int32) * 2)
    euler_out = jnp.asarray(np.arange(N, dtype=np.int32) * 2 + 1)

    from panmap_tpu.place.metrics import (euler_prefix, row_node_sums,
                                          make_block_segments,
                                          row_node_sums_blocked)

    def deltas_of(row_id, rp, rc, uid_logc, uid_found):
        found = uid_found[row_id]
        lrc = jnp.where(found, uid_logc[row_id], 0.0)
        return lrc, rp, rc, found

    def score_scatter(row_id, rp, rc, row_node, uid_logc, uid_found):
        lrc, P, C, found = deltas_of(row_id, rp, rc, uid_logc, uid_found)
        ns = row_node_sums(lrc, P, C, found, row_node, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    blk = make_block_segments(row_node_np, N)

    def score_blocked(row_id, rp, rc, uid_logc, uid_found):
        lrc, P, C, found = deltas_of(row_id, rp, rc, uid_logc, uid_found)
        ns = row_node_sums_blocked(lrc, P, C, found, blk, N)
        return euler_prefix(ns, euler_in, euler_out, N)

    bench("scatter fused ", score_scatter, row_id, rp, rc, row_node,
          uid_logc, uid_found)
    bench("blocked fused ", score_blocked, row_id, rp, rc, uid_logc,
          uid_found)

    a = np.asarray(jax.jit(score_scatter)(row_id, rp, rc, row_node,
                                          uid_logc, uid_found), np.float64)
    b = np.asarray(jax.jit(score_blocked)(row_id, rp, rc, uid_logc,
                                          uid_found), np.float64)
    print(f"max|scatter-blocked| on euler-prefixed acc: "
          f"{np.max(np.abs(a-b)):.3e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
