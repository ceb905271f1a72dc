#!/usr/bin/env python
"""Prototype: B-query batched fused placement scoring.

The per-dispatch floor (~1.8 ms) and the per-row dynamic-gather cost
(~15 ms / 2.4M rows, independent of payload up to ~8 f32) make single-query
scoring overhead-bound.  Scoring B queries in ONE program shares the row
stream, the gather (payload grows, row count doesn't), the shared per-row
log1p coefficients, and the blocked reduction's cumsum — so per-query cost
drops ~B-fold toward the HBM floor.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=3, queue=8):
    fn_j = jax.jit(fn)
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn_j(*args))[0])
    print(f"{name}: compile+first {time.time()-t0:.1f} s", file=sys.stderr,
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn_j(*args))[0])
        ts.append(time.time() - t0)
    t0 = time.time()
    outs = [fn_j(*args) for _ in range(queue)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    tq = (time.time() - t0) / queue
    print(f"{name}: single {min(ts)*1e3:.1f} ms   queued {tq*1e3:.1f} ms",
          file=sys.stderr, flush=True)


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
    euler_in = jnp.asarray(np.arange(N, dtype=np.int32) * 2)
    euler_out = jnp.asarray(np.arange(N, dtype=np.int32) * 2 + 1)

    from panmap_tpu.place.metrics import make_block_segments

    blk = make_block_segments(row_node_np, N)

    for B in (4, 8, 16):
        uid_logc_b = jnp.asarray(
            np.where(rng.random((NU, B)) < 0.03,
                     rng.random((NU, B)) + 0.1, 0.0).astype(np.float32))

        def batched(row_id, rp, rc, tab):
            P = rp.astype(jnp.float32)
            C = rc.astype(jnp.float32)
            # shared per-row coefficients (query-independent)
            log_child = jnp.where(C > 0, jnp.log1p(C), 0.0)
            log_parent = jnp.where(P > 0, jnp.log1p(P), 0.0)
            changed = (C - P) != 0
            c_coef = jnp.where(C > 0, 1.0 / jnp.maximum(C, 1.0), 0.0)
            p_coef = jnp.where(P > 0, 1.0 / jnp.maximum(P, 1.0), 0.0)
            w_raw = jnp.where(changed, c_coef - p_coef, 0.0)
            w_cos = jnp.where(changed, log_child - log_parent, 0.0)
            w_wc = w_raw  # same coefficient, found-only weighting
            became_present = ((P == 0) & (C != 0)).astype(jnp.float32)
            became_absent = ((C == 0) & (P != 0)).astype(jnp.float32)
            w_pres = jnp.where(changed, became_present - became_absent, 0.0)
            lrc = tab[row_id]                       # [T, B]
            found = lrc > 0
            ff = found.astype(jnp.float32)
            # [T, B, 5] deltas
            d = jnp.stack([
                w_raw[:, None] * lrc,
                w_cos[:, None] * lrc,
                w_wc[:, None] * ff,
                w_pres[:, None] * lrc,
                w_pres[:, None] * ff,
            ], axis=2).reshape(T, 5 * B)
            # blocked per-node reduction (metrics.row_node_sums_blocked body)
            K = 5 * B
            dp = jnp.pad(d, ((0, blk.pad), (0, 0)))
            cum = jnp.cumsum(dp.reshape(blk.B, blk.L, K), axis=1).reshape(-1, K)
            head = cum[blk.lastp] - jnp.where(blk.has_base[:, None],
                                              cum[blk.base], 0.0)
            blk_tot = cum[blk.L - 1 :: blk.L]
            tail = blk_tot - jnp.where(blk.has_bnd[:, None],
                                       cum[blk.q_flat], 0.0)

            def comb(x, y):
                vx, fx = x
                vy, fy = y
                return jnp.where(fy[:, None], vy, vx + vy), fx | fy

            run, _ = jax.lax.associative_scan(comb, (tail, blk.has_bnd))
            carry = jnp.concatenate([jnp.zeros((1, K), jnp.float32),
                                     run[:-1]])
            out_c = head + jnp.where(blk.spanning[:, None],
                                     carry[blk.eb_blk], 0.0)
            ns = jnp.zeros((N, K), jnp.float32).at[blk.seg_node].set(
                out_c, unique_indices=True)
            # euler prefix
            slots = jnp.zeros((2 * N + 1, K), jnp.float32)
            slots = slots.at[euler_in].add(ns)
            slots = slots.at[euler_out + 1].add(-ns)
            pref = jnp.cumsum(slots, axis=0)
            return pref[euler_in].reshape(N, B, 5).sum(axis=(0, 2))

        bench(f"BATCHED fused B={B}", batched, row_id, rp, rc, uid_logc_b)


if __name__ == "__main__":
    main()
