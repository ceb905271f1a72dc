#!/usr/bin/env python
"""Micro-bench v2: every op reduced to a scalar fetched to host, so timing
includes the full compute (the axon runtime's block_until_ready appears not
to block on unmaterialized remote buffers)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    float(fn_j(*args))  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn_j(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", file=sys.stderr)


def main():
    rng = np.random.default_rng(0)
    TOTAL = 7 * 16384 * 62
    CAP = TOTAL // 2
    NU = 1_200_000
    T = 2_422_142
    N = 20_000

    kh = jnp.asarray(rng.integers(0, 1 << 32, TOTAL, dtype=np.uint32))
    kl = jnp.asarray(rng.integers(0, 1 << 32, TOTAL, dtype=np.uint32))
    vv = jnp.asarray(rng.random(TOTAL) < 0.26)
    ckh = jnp.asarray(rng.integers(0, 1 << 32, CAP, dtype=np.uint32))
    ckl = jnp.asarray(rng.integers(0, 1 << 32, CAP, dtype=np.uint32))

    bench("baseline scalar roundtrip", lambda a: jnp.sum(a[:8]), ckh)
    bench("sort 2xu32 @3.55M", lambda a, b: jax.lax.sort(
        (a, b), num_keys=2)[0].astype(jnp.float32).sum(), ckh, ckl)
    bench("sort 2xu32 @2.37M", lambda a, b: jax.lax.sort(
        (a, b), num_keys=2)[0].astype(jnp.float32).sum(),
        ckh[: TOTAL // 3], ckl[: TOTAL // 3])
    bench("sort 3xu32 @7.1M", lambda a, b, v: jax.lax.sort(
        (a, b, v.astype(jnp.uint32)), num_keys=2)[0].astype(jnp.float32).sum(),
        kh, kl, vv)

    def compact(kh, kl, vv):
        pos = jnp.cumsum(vv.astype(jnp.int32))
        slot = jnp.where(vv, pos - 1, CAP)
        ones = jnp.uint32(0xFFFFFFFF)
        a = jnp.full(CAP, ones).at[slot].set(kh, mode="drop")
        b = jnp.full(CAP, ones).at[slot].set(kl, mode="drop")
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

    bench("compact scatter 7.1M->3.55M", compact, kh, kl, vv)

    u_hi = jnp.asarray(np.sort(rng.integers(0, 1 << 32, NU, dtype=np.uint32)))
    u_lo = jnp.asarray(rng.integers(0, 1 << 32, NU, dtype=np.uint32))
    q_hi = jnp.asarray(rng.integers(0, 1 << 32, 1 << 18, dtype=np.uint32))
    q_lo = jnp.asarray(rng.integers(0, 1 << 32, 1 << 18, dtype=np.uint32))

    from panmap_tpu.place.query_tpu import _bsearch2

    bench("bsearch 262k vs 1.2M",
          lambda a, b, c, d: _bsearch2(a, b, c, d)[0].sum(),
          u_hi, u_lo, q_hi, q_lo)

    row_id = jnp.asarray(rng.integers(0, NU, T, dtype=np.int32))
    row_node = jnp.asarray(np.sort(rng.integers(0, N, T, dtype=np.int32)))
    rp = jnp.asarray(rng.integers(0, 3, T, dtype=np.int16))
    rc = jnp.asarray(rng.integers(0, 3, T, dtype=np.int16))
    uid_logc = jnp.asarray(rng.random(NU, dtype=np.float32))
    uid_found = jnp.asarray(rng.random(NU) < 0.2)
    euler_in = jnp.asarray(np.arange(N, dtype=np.int32) * 2)
    euler_out = jnp.asarray(np.arange(N, dtype=np.int32) * 2 + 1)

    def score(row_id, rp, rc, row_node, uid_logc, uid_found):
        found = uid_found[row_id]
        lrc = uid_logc[row_id]
        P = rp.astype(jnp.float32)
        C = rc.astype(jnp.float32)
        lc = jnp.where(C > 0, jnp.log1p(C), 0.0)
        lp = jnp.where(P > 0, jnp.log1p(P), 0.0)
        active = ((C - P) != 0) & found
        deltas = jnp.stack([
            lc * lc - lp * lp,
            jnp.where(active, jnp.where(C > 0, lrc / jnp.maximum(C, 1.0), 0.0)
                      - jnp.where(P > 0, lrc / jnp.maximum(P, 1.0), 0.0), 0.0),
            jnp.where(active, lrc * (lc - lp), 0.0),
            jnp.where(active, jnp.where(C > 0, 1.0 / jnp.maximum(C, 1.0), 0.0)
                      - jnp.where(P > 0, 1.0 / jnp.maximum(P, 1.0), 0.0), 0.0),
        ], axis=1)
        ns = jax.ops.segment_sum(deltas, row_node, num_segments=N)
        slots = jnp.zeros((2 * N + 1, 4), jnp.float32)
        slots = slots.at[euler_in].add(ns)
        slots = slots.at[euler_out + 1].add(-ns)
        return jnp.cumsum(slots, axis=0)[euler_in].sum()

    bench("gather+score+segsum 2.42M rows", score, row_id, rp, rc, row_node,
          uid_logc, uid_found)

    def score_gather_only(row_id, uid_logc, uid_found):
        return (uid_logc[row_id].sum()
                + uid_found[row_id].astype(jnp.float32).sum())

    bench("  just the 2x 2.42M gathers", score_gather_only, row_id, uid_logc,
          uid_found)

    def segsum_only(row_node, rp):
        d = jnp.stack([rp.astype(jnp.float32)] * 4, axis=1)
        return jax.ops.segment_sum(d, row_node, num_segments=N).sum()

    bench("  just the segment_sum x4", segsum_only, row_node, rp)

    from panmap_tpu.sketch.tpu import kminmer_batch, syncmer_scan_batch

    reads = jnp.asarray(rng.integers(0, 4, (16384, 152), dtype=np.uint8))
    lens = jnp.full(16384, 152, jnp.int32)

    def sk(reads, lens):
        hh, hl, sy = syncmer_scan_batch(reads, lens, 19, 8, 0, False)
        kh, kl, v = kminmer_batch(hh, hl, sy, 19, 3)
        return kh.astype(jnp.float32).sum() + v.sum()

    bench("sketch compute 16384x152 (resident)", sk, reads, lens)

    def sync_only(reads, lens):
        hh, hl, sy = syncmer_scan_batch(reads, lens, 19, 8, 0, False)
        return hh.astype(jnp.float32).sum() + sy.sum()

    bench("  syncmer scan only", sync_only, reads, lens)


if __name__ == "__main__":
    main()
