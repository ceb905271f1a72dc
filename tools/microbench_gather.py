#!/usr/bin/env python
"""Row-gather + segment-sum strategies for the meta scorer, at real shapes:
P [524289, C] table, 262144 occurrence rows, 4096 reads."""

import sys
import time

sys.path.insert(0, "/root/repo")
import panmap_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    float(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn_j(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    NR, C, OB, B = 524289, 2048, 262144, 4096
    P8 = jnp.asarray(rng.integers(0, 2, (NR, C), dtype=np.int8))
    P32 = P8.astype(jnp.int32)
    keys = rng.integers(0, NR, OB).astype(np.int32)
    keys_sorted = np.sort(keys)
    loc = np.sort(rng.integers(0, B, OB)).astype(np.int32)
    kj = jnp.asarray(keys)
    ksj = jnp.asarray(keys_sorted)
    lj = jnp.asarray(loc)

    bench("baseline roundtrip", lambda a: jnp.sum(a[:4]).astype(jnp.float32), kj)

    bench("gather i8 rows (random keys)",
          lambda P, k: P[k].astype(jnp.float32).sum(), P8, kj)
    bench("gather i8 rows (sorted keys)",
          lambda P, k: P[k].astype(jnp.float32).sum(), P8, ksj)
    bench("gather i32 rows (random keys)",
          lambda P, k: P[k].astype(jnp.float32).sum(), P32, kj)

    def gather_segsum(P, k, l):
        g = P[k].astype(jnp.int32)
        return jax.ops.segment_sum(g, l, num_segments=B + 1)[:B].astype(jnp.float32).sum()

    bench("gather i8 + segment_sum", gather_segsum, P8, kj, lj)

    def segsum_only(P, l):
        g = P[:OB].astype(jnp.int32)  # contiguous slice, no gather
        return jax.ops.segment_sum(g, l, num_segments=B + 1)[:B].astype(jnp.float32).sum()

    bench("segment_sum only (contiguous rows)", segsum_only, P8, lj)

    # P build: scatter 2^18 events + cumsum
    E = 1 << 18
    ek = jnp.asarray(rng.integers(0, NR, E).astype(np.int32))
    ec = jnp.asarray(rng.integers(0, C, E).astype(np.int32))
    ed = jnp.asarray(rng.choice([-1, 1], E).astype(np.int32))
    st = jnp.asarray(rng.integers(0, 2, NR).astype(np.int32))

    def build(state, k, c, d):
        flat = jnp.zeros(NR * C, jnp.int32).at[k * C + c].add(d, mode="drop")
        M = flat.reshape(NR, C)
        M = M.at[:, 0].add(state)
        return (jnp.cumsum(M, axis=1) > 0).astype(jnp.int8).astype(jnp.float32).sum()

    bench("P build (scatter+cumsum)", build, st, ek, ec, ed)

    # fixed-slot variant: each read has 64 slots -> gather [B, 64, C] then sum
    slots = rng.integers(0, NR, (B, 64)).astype(np.int32)
    sj = jnp.asarray(slots)

    def slotted(P, s):
        g = P[s].astype(jnp.int32)     # [B, 64, C]
        return jnp.sum(g, axis=1).astype(jnp.float32).sum()

    bench("slotted gather [B,64] + sum", slotted, P8, sj)


if __name__ == "__main__":
    main()
