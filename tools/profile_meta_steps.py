#!/usr/bin/env python
"""Step-level timing inside the meta score_all loop on the real workload."""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from panmap_tpu.io import fastq
    from panmap_tpu.meta.engine import MetaScorer, sketch_meta_reads_full
    from panmap_tpu.meta.engine_tpu import TpuMetaScorer, _pad_pow2
    from panmap_tpu.meta.index import load_meta_index

    midx = load_meta_index(
        "/tmp/mix/sars_20000_twilight_dipper.panman.ptmidx.npz")
    seqs = fastq.read_paired_for_placement("/tmp/mix/mix_R1.fastq",
                                           "/tmp/mix/mix_R2.fastq")
    p = midx.params
    reads, _, _ = sketch_meta_reads_full(seqs, p.k, p.s, p.t, p.l, p.open)
    t0 = time.time()
    fast = TpuMetaScorer(midx, reads)
    log(f"ctor: {time.time()-t0:.1f}s; evpad={fast._evpad} "
        f"slots={fast.n_slots} chunks={len(fast._chunk_lo)} "
        f"U={fast.U} n_rows={fast.n_rows} Rpad={fast.Rpad} "
        f"blocks={fast.n_blocks}")

    # the driver's real candidate list (OC ranking over kept nodes)
    scorer = MetaScorer(midx, reads)
    oc_arr = fast.overlap_coefficients()
    kept = [n for n in range(fast.n_nodes) if scorer.tree.keep[n]]
    kept.sort(key=lambda n: -oc_arr[n])
    cand, rank, prev = [], 0, None
    for n in kept:
        if prev is None or oc_arr[n] != prev:
            prev = oc_arr[n]
            rank += 1
            if rank > 100:
                break
        cand.append(n)
    cand_arr = np.asarray(cand)
    C = fast.NODE_CHUNK
    counts = np.bincount(cand_arr // C, minlength=len(fast._chunk_lo))
    W = _pad_pow2(int(counts.max()), lo=64)
    log(f"{len(cand)} candidates; per-chunk counts={counts.tolist()} W={W}")

    t0 = time.time()
    ms, snap = fast.score_all(cand, snap_device=True)
    snap.block_until_ready()
    log(f"score_all #1 (compile?): {time.time()-t0:.1f}s")
    t0 = time.time()
    ms, snap = fast.score_all(cand, snap_device=True)
    snap.block_until_ready()
    log(f"score_all #2: {time.time()-t0:.1f}s")

    # single grouped dispatch timing (host-synced via ms fetch)
    if fast._score_fn is None:
        fast._score_fn = fast._make_score_all_fn()
    G = fast.group
    args = (fast._carries_dev[:G], fast._ev_key_dev[:G],
            fast._ev_col_dev[:G], fast._ev_del_dev[:G],
            fast._occ_fwd_dev, fast._occ_rev_dev)
    for trial in range(2):
        t0 = time.time()
        ms1, sc1 = fast._score_fn(*args)
        np.asarray(ms1[:1])
        log(f"group dispatch (G={G}): {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
