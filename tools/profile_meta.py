#!/usr/bin/env python
"""Stage-level timing of the meta deconvolution path on the 100k mixture."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    from panmap_tpu.io import fastq
    from panmap_tpu.meta.index import load_meta_index

    midx = load_meta_index("/tmp/mix/sars_20000_twilight_dipper.panman.ptmidx.npz")
    log(f"midx loaded: {len(midx.delta_seed)} deltas, {len(midx.seed_hash)} seeds")

    seqs = fastq.read_paired_for_placement("/tmp/mix/mix_R1.fastq",
                                           "/tmp/mix/mix_R2.fastq")
    log(f"{len(seqs)} reads")

    from panmap_tpu.meta.engine import sketch_meta_reads_full

    p = midx.params
    reads, dup_index, n_dust = sketch_meta_reads_full(
        seqs, p.k, p.s, p.t, p.l, p.open)
    log(f"sketched -> {len(reads)} unique sets")

    from panmap_tpu.meta.engine import MetaScorer

    scorer = MetaScorer(midx, reads)
    log("MetaScorer init done")

    # --- TpuMetaScorer phases, inlined with timers ---
    from panmap_tpu.meta import engine_tpu as et
    from panmap_tpu.meta.events import presence_events

    all_h = np.concatenate([r.hashes for r in reads])
    read_hashes = np.unique(all_h)
    log(f"{len(read_hashes)} unique read hashes")

    ev = presence_events(midx, read_hashes)
    log(f"presence_events: {len(ev['ev_node'])} events")

    fast = et.TpuMetaScorer(midx, reads)
    log(f"TpuMetaScorer ctor total; {len(fast.ev_pos)} events, U={fast.U}, max_occ={fast._max_occ}")

    oc_arr = fast.overlap_coefficients()
    log("overlap coefficients")
    oc = {n: float(oc_arr[n]) for n in range(len(midx.node_ids))}
    kept = [n for n in oc if scorer.tree.keep[n]]
    kept.sort(key=lambda n: -oc[n])
    candidates = kept[:1500]
    log(f"{len(candidates)} candidates")

    t0 = time.time()
    max_score, snap = fast.score_all(candidates, snap_device=True)
    log(f"score_all: {time.time()-t0:.1f}s (snap {snap.shape} on device)")

    from panmap_tpu.meta.engine import run_squarem

    read_lens = np.array([len(r.hashes) for r in reads], dtype=np.int64)
    weights = np.array([r.n_dup for r in reads], dtype=np.float64)
    weights[max_score == 0] = 0.0
    t0 = time.time()
    res = run_squarem(snap, read_lens, weights,
                      [midx.node_ids[n] for n in candidates],
                      max_change_threshold=1e-5)
    log(f"EM: {time.time()-t0:.1f}s, {len(res.node_names)} survivors")
    order = np.argsort(-res.props)[:8]
    for i in order:
        log(f"  {res.node_names[i]}  {res.props[i]:.5f}")


if __name__ == "__main__":
    main()
