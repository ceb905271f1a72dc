#!/usr/bin/env python
"""Stage-level timing of the TPU placement path on the bench workload.

Times (post-warmup): host encode+pack, device sketch dispatches, finalize,
score, host finish.  Run from repo root; uses the cached sars20000 index.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (panmap_tpu import configures the compile cache)
import numpy as np

R1 = "/root/reference/examples/data/reads/isolate_R1.fastq.gz"
R2 = "/root/reference/examples/data/reads/isolate_R2.fastq.gz"
IDX = "/root/repo/.cache/sars20000.ptidx.npz"


def main():
    from panmap_tpu.io import fastq
    from panmap_tpu.io.index_io import load_index
    from panmap_tpu.place.query_tpu import TpuPlacer
    from panmap_tpu.sketch.tpu import encode_reads_batch, pack_reads_2bit

    idx = load_index(IDX)
    seqs = fastq.read_paired_for_placement(R1, R2)
    print(f"{len(seqs)} reads", file=sys.stderr)

    t0 = time.time()
    placer = TpuPlacer(idx, pad_len=max(len(s) for s in seqs))
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    placer.place(seqs)
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

    # --- stage timings (3 reps, min) ---
    B, L = placer.batch, placer.pad_len
    reps = 3

    # host encode + pack
    ts = []
    for _ in range(reps):
        t0 = time.time()
        host = []
        for off in range(0, len(seqs), B):
            chunk = seqs[off:off + B]
            reads, lens = encode_reads_batch(chunk, pad_to=L)
            if len(chunk) < B:
                pad = B - len(chunk)
                reads = np.concatenate([reads, np.full((pad, L), 4, np.uint8)])
                lens = np.concatenate([lens, np.zeros(pad, np.int32)])
            host.append((pack_reads_2bit(reads), lens))
        ts.append(time.time() - t0)
    print(f"host encode+pack: {min(ts):.3f}s", file=sys.stderr)

    # device sketch (transfer + kernel), reusing host arrays
    ts = []
    for _ in range(reps):
        t0 = time.time()
        parts = [placer._sketch_flat(pk, nm, lens) for (pk, nm), lens in host]
        kh = jax.numpy.concatenate([p[0] for p in parts])
        kl = jax.numpy.concatenate([p[1] for p in parts])
        vv = jax.numpy.concatenate([p[2] for p in parts])
        np.asarray(kh[-8:])  # force full materialization (axon's
        ts.append(time.time() - t0)  # block_until_ready doesn't block)
    print(f"device sketch: {min(ts):.3f}s", file=sys.stderr)

    dev = placer.dev
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = placer._finalize_score(kh, kl, vv, -1.0, dev.row_id,
                                     dev.row_parent, dev.row_child,
                                     dev.row_node, dev.euler_in, dev.euler_out,
                                     placer.tab_hi, placer.tab_lo,
                                     placer.tab_idx)
        np.asarray(out[0])
        ts.append(time.time() - t0)
    print(f"finalize+score (fused): {min(ts):.3f}s", file=sys.stderr)
    acc, wc_den, log_mag, nuniq, lden = out

    ts = []
    for _ in range(reps):
        t0 = time.time()
        acch = np.asarray(acc)
        placer._last_wc_den = float(wc_den)
        placer._finish_scores(acch, float(log_mag), int(nuniq), float(lden))
        ts.append(time.time() - t0)
    print(f"host finish (incl. acc copy): {min(ts):.3f}s", file=sys.stderr)

    # end-to-end
    ts = []
    for _ in range(reps):
        t0 = time.time()
        placer.place(seqs)
        ts.append(time.time() - t0)
    print(f"end-to-end place: {min(ts):.3f}s -> "
          f"{len(seqs)/min(ts):,.0f} reads/s", file=sys.stderr)


if __name__ == "__main__":
    main()
