#!/usr/bin/env python
"""Real-hardware validation record (VERDICT weak item 6): runs the claims
that CI's CPU backend cannot witness on the ACTUAL TPU chip and writes
REALTPU.json next to the bench artifacts.

Checks:
 1. Pallas banded-SW kernel bit-exactness vs the numpy affine DP on
    hardware (the production aligner's scoring stage);
 2. the default placement path (widened device tie-selection + exact f64
    rescue) equality against the host engine on the real sars_20000 index;
 3. the device pileup tally program vs numpy bincounts.

Usage: python tools/real_tpu_check.py [index.npz reads_R1 reads_R2]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    out = {"ts": time.time(), "devices": [str(d) for d in jax.devices()],
           "platform": jax.devices()[0].platform, "checks": {}}
    on_accel = out["platform"] not in ("cpu",)
    out["real_hardware"] = bool(on_accel)

    # ---- 1. Pallas banded SW vs numpy DP ----
    from panmap_tpu.align.core import banded_affine_dp
    from panmap_tpu.align.pallas_sw import banded_sw_scores

    rng = np.random.default_rng(7)
    n_ok = n_tot = 0
    B, LQ, LR = 64, 128, 160
    qs = rng.integers(0, 4, (B, LQ)).astype(np.int8)
    rs = rng.integers(0, 4, (B, LR)).astype(np.int8)
    for b in range(B):  # embed the query with noise so scores are nontrivial
        o = int(rng.integers(0, LR - LQ))
        rs[b, o : o + LQ] = qs[b]
        mut = rng.random(LQ) < 0.05
        rs[b, o : o + LQ][mut] = (rs[b, o : o + LQ][mut] + 1) % 4
    got = np.asarray(banded_sw_scores(qs, rs, np.full(B, LQ, np.int32)))
    for b in range(B):
        want = banded_affine_dp(qs[b], rs[b])[0]
        n_tot += 1
        n_ok += int(got[b, 0]) == int(want)
    out["checks"]["pallas_sw_bit_exact"] = {"ok": n_ok, "total": n_tot}

    # ---- 2. default placement path on the real index ----
    idx_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, ".cache", "sars20000.ptidx.npz")
    r1 = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/examples/data/reads/isolate_R1.fastq.gz"
    r2 = sys.argv[3] if len(sys.argv) > 3 else \
        "/root/reference/examples/data/reads/isolate_R2.fastq.gz"
    if os.path.exists(idx_path) and os.path.exists(r1):
        from panmap_tpu.io import fastq
        from panmap_tpu.io.index_io import load_index
        from panmap_tpu.place.engine import (METRICS, prepare_read_sketch,
                                             score_nodes, sketch_reads)
        from panmap_tpu.place.query_tpu import TpuPlacer

        idx = load_index(idx_path)
        p = idx.params
        seqs = fastq.read_paired_for_placement(r1, r2 if os.path.exists(r2)
                                               else None)
        freq = sketch_reads(seqs, p.k, p.s, p.t, p.l, p.open)
        sk = prepare_read_sketch(freq, p.k, len(seqs), min_read_support=-1)
        placer = TpuPlacer(idx)
        got2 = placer.place_exact(sk)
        exact = score_nodes(idx, sk)
        same = got2 is not None and all(
            got2.best_index[m] == exact.best_index[m]
            and got2.best_score[m] == exact.best_score[m]
            and got2.tied_indices[m] == exact.tied_indices[m]
            for m in METRICS)
        out["checks"]["place_exact_equals_host_engine"] = {
            "ok": bool(same), "index": os.path.basename(idx_path),
            "n_reads": len(seqs),
            "best": {m: (None if got2 is None else got2.best_index[m])
                     for m in METRICS}}
    else:
        out["checks"]["place_exact_equals_host_engine"] = {
            "ok": None, "skipped": "index/reads not found"}

    # ---- 3. device pileup tallies vs numpy ----
    from panmap_tpu.genotype.caller import tally_columns_device

    ncol = 300
    E = 20000
    cid = np.sort(rng.integers(0, ncol, E)).astype(np.int64)
    gq = rng.integers(4, 64, E).astype(np.int64)
    gs = rng.integers(0, 2, E).astype(np.int64)
    gb = rng.integers(0, 5, E).astype(np.int64)
    BCF, QS, ADF, ADR = tally_columns_device(cid, gq, gs, gb, ncol)
    bcf = np.bincount(cid * 5 + np.minimum(gb, 4),
                      minlength=ncol * 5).reshape(ncol, 5)
    v = gb < 4
    qsn = np.bincount(cid[v] * 4 + gb[v], weights=gq[v].astype(np.float64),
                      minlength=ncol * 4).reshape(ncol, 4)
    ok3 = (np.array_equal(BCF, bcf) and np.array_equal(QS, qsn))
    out["checks"]["device_pileup_tally_exact"] = {"ok": bool(ok3)}

    # ---- 4. long-read shifted-band dual-affine kernel vs the host DP ----
    from panmap_tpu.align.core import encode
    from panmap_tpu.align.longread import MAP_ONT, banded_dp_shifted
    from panmap_tpu.align.pallas_long import long_dp_device_batch

    rng = np.random.default_rng(61)
    ref4 = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    refc4 = encode(np.frombuffer(ref4.encode(), np.uint8))
    items, host = [], []
    for t in range(8):
        L = int(rng.integers(600, 2400))
        p = int(rng.integers(0, len(ref4) - L - 600))
        frag = list(ref4[p : p + L])
        for j in range(L):
            if rng.random() < 0.05:
                frag[j] = "ACGT"[("ACGT".find(frag[j]) + 1) % 4]
        if t % 3 == 1:  # long deletion (E2 tier)
            d = int(rng.integers(80, 300))
            frag = frag[: L // 2] + list(ref4[p + L // 2 + d : p + L + d])
        q4 = encode(np.frombuffer("".join(frag).encode(), np.uint8))
        wr = int(rng.integers(100, 500))  # non-128-aligned band widths
        items.append((q4, p - wr, p + wr + 13))
        host.append(banded_dp_shifted(q4, refc4, p - wr, p + wr + 13,
                                      MAP_ONT))
    dev4 = long_dp_device_batch(items, refc4, MAP_ONT, interpret=False)
    ok4 = sum(h == d for h, d in zip(host, dev4))
    out["checks"]["pallas_long_bit_exact"] = {"ok": int(ok4),
                                              "total": len(items)}

    path = os.path.join(REPO, "REALTPU.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["checks"]))
    print(f"wrote {path} (platform={out['platform']})")
    all_ok = all(c.get("ok") in (True,) or c.get("ok") == c.get("total")
                 for c in out["checks"].values()
                 if c.get("ok") is not None)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
