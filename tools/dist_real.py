#!/usr/bin/env python
"""Multi-process place_exact on a REAL index (VERDICT r3 #3).

Unlike tools/dist_smoke.py (synthetic 7-node table), this drives the
PRODUCTION placement path — TpuPlacer.place_exact over a global 2-process x
4-virtual-device mesh — on the real rsv_4K index and the MZ515733.1 read set,
and asserts in EVERY process that the result is byte-identical to the
single-process f64 host engine (engine.score_nodes): same best node, same
best score, same tie set, for all five metrics.

Usage:  python tools/dist_real.py [nprocs] [devices-per-proc] [index.npz] [reads]
Child:  python tools/dist_real.py --child <pid> <nprocs> <devs> <port> <index> <reads>

The index is built on demand (once, parent process, host-only) when the
cache file is absent.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_IDX = os.path.join(REPO, ".cache", "rsv4k.ptidx.npz")
DEFAULT_READS = "/root/reference/src/test/data/MZ515733.1.fastq"
PANMAN = "/root/reference/src/test/data/rsv_4K.panman"


def _ensure_index(path: str):
    if os.path.exists(path):
        return
    sys.path.insert(0, REPO)
    from panmap_tpu.index.builder import IndexParams, build_index
    from panmap_tpu.io.index_io import save_index
    from panmap_tpu.io.panman import load_panman

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_index(path, build_index(load_panman(PANMAN), IndexParams()))


def child(pid: int, nprocs: int, devs: int, port: int, idx_path: str,
          reads: str) -> int:
    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    import numpy as np

    sys.path.insert(0, REPO)
    from panmap_tpu.io import fastq
    from panmap_tpu.io.index_io import load_index
    from panmap_tpu.parallel.mesh import make_mesh
    from panmap_tpu.place.engine import (
        METRICS,
        prepare_read_sketch,
        score_nodes,
        sketch_reads,
    )
    from panmap_tpu.place.query_tpu import TpuPlacer

    ndev = len(jax.devices())
    assert ndev == nprocs * devs, (ndev, nprocs, devs)
    idx = load_index(idx_path)
    seqs = fastq.read_paired_for_placement(reads, None)
    p = idx.params
    freq = sketch_reads(seqs, p.k, p.s, p.t, p.l, p.open)
    sk = prepare_read_sketch(freq, p.k, len(seqs))

    exact = score_nodes(idx, sk)  # single-process f64 oracle (host)

    mesh = make_mesh()  # ALL global devices: rows shard across processes
    placer = TpuPlacer(idx, mesh=mesh)
    got = placer.place_exact(sk)
    assert got is not None, "place_exact fell back on the real index"
    bad = []
    for m in METRICS:
        if (got.best_index[m] != exact.best_index[m]
                or got.best_score[m] != exact.best_score[m]
                or got.tied_indices[m] != exact.tied_indices[m]):
            bad.append(m)
    n_nodes = len(idx.node_ids)
    best = exact.best_index["log_containment"]
    print(f"[child {pid}] devices={ndev} nodes={n_nodes} "
          f"rows={len(idx.seed_hashes)} best={idx.node_ids[best]} "
          f"{'OK' if not bad else 'MISMATCH ' + ','.join(bad)}", flush=True)
    return 0 if not bad else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                     int(sys.argv[5]), sys.argv[6], sys.argv[7])
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    devs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    idx_path = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_IDX
    reads = sys.argv[4] if len(sys.argv) > 4 else DEFAULT_READS
    _ensure_index(idx_path)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # keep the remote-TPU plugin out
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devs}",
        JAX_TRACEBACK_FILTERING="off",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             str(nprocs), str(devs), str(port), idx_path, reads],
            env=env, cwd=REPO)
        for i in range(nprocs)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    print(f"[parent] child exit codes: {rcs}")
    return 0 if all(rc == 0 for rc in rcs) else 1


if __name__ == "__main__":
    sys.exit(main())
