"""End-to-end TPU placement query: read batch -> seed table -> per-node scores.

This is the throughput path the bench measures: the whole read batch is padded
into [B, L] device tensors, sketched with the batched syncmer/k-min-mer kernels
(sketch/tpu.py), the per-read k-min-mers are sorted+counted on device
(lax.sort with two u32 keys = native u64 ordering), and the resulting seed
table feeds the row-delta scoring program (place/engine_tpu.py).

The reference equivalent is the whole of src/placement.cpp:1128-1930 (read
sketching, frequency table, BFS scoring) — here it is three jitted programs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..index.builder import IndexArrays
from . import engine_tpu as et
from ..sketch.tpu import encode_reads_batch, kminmer_batch, syncmer_scan_batch


def _count_sorted(kh, kl, valid):
    """Device: sort (hi,lo) pairs and emit per-position run info.

    Returns sorted (hi, lo, run_start bool) flattened; counts are derived on
    host from run boundaries (tiny transfer: three arrays of total seeds)."""
    hi = jnp.where(valid, kh, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    lo = jnp.where(valid, kl, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    v = valid.reshape(-1)
    hi_s, lo_s, v_s = jax.lax.sort((hi, lo, v), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(1, bool),
         (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
    return hi_s, lo_s, v_s, first


class TpuPlacer:
    """Holds device index tensors + compiled programs for repeated queries."""

    def __init__(self, idx: IndexArrays, pad_len: int = 160, batch: int = 16384):
        self.idx = idx
        self.dev = et.prepare_device_index(idx)
        self.params = idx.params
        self.pad_len = pad_len
        self.batch = batch
        p = self.params
        k, s, t, l, open_ = p.k, p.s, p.t, p.l, p.open

        @jax.jit
        def sketch_count(reads, lengths):
            hh, hl, is_sync = syncmer_scan_batch(reads, lengths, k, s, t, open_)
            kh, kl, valid = kminmer_batch(hh, hl, is_sync, k, l)
            return _count_sorted(kh, kl, valid)

        self._sketch_count = sketch_count
        self._score = et.make_score_fn(self.dev.n_nodes, int(self.dev.row_id.shape[0]))

    def seed_table_arrays(self, seqs: list):
        """(hashes u64 sorted unique, counts i64) over the read batch."""
        B = self.batch
        parts_h = []
        parts_c = []
        for off in range(0, len(seqs), B):
            chunk = seqs[off : off + B]
            reads, lens = encode_reads_batch(chunk, pad_to=self.pad_len)
            if len(chunk) < B:
                pad = B - len(chunk)
                reads = np.concatenate([reads, np.full((pad, self.pad_len), 4, np.uint8)])
                lens = np.concatenate([lens, np.zeros(pad, np.int32)])
            hi_s, lo_s, v_s, first = self._sketch_count(reads, lens)
            hi_s = np.asarray(hi_s)
            lo_s = np.asarray(lo_s)
            v_s = np.asarray(v_s)
            first = np.asarray(first)
            starts = np.flatnonzero(first & v_s)
            if not len(starts):
                continue
            all_starts = np.flatnonzero(first)
            bounds = np.append(all_starts, len(v_s))
            ends = bounds[np.searchsorted(all_starts, starts) + 1]
            # only count valid entries inside the run (padding shares the
            # all-ones key and is excluded by the v_s cumsum)
            cv = np.concatenate([[0], np.cumsum(v_s)])
            run_counts = cv[ends] - cv[starts]
            hashes = (hi_s[starts].astype(np.uint64) << np.uint64(32)) | lo_s[starts]
            parts_h.append(hashes)
            parts_c.append(run_counts)
        if not parts_h:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        allh = np.concatenate(parts_h)
        allc = np.concatenate(parts_c)
        uh, inv = np.unique(allh, return_inverse=True)
        uc = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        return uh, uc

    def seed_table(self, seqs: list):
        """hash->count over the read batch (device sketch, host merge)."""
        uh, uc = self.seed_table_arrays(seqs)
        return dict(zip(uh.tolist(), uc.tolist()))

    def place(self, seqs: list, min_read_support: int = -1,
              seed_mask_fraction: float = 0.0):
        from .engine import homopolymer_hashes

        uh, uc = self.seed_table_arrays(seqs)
        homo = np.array(homopolymer_hashes(self.params.k), dtype=np.uint64)
        keep = ~np.isin(uh, homo)
        uh, uc = uh[keep], uc[keep]
        if seed_mask_fraction > 0.0 and len(uh):
            n_mask = int(seed_mask_fraction * len(uh))
            if n_mask > 0:
                drop = np.argpartition(-uc, n_mask - 1)[:n_mask]
                mask = np.ones(len(uh), bool)
                mask[drop] = False
                uh, uc = uh[mask], uc[mask]
        if min_read_support < 0:
            multi = uc >= 2
            est = float(uc[multi].mean()) if multi.any() else 0.0
            min_support = 2 if est > 3.0 else 1
        else:
            min_support = min_read_support
        keep = uc >= min_support
        uh, uc = uh[keep], uc[keep]
        log_counts = np.log1p(uc.astype(np.float64))
        mag = float(np.sqrt((log_counts**2).sum()))
        lden = float(log_counts.sum())
        nuniq = len(uh)
        U = self.dev.unique_hashes
        ii = np.searchsorted(U, uh)
        iic = np.minimum(ii, max(len(U) - 1, 0))
        found = (len(U) > 0) & (U[iic] == uh)
        ids = iic[found].astype(np.int32)
        lc = log_counts[found].astype(np.float32)
        acc = np.asarray(
            self._score(self.dev.row_id, self.dev.row_parent, self.dev.row_child,
                        self.dev.row_node, self.dev.euler_in, self.dev.euler_out,
                        jnp.asarray(ids), jnp.asarray(lc)))
        return self._finish_scores(acc, ids, mag, nuniq, lden)

    def _finish_scores(self, acc, read_ids, log_mag, read_unique, logcont_den):
        genome_mag_sq, lograw, logcos, wc_num, logcont, presence = acc.T
        n = self.dev.n_nodes
        scores = np.zeros((n, 5))
        if log_mag > 0:
            scores[:, 0] = lograw / log_mag
            gm = np.sqrt(np.maximum(genome_mag_sq, 0.0))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(gm > 0, logcos / (log_mag * gm), 0.0)
            scores[:, 1] = np.clip(cos, 0.0, 1.0)
        if read_unique > 0:
            scores[:, 2] = presence / read_unique
        a, b = self.dev.root_rows
        rc = np.asarray(self.dev.row_child[a:b])
        rid = np.asarray(self.dev.row_id[a:b])
        pos = np.searchsorted(read_ids, rid)
        posc = np.minimum(pos, max(len(read_ids) - 1, 0))
        found = (len(read_ids) > 0) & (read_ids[posc] == rid)
        inv = np.where((rc > 0) & found, 1.0 / np.maximum(rc, 1.0), 0.0)
        wc_den = float(inv.sum())
        if wc_den > 0:
            scores[:, 3] = wc_num / wc_den
        if logcont_den > 0:
            scores[:, 4] = logcont / logcont_den
        return scores
