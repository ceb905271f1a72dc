"""End-to-end TPU placement query: read batch -> seed table -> per-node scores.

The throughput path the bench measures.  Everything stays on device: the read
batch is sketched with the batched syncmer/k-min-mer kernels (sketch/tpu.py),
per-read k-min-mers are sorted + run-length-counted with lax.sort (two u32 keys
= native u64 ordering), support/homopolymer filtering and the log-magnitude
statistics are fused in, the seed table joins against the index's unique-hash
table with a vectorized 2-key binary search, and the row-delta scoring program
(place/engine_tpu.py math) finishes with segment sums + the Euler-tour prefix.
Only the [N,6] accumulator and 4 scalars come back over the host link — that
matters here because the axon tunnel makes device->host copies expensive.

Reference equivalent: src/placement.cpp:1128-1930 (read sketching, frequency
table, BFS scoring) as three python loops of jitted programs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..index.builder import IndexArrays
from . import engine_tpu as et
from ..sketch.tpu import (
    encode_reads_batch,
    kminmer_batch,
    pack_reads_2bit,
    syncmer_scan_batch,
    unpack_reads_2bit,
)


def _bsearch2(uhi, ulo, qhi, qlo):
    """Vectorized lexicographic binary search of (qhi,qlo) in sorted (uhi,ulo).
    Returns (idx, found)."""
    n = uhi.shape[0]
    steps = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mhi = uhi[mid]
        mlo = ulo[mid]
        less = (mhi < qhi) | ((mhi == qhi) & (mlo < qlo))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo = jnp.zeros(qhi.shape, dtype=jnp.int32)
    hi = jnp.full(qhi.shape, n, dtype=jnp.int32)
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.clip(lo, 0, max(n - 1, 0))
    found = (uhi[idx] == qhi) & (ulo[idx] == qlo)
    return idx, found


class TpuPlacer:
    """Device index tensors + compiled programs for repeated placement queries."""

    def __init__(self, idx: IndexArrays, pad_len: int = 160, batch: int = 16384):
        self.idx = idx
        self.dev = et.prepare_device_index(idx)
        self.params = idx.params
        self.pad_len = pad_len = ((pad_len + 7) // 8) * 8  # 2-bit pack needs L%8==0
        self.batch = batch
        p = self.params
        k, s, t, l, open_ = p.k, p.s, p.t, p.l, p.open

        U = self.dev.unique_hashes
        self.u_hi = jnp.asarray((U >> np.uint64(32)).astype(np.uint32))
        self.u_lo = jnp.asarray((U & np.uint64(0xFFFFFFFF)).astype(np.uint32))

        from .engine import homopolymer_hashes

        hp = np.array(homopolymer_hashes(k), dtype=np.uint64)
        self.hp_hi = jnp.asarray((hp >> np.uint64(32)).astype(np.uint32))
        self.hp_lo = jnp.asarray((hp & np.uint64(0xFFFFFFFF)).astype(np.uint32))

        L = self.pad_len
        B = batch
        MB = B * (L // 8)

        def _sketch_core(packed, nmask, lengths):
            reads = unpack_reads_2bit(packed, nmask, L)
            hh, hl, is_sync = syncmer_scan_batch(reads, lengths, k, s, t, open_)
            kh, kl, valid = kminmer_batch(hh, hl, is_sync, k, l)
            return kh.reshape(-1), kl.reshape(-1), valid.reshape(-1)

        self._sketch_flat = jax.jit(_sketch_core)

        @jax.jit
        def sketch_sparse(packed, nidx, nval, lengths):
            # N bytes are rare in real FASTQ: rebuild the dense mask from a
            # small (index, value) list instead of shipping B*L/8 bytes
            nmask = (jnp.zeros(MB, jnp.uint8)
                     .at[nidx].set(nval, mode="drop").reshape(B, L // 8))
            return _sketch_core(packed, nmask, lengths)

        self._sketch_sparse = sketch_sparse
        self._finalize_score = self._make_finalize_score()
        self._finalize_full_fn = None  # overflow fallback, compiled on demand

    MAXU = 1 << 18  # compacted read-seed slots (>= distinct seeds in any sample)
    MAXN = 4096     # sparse N-mask slots per chunk (else ship the dense mask)

    def _finalize_stats(self, shi, slo, sv, min_support_cfg):
        """Shared post-sort stage: run-length counts over sorted (hi, lo)
        seeds, homopolymer removal, auto min-read-support
        (placement.cpp:931-955), log-count stats, and the one-time join of the
        kept distinct read seeds against the index's unique-hash table.
        Traced inside a jit; returns per-uid read tables + scalars."""
        n_unique = int(self.dev.unique_hashes.shape[0])
        MAXU = self.MAXU
        n = shi.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
        # run-length counting without scatters: next run start per position
        # via a reversed cummin, then a cumsum difference of valid flags
        cand = jnp.where(first, iota, n)
        nxt = jnp.concatenate(
            [jax.lax.cummin(cand[1:][::-1])[::-1], jnp.full(1, n, jnp.int32)])
        cvv = jnp.concatenate(
            [jnp.zeros(1, jnp.float32), jnp.cumsum(sv.astype(jnp.float32))])
        counts = jnp.where(first, cvv[nxt] - cvv[iota], 0.0)
        is_seed = first & (counts > 0)

        hp_match = jnp.zeros_like(is_seed)
        for i in range(self.hp_hi.shape[0]):
            hp_match |= (shi == self.hp_hi[i]) & (slo == self.hp_lo[i])
        is_seed &= ~hp_match

        multi = is_seed & (counts >= 2)
        msum = jnp.sum(jnp.where(multi, counts, 0.0))
        mcnt = jnp.sum(multi)
        est = jnp.where(mcnt > 0, msum / jnp.maximum(mcnt, 1), 0.0)
        auto_ms = jnp.where(est > 3.0, 2.0, 1.0)
        ms = jnp.where(min_support_cfg < 0, auto_ms, min_support_cfg)
        keep = is_seed & (counts >= ms)

        logc = jnp.where(keep, jnp.log1p(counts), 0.0)
        log_mag = jnp.sqrt(jnp.sum(logc * logc))
        lden = jnp.sum(logc)
        nuniq = jnp.sum(keep)

        slot = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, MAXU)
        rq_hi = jnp.zeros(MAXU, jnp.uint32).at[slot].set(shi, mode="drop")
        rq_lo = jnp.zeros(MAXU, jnp.uint32).at[slot].set(slo, mode="drop")
        rq_lc = jnp.zeros(MAXU, jnp.float32).at[slot].set(logc, mode="drop")
        rq_ok = jnp.arange(MAXU) < nuniq
        uidx, hit = _bsearch2(self.u_hi, self.u_lo, rq_hi, rq_lo)
        put = jnp.where(hit & rq_ok, uidx, n_unique)
        uid_logc = jnp.zeros(n_unique, jnp.float32).at[put].set(
            rq_lc, mode="drop")
        uid_found = jnp.zeros(n_unique, bool).at[put].set(
            hit & rq_ok, mode="drop")
        return uid_logc, uid_found, log_mag, nuniq, lden

    def _score_rows(self, row_id, row_parent, row_child, row_node, euler_in,
                    euler_out, uid_logc, uid_found):
        """Row-delta metric accumulation + Euler-tour prefix (traced inside a
        jit).  Same math as place/engine_tpu.py; see placement.cpp:242-345."""
        n_nodes = self.dev.n_nodes
        a, b = self.dev.root_rows
        found = uid_found[row_id]
        lrc = uid_logc[row_id]
        P = row_parent
        C = row_child
        log_child = jnp.where(C > 0, jnp.log1p(C), 0.0)
        log_parent = jnp.where(P > 0, jnp.log1p(P), 0.0)
        mag_delta = log_child * log_child - log_parent * log_parent
        active = ((C - P) != 0) & found
        became_present = ((P == 0) & (C != 0)).astype(jnp.float32)
        became_absent = ((C == 0) & (P != 0)).astype(jnp.float32)
        presence_delta = jnp.where(active, became_present - became_absent, 0.0)
        old_contrib = jnp.where(P > 0, lrc / jnp.maximum(P, 1.0), 0.0)
        new_contrib = jnp.where(C > 0, lrc / jnp.maximum(C, 1.0), 0.0)
        old_wc = jnp.where(P > 0, 1.0 / jnp.maximum(P, 1.0), 0.0)
        new_wc = jnp.where(C > 0, 1.0 / jnp.maximum(C, 1.0), 0.0)
        lograw_delta = jnp.where(active, new_contrib - old_contrib, 0.0)
        logcos_delta = jnp.where(active, lrc * (log_child - log_parent), 0.0)
        wc_delta = jnp.where(active, new_wc - old_wc, 0.0)
        logcont_delta = presence_delta * lrc
        root_inv = jnp.where((C[a:b] > 0) & found[a:b],
                             1.0 / jnp.maximum(C[a:b], 1.0), 0.0)
        wc_den = jnp.sum(root_inv)
        deltas = jnp.stack(
            [mag_delta, lograw_delta, logcos_delta, wc_delta,
             logcont_delta, presence_delta], axis=1)
        node_sums = jax.ops.segment_sum(deltas, row_node,
                                        num_segments=n_nodes)
        slots = jnp.zeros((2 * n_nodes + 1, 6), dtype=jnp.float32)
        slots = slots.at[euler_in].add(node_sums)
        slots = slots.at[euler_out + 1].add(-node_sums)
        pref = jnp.cumsum(slots, axis=0)
        return pref[euler_in], wc_den

    def _make_finalize_score(self):
        """One fused program: compact the valid k-min-mer slots (typically
        ~25% of the padded [reads x slots] grid) BEFORE the expensive 2-key
        sort, then stats + index join + row scoring.  An all-ones hash marks
        padding, so validity is recoverable after the sort (a genuine all-ones
        seed hash — p ~ 2^-64 — would be dropped; the overflow flag triggers
        the uncompacted fallback when >CAP valid slots appear)."""

        @jax.jit
        def run(kh, kl, valid, min_support_cfg, row_id, row_parent, row_child,
                row_node, euler_in, euler_out):
            total = kh.shape[0]
            CAP = max(total // 2, 1024)
            ones = jnp.uint32(0xFFFFFFFF)
            pos = jnp.cumsum(valid.astype(jnp.int32))
            nvalid = pos[-1]
            overflow = nvalid > CAP
            slot = jnp.where(valid, pos - 1, CAP)
            ckh = jnp.full(CAP, ones).at[slot].set(kh, mode="drop")
            ckl = jnp.full(CAP, ones).at[slot].set(kl, mode="drop")
            shi, slo = jax.lax.sort((ckh, ckl), num_keys=2)
            sv = ~((shi == ones) & (slo == ones))
            uid_logc, uid_found, log_mag, nuniq, lden = self._finalize_stats(
                shi, slo, sv, min_support_cfg)
            acc, wc_den = self._score_rows(
                row_id, row_parent, row_child, row_node, euler_in, euler_out,
                uid_logc, uid_found)
            return acc, wc_den, log_mag, nuniq, lden, overflow

        return run

    def _finalize_full(self, kh, kl, valid, min_support_cfg):
        """Uncompacted path (sorts every padded slot); only used if the
        compacted buffer would overflow."""
        if self._finalize_full_fn is None:

            @jax.jit
            def finalize(kh, kl, valid, min_support_cfg):
                shi, slo, sv = jax.lax.sort(
                    (kh, kl, valid.astype(jnp.uint32)), num_keys=2)
                return self._finalize_stats(shi, slo, sv, min_support_cfg)

            self._finalize_full_fn = finalize
        return self._finalize_full_fn(kh, kl, valid, min_support_cfg)

    def sketch_device(self, seqs: list):
        parts = []
        B = self.batch
        for off in range(0, len(seqs), B):
            chunk = seqs[off : off + B]
            reads, lens = encode_reads_batch(chunk, pad_to=self.pad_len)
            if len(chunk) < B:
                pad = B - len(chunk)
                reads = np.concatenate(
                    [reads, np.full((pad, self.pad_len), 4, np.uint8)])
                lens = np.concatenate([lens, np.zeros(pad, np.int32)])
            packed, nmask = pack_reads_2bit(reads)
            flat = nmask.reshape(-1)
            nz = np.flatnonzero(flat)
            if nz.size <= self.MAXN:
                nidx = np.full(self.MAXN, flat.size, np.int32)
                nidx[: nz.size] = nz
                nval = np.zeros(self.MAXN, np.uint8)
                nval[: nz.size] = flat[nz]
                parts.append(self._sketch_sparse(packed, nidx, nval, lens))
            else:
                parts.append(self._sketch_flat(packed, nmask, lens))
        kh = jnp.concatenate([p[0] for p in parts])
        kl = jnp.concatenate([p[1] for p in parts])
        vv = jnp.concatenate([p[2] for p in parts])
        return kh, kl, vv

    def place(self, seqs: list, min_read_support: int = -1):
        kh, kl, vv = self.sketch_device(seqs)
        dev = self.dev
        acc, wc_den, log_mag, nuniq, lden, overflow = self._finalize_score(
            kh, kl, vv, float(min_read_support), dev.row_id, dev.row_parent,
            dev.row_child, dev.row_node, dev.euler_in, dev.euler_out)
        if bool(overflow):  # >CAP distinct-slot seeds: redo without compaction
            uid_logc, uid_found, log_mag, nuniq, lden = self._finalize_full(
                kh, kl, vv, float(min_read_support))
            acc, wc_den = self._score_by_table(uid_logc, uid_found)
        self._last_wc_den = float(wc_den)
        return self._finish_scores(np.asarray(acc), float(log_mag), int(nuniq),
                                   float(lden))

    def _score_by_table(self, uid_logc, uid_found):
        """Score rows by gathering each row's unique-hash id from the dense
        per-uid read tables built in finalize (one gather per row; the
        expensive join already happened on the compacted read seeds)."""
        dev = self.dev
        if not hasattr(self, "_score_tab_fn"):
            self._score_tab_fn = jax.jit(self._score_rows)
        return self._score_tab_fn(
            dev.row_id, dev.row_parent, dev.row_child, dev.row_node,
            dev.euler_in, dev.euler_out, uid_logc, uid_found)

    def _finish_scores(self, acc, log_mag, read_unique, logcont_den):
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
        wc_den = getattr(self, "_last_wc_den", 0.0)
        if wc_den > 0:
            scores[:, 3] = wc_num / wc_den
        if logcont_den > 0:
            scores[:, 4] = logcont / logcont_den
        return scores
