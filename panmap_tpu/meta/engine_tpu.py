"""TPU-batched meta read scoring.

Replaces the per-node python DFS of MetaScorer.score_all for large read sets
(mgsr.cpp:7225-7470 scoreReads semantics, identical results).

Shape choice (the reason this is fast on TPU): presence-flip events
(meta/events.py) are first densified into a per-orientation presence BITMAP
`P[(orient, uid), node]` over a chunk of the DFS order — one scatter-add +
prefix-sum per chunk.  A read's fwd/rev match counts at every node in the
chunk are then row-gathers of P at its seedmer uids + a segment-sum by read:
pure streaming HBM work.  The per-(read x event) COO expansion this replaces
is quadratic in the worst case — a conserved-but-polymorphic seedmer that
appears in half the reads AND flips at thousands of nodes contributes
|reads| x |flips| pairs, which blew past 10^9 on real 100k-read samples."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .events import overlap_coefficients_from_events, presence_events


def sketch_meta_reads_batch(seqs: list, k: int, s: int, t: int, l: int,
                            open_: bool, dust_threshold: float = 100.0,
                            mask_read_ends: int = 0, batch: int = 16384,
                            pad_len: int | None = None):
    """Batched twin of engine.sketch_meta_reads_full for l >= 2: the
    syncmer/k-min-mer scan runs on the accelerator per 16k-read batch and
    dedup keys are row bytes of the canonical (hash, rev, qbeg, qend) lists.
    Returns (reads, dup_index, n_dust)."""
    import functools

    from ..sketch.tpu import (
        encode_reads_batch,
        kminmer_batch_full,
        syncmer_scan_batch,
    )
    from .engine import MetaRead, dust_score

    if mask_read_ends > 0:
        seqs = [x[mask_read_ends : len(x) - mask_read_ends]
                if len(x) > 2 * mask_read_ends else x for x in seqs]
    keep_idx = np.arange(len(seqs))
    n_dust = 0
    if dust_threshold < 100.0:
        ok = np.array([dust_score(x) <= dust_threshold for x in seqs])
        n_dust = int((~ok).sum())
        keep_idx = keep_idx[ok]
        seqs = [seqs[i] for i in keep_idx]
    pad = pad_len or max((len(x) for x in seqs), default=k)
    pad = max(pad, k + 1)

    @functools.partial(jax.jit, static_argnames=())
    def sketch(reads, lens):
        hh, hl, is_sync = syncmer_scan_batch(reads, lens, k, s, t, open_)
        return kminmer_batch_full(hh, hl, is_sync, k, l)

    lists: dict = {}
    order_keys: list = []
    for off in range(0, len(seqs), batch):
        chunk = seqs[off : off + batch]
        enc, lens = encode_reads_batch(chunk, pad_to=pad)
        kh, kl, valid, rv, qb, qe = (np.asarray(x) for x in sketch(enc, lens))
        H = (kh.astype(np.uint64) << np.uint64(32)) | kl.astype(np.uint64)
        H = np.where(valid, H, 0)
        nvalid = valid.sum(axis=1)
        # canonical row key: trimmed-to-count is implied because invalid
        # slots are zeroed and the count is part of the key
        for j in range(len(chunk)):
            nv = int(nvalid[j])
            if nv == 0:
                continue
            key = (nv, H[j].tobytes(), rv[j].tobytes(), qb[j].tobytes(),
                   qe[j].tobytes())
            orig = int(keep_idx[off + j])
            ent = lists.get(key)
            if ent is None:
                m = valid[j]
                lists[key] = [MetaRead(hashes=H[j][m], revs=rv[j][m],
                                       n_dup=0,
                                       qbeg=qb[j][m].astype(np.int64),
                                       qend=qe[j][m].astype(np.int64)),
                              [orig]]
            else:
                ent[1].append(orig)
    reads = []
    dup_index = []
    for rd, members in lists.values():
        rd.n_dup = len(members)
        reads.append(rd)
        dup_index.append(members)
    return reads, dup_index, n_dust


def _pad_pow2(n: int, lo: int = 1 << 12) -> int:
    m = lo
    while m < n:
        m <<= 1
    return m


class TpuMetaScorer:
    """score_all twin over a chunked dense presence bitmap (see module doc)."""

    NODE_CHUNK = 2048
    READ_CHUNK = 4096

    def __init__(self, midx, reads: list, batch: int = 512):
        del batch  # legacy knob of the COO scorer
        self.midx = midx
        self.reads = reads
        self.n_nodes = len(midx.node_ids)

        all_h = (np.concatenate([r.hashes for r in reads])
                 if reads else np.empty(0, np.uint64))
        self.read_hashes = np.unique(all_h)
        self.ev = presence_events(midx, self.read_hashes)
        U = len(self.read_hashes)
        self.U = U
        self.Upad = _pad_pow2(max(U, 1), lo=1 << 10)
        # P row layout: [fwd uid rows | rev uid rows | one zero dummy row]
        self.n_rows = 2 * self.Upad + 1

        # flip events sorted by preorder position, keyed by (orient, uid)
        ev = self.ev
        key = (np.where(ev["ev_rev"], self.Upad, 0)
               + ev["ev_uid"]).astype(np.int64)
        order = np.argsort(ev["ev_node"], kind="stable")
        self._evp_pos = ev["ev_node"][order].astype(np.int64)
        self._evp_key = key[order]
        self._evp_delta = ev["ev_delta"][order].astype(np.int32)
        # kept for events introspection / driver log lines
        self.ev_pos = self._evp_pos

        # occurrence arrays, read-major
        r_uid, r_rev = [], []
        for r in reads:
            r_uid.append(np.searchsorted(self.read_hashes,
                                         r.hashes).astype(np.int64))
            r_rev.append(np.asarray(r.revs, dtype=bool))
        self.r_uid = r_uid
        self.r_rev = r_rev
        R = len(reads)
        nseeds = np.array([len(u) for u in r_uid], dtype=np.int64)
        occ_uid = np.concatenate(r_uid) if reads else np.empty(0, np.int64)
        occ_rev = np.concatenate(r_rev) if reads else np.empty(0, bool)
        self.occ_read = np.repeat(np.arange(R, dtype=np.int64), nseeds)
        # P row matching the occurrence's own orientation / the opposite one
        self.occ_fwd_key = np.where(occ_rev, self.Upad + occ_uid, occ_uid)
        self.occ_rev_key = np.where(occ_rev, occ_uid, self.Upad + occ_uid)
        self.occ_bound = np.searchsorted(self.occ_read, np.arange(R + 1))
        ob = self.occ_bound
        rc = self.READ_CHUNK
        starts = np.arange(0, R + rc, rc).clip(max=R)
        self._max_occ = int(np.max(np.diff(ob[starts]))) if R else 0
        self._obpad = _pad_pow2(max(self._max_occ, 1))

        # per-node-chunk carry-in presence state (flips with pos < chunk lo)
        C = self.NODE_CHUNK
        self._chunk_lo = list(range(0, self.n_nodes + 1, C))
        self._carries = []
        state = np.zeros(self.n_rows, dtype=np.int32)
        prev = 0
        for lo in self._chunk_lo:
            cut = np.searchsorted(self._evp_pos, lo)
            np.add.at(state, self._evp_key[prev:cut],
                      self._evp_delta[prev:cut])
            prev = cut
            self._carries.append(state.copy())
        self._max_ev = 0
        bounds = np.searchsorted(self._evp_pos,
                                 self._chunk_lo + [self.n_nodes + 1])
        if len(bounds) > 1:
            self._max_ev = int(np.max(np.diff(bounds)))
        self._ev_bounds = bounds
        self._evpad = _pad_pow2(max(self._max_ev, 1))
        self._build_fn = None
        self._score_fn = None
        self._assign_fn = None

    def overlap_coefficients(self) -> np.ndarray:
        """OC per dfs index as prefix sums of the presence events."""
        return overlap_coefficients_from_events(self.ev, self.n_nodes)

    # ---- device programs (one compile each; shapes fixed per run) ----

    def _make_build_fn(self):
        n_rows = self.n_rows
        C = self.NODE_CHUNK

        @jax.jit
        def build(state, ev_key, ev_col, ev_delta):
            flat = jnp.zeros(n_rows * C, jnp.int32).at[
                ev_key * C + ev_col].add(ev_delta, mode="drop")
            M = flat.reshape(n_rows, C)
            M = M.at[:, 0].add(state)
            return (jnp.cumsum(M, axis=1) > 0).astype(jnp.int8)

        return build

    def _p_chunk(self, ci: int):
        """Presence bitmap for node-chunk ci: i8 [n_rows, NODE_CHUNK]."""
        if self._build_fn is None:
            self._build_fn = self._make_build_fn()
        lo = self._chunk_lo[ci]
        a, b = self._ev_bounds[ci], self._ev_bounds[ci + 1]
        n = b - a
        pad = self._evpad - n
        ev_key = np.concatenate([self._evp_key[a:b],
                                 np.full(pad, self.n_rows - 1, np.int64)])
        ev_col = np.concatenate([self._evp_pos[a:b] - lo, np.zeros(pad, np.int64)])
        ev_delta = np.concatenate([self._evp_delta[a:b], np.zeros(pad, np.int32)])
        return self._build_fn(self._carries[ci], ev_key.astype(np.int32),
                              ev_col.astype(np.int32), ev_delta)

    def _read_chunk_args(self, off: int, hi: int):
        a, b = int(self.occ_bound[off]), int(self.occ_bound[hi])
        pad = self._obpad - (b - a)
        dummy = self.n_rows - 1
        fwd = np.concatenate([self.occ_fwd_key[a:b],
                              np.full(pad, dummy, np.int64)])
        rev = np.concatenate([self.occ_rev_key[a:b],
                              np.full(pad, dummy, np.int64)])
        loc = np.concatenate([self.occ_read[a:b] - off,
                              np.full(pad, self.READ_CHUNK, np.int64)])
        return (fwd.astype(np.int32), rev.astype(np.int32),
                loc.astype(np.int32))

    def _make_score_fn(self, W: int):
        B = self.READ_CHUNK

        @jax.jit
        def score(P, fwd_key, rev_key, readloc, cand_local):
            gf = P[fwd_key].astype(jnp.int32)  # [OB, C]
            gr = P[rev_key].astype(jnp.int32)
            fwd = jax.ops.segment_sum(gf, readloc, num_segments=B + 1)[:B]
            rev = jax.ops.segment_sum(gr, readloc, num_segments=B + 1)[:B]
            sc = jnp.maximum(fwd, rev)  # [B, C]
            return jnp.max(sc, axis=1), sc[:, cand_local]

        del W  # shape comes from cand_local; kept for cache keying clarity
        return score

    def score_all(self, candidate_nodes: list, snap_device: bool = False):
        """Returns (max_score i32[R], snap).

        snap_device=False: snap u16[len(candidates), R] on host (legacy).
        snap_device=True:  snap u16[R, len(candidates)] LEFT ON DEVICE — feed
        it straight to run_squarem's device backend (no matrix round-trip)."""
        R = len(self.reads)
        n_cand = len(candidate_nodes)
        C = self.NODE_CHUNK
        cand = np.asarray(candidate_nodes, dtype=np.int64)
        # candidates grouped by node chunk; W = padded per-chunk width
        cand_ci = (cand // C).astype(np.int64)
        cand_order = np.argsort(cand_ci, kind="stable")
        W = 1
        per_chunk: dict = {}
        for ci in range(len(self._chunk_lo)):
            sel = cand_order[cand_ci[cand_order] == ci]
            per_chunk[ci] = sel
            W = max(W, len(sel))
        W = _pad_pow2(W, lo=64)
        if self._score_fn is None:
            self._score_fn = self._make_score_fn(W)

        read_starts = list(range(0, R, self.READ_CHUNK))
        max_parts: list = [[] for _ in read_starts]
        snap_parts: list = [[] for _ in read_starts]
        col_order: list = []
        rc_args = [self._read_chunk_args(off, min(off + self.READ_CHUNK, R))
                   for off in read_starts]
        for ci in range(len(self._chunk_lo)):
            sel = per_chunk[ci]
            P = self._p_chunk(ci)
            local = np.zeros(W, dtype=np.int32)
            local[: len(sel)] = cand[sel] - self._chunk_lo[ci]
            col_order.extend(sel.tolist())
            for ri, (fwd, rev, loc) in enumerate(rc_args):
                ms, sc = self._score_fn(P, fwd, rev, loc, local)
                max_parts[ri].append(ms)
                if len(sel):
                    snap_parts[ri].append(sc[:, : len(sel)])

        max_rows = [jnp.max(jnp.stack(p), axis=0) for p in max_parts]
        max_score = np.concatenate([np.asarray(m) for m in max_rows])[:R]
        if n_cand == 0:
            if snap_device:
                return max_score.astype(np.int32), jnp.zeros((R, 0), jnp.uint16)
            return max_score.astype(np.int32), np.zeros((0, R), np.uint16)
        # assemble [R, n_cand] in ORIGINAL candidate order
        inv = np.empty(len(col_order), dtype=np.int64)
        inv[np.asarray(col_order)] = np.arange(len(col_order))
        rows = [jnp.concatenate(p, axis=1) for p in snap_parts]
        snap_dev = jnp.concatenate(rows, axis=0)[:R][:, jnp.asarray(inv)]
        snap_dev = snap_dev.astype(jnp.uint16)
        if snap_device:
            return max_score.astype(np.int32), snap_dev
        return max_score.astype(np.int32), np.asarray(snap_dev).T.copy()

    def _make_assign_fn(self):
        B = self.READ_CHUNK
        C = self.NODE_CHUNK

        @jax.jit
        def run(P, fwd_key, rev_key, readloc, eff_b, thr_b, keep_c, iota_c):
            gf = P[fwd_key].astype(jnp.int32)
            gr = P[rev_key].astype(jnp.int32)
            fwd = jax.ops.segment_sum(gf, readloc, num_segments=B + 1)[:B]
            rev = jax.ops.segment_sum(gr, readloc, num_segments=B + 1)[:B]
            sc = jnp.maximum(fwd, rev)
            live = eff_b[:, None] > 0
            is_max_all = (sc == eff_b[:, None]) & live
            is_max = is_max_all & keep_c[None, :]
            near = (sc >= (eff_b - thr_b)[:, None]) & live
            lca_min = jnp.min(jnp.where(is_max_all, iota_c, 1 << 30), axis=1)
            lca_max = jnp.max(jnp.where(is_max_all, iota_c, -1), axis=1)
            pack = jnp.arange(8, dtype=jnp.int32)
            bits_max = jnp.sum(is_max.reshape(B, C // 8, 8)
                               << pack[None, None, :], axis=2).astype(jnp.uint8)
            bits_near = jnp.sum(near.reshape(B, C // 8, 8)
                                << pack[None, None, :], axis=2).astype(jnp.uint8)
            return (bits_max, bits_near, jnp.sum(is_max, axis=1),
                    lca_min, lca_max)

        return run

    def assignment_pass(self, keep: np.ndarray, eff: np.ndarray,
                        amb_thr: int = 0, amb_ratio: float = 0.0):
        """Full-matrix assignment support (the python assignReadsBatch DFS in
        closed form): per read with eff>0, the kept nodes scoring == eff
        (max-parsimony placements) and those >= eff - threshold (near-max,
        for taxonomy ambiguity).  Returns (assigned_by_node, near_iter, epp,
        (lca_lo, lca_hi)) — see meta/assign.py."""
        R = len(self.reads)
        C = self.NODE_CHUNK
        if self._assign_fn is None:
            self._assign_fn = self._make_assign_fn()

        assigned_by_node: dict = {}
        near_sets: dict = {}
        epp = np.zeros(R, dtype=np.int64)
        lca_lo = np.full(R, 1 << 30, dtype=np.int64)
        lca_hi = np.full(R, -1, dtype=np.int64)
        read_starts = list(range(0, R, self.READ_CHUNK))
        rc_args = [self._read_chunk_args(off, min(off + self.READ_CHUNK, R))
                   for off in read_starts]
        for ci in range(len(self._chunk_lo)):
            lo = self._chunk_lo[ci]
            valid_c = min(C, self.n_nodes - lo)
            if valid_c <= 0:
                continue
            P = self._p_chunk(ci)
            keep_c = np.zeros(C, dtype=bool)
            keep_c[:valid_c] = keep[lo : lo + valid_c]
            iota_c = np.full(C, 1 << 30, dtype=np.int32)
            iota_c[:valid_c] = lo + np.arange(valid_c)
            for ri, off in enumerate(read_starts):
                hi = min(off + self.READ_CHUNK, R)
                fwd, rev, loc = rc_args[ri]
                eff_b = np.zeros(self.READ_CHUNK, dtype=np.int32)
                eff_b[: hi - off] = eff[off:hi]
                thr_b = np.maximum(amb_thr,
                                   (eff_b * amb_ratio).astype(np.int32))
                bm, bn, cnt, lmin, lmax = self._assign_fn(
                    P, fwd, rev, loc, eff_b, thr_b, keep_c, iota_c)
                n = hi - off
                epp[off:hi] += np.asarray(cnt)[:n]
                lmin = np.asarray(lmin)[:n]
                lmax = np.asarray(lmax)[:n]
                lca_lo[off:hi] = np.minimum(lca_lo[off:hi], lmin)
                lca_hi[off:hi] = np.maximum(lca_hi[off:hi], lmax)
                bm_h = np.unpackbits(np.asarray(bm)[:n], axis=1,
                                     bitorder="little")[:, :valid_c]
                rr, nn = np.nonzero(bm_h)
                for r_loc, node in zip(rr.tolist(), nn.tolist()):
                    assigned_by_node.setdefault(lo + node, []).append(off + r_loc)
                bn_h = np.unpackbits(np.asarray(bn)[:n], axis=1,
                                     bitorder="little")[:, :valid_c]
                rr, nn = np.nonzero(bn_h)
                for r_loc, node in zip(rr.tolist(), nn.tolist()):
                    near_sets.setdefault(off + r_loc, []).append(lo + node)
        near_iter = [(r, np.array(sorted(ns), dtype=np.int64))
                     for r, ns in sorted(near_sets.items())]
        lca_lo[lca_lo == (1 << 30)] = -1
        return assigned_by_node, near_iter, epp, (lca_lo, lca_hi)
