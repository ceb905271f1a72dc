"""TPU-batched meta read scoring.

Replaces the per-node python DFS of MetaScorer.score_all for large read sets:
presence-flip events (meta/events.py) turn the tree walk into 1-D prefix
sums over the DFS order, so a whole batch of reads is scored against ALL
nodes with one scatter-add + cumsum + max on the device
(mgsr.cpp:7225-7470 scoreReads semantics, identical results).

Per batch: the host joins read seedmers against the event table by hash uid
(CSR expansion, vectorized numpy), ships COO triplets (read, euler_pos,
delta) split by orientation agreement, and the device reduces.
"""

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
    """score_all twin over presence events; batch-parallel on device."""

    def __init__(self, midx, reads: list, batch: int = 512):
        self.midx = midx
        self.reads = reads
        self.batch = batch
        self.n_nodes = len(midx.node_ids)

        # unique read hashes (uid space)
        all_h = (np.concatenate([r.hashes for r in reads])
                 if reads else np.empty(0, np.uint64))
        self.read_hashes = np.unique(all_h)
        ev = presence_events(midx, self.read_hashes)
        self.ev = ev

        # CSR of events by uid
        order = np.argsort(ev["ev_uid"], kind="stable")
        self.ev_pos = ev["ev_node"][order]
        self.ev_rev = ev["ev_rev"][order]
        self.ev_delta = ev["ev_delta"][order].astype(np.int32)
        uid_sorted = ev["ev_uid"][order]
        self.uid_start = np.searchsorted(uid_sorted, np.arange(len(self.read_hashes)))
        self.uid_end = np.searchsorted(uid_sorted, np.arange(len(self.read_hashes)) + 1)

        # per-read uid/rev lists
        self.r_uid = []
        self.r_rev = []
        for r in reads:
            ii = np.searchsorted(self.read_hashes, r.hashes)
            self.r_uid.append(ii.astype(np.int64))
            self.r_rev.append(np.asarray(r.revs, dtype=bool))

        self._score_fn = None

    def overlap_coefficients(self) -> np.ndarray:
        """OC per dfs index as prefix sums of the presence events."""
        return overlap_coefficients_from_events(self.ev, self.n_nodes)

    def _make_score_fn(self, n_pairs: int, n_cand: int):
        n_nodes = self.n_nodes
        B = self.batch

        @jax.jit
        def score(pr_read, pr_pos, pr_fwd, pr_rev, cand_pos):
            width = n_nodes + 1
            flat_f = jnp.zeros(B * width, jnp.int32).at[
                pr_read * width + pr_pos].add(pr_fwd, mode="drop")
            flat_r = jnp.zeros(B * width, jnp.int32).at[
                pr_read * width + pr_pos].add(pr_rev, mode="drop")
            cf = jnp.cumsum(flat_f.reshape(B, width), axis=1)
            cr = jnp.cumsum(flat_r.reshape(B, width), axis=1)
            sc = jnp.maximum(cf, cr)[:, :n_nodes]
            return jnp.max(sc, axis=1), sc[:, cand_pos]

        return score

    def _batch_coo(self, off, hi):
        """Expand one read batch into COO (read_local, euler_pos, fwd, rev)."""
        uid = self.r_uid[off:hi]
        rev = self.r_rev[off:hi]
        reads_rep, ev_idx, agree = [], [], []
        for li, (u, rv) in enumerate(zip(uid, rev)):
            ns = self.uid_start[u]
            ne = self.uid_end[u]
            cnt = ne - ns
            tot = int(cnt.sum())
            if tot == 0:
                continue
            idx = np.repeat(ns, cnt) + (
                np.arange(tot)
                - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt))
            rrev = np.repeat(rv, cnt)
            reads_rep.append(np.full(len(idx), li, dtype=np.int32))
            ev_idx.append(idx)
            agree.append(self.ev_rev[idx] == rrev)
        if not ev_idx:
            return None
        reads_rep = np.concatenate(reads_rep)
        ev_idx = np.concatenate(ev_idx)
        agree = np.concatenate(agree)
        deltas = self.ev_delta[ev_idx]
        pos = self.ev_pos[ev_idx].astype(np.int32)
        return (reads_rep, pos,
                np.where(agree, deltas, 0).astype(np.int32),
                np.where(agree, 0, deltas).astype(np.int32))

    def assignment_pass(self, keep: np.ndarray, eff: np.ndarray,
                        amb_thr: int = 0, amb_ratio: float = 0.0):
        """Full-matrix assignment support (the python assignReadsBatch DFS,
        evaluated in closed form): for each read with eff>0, the sets of
        kept nodes where score == eff (max-parsimony placements) and where
        score >= eff - threshold (near-max, for taxonomy ambiguity).

        Returns (assigned_by_node: dict node -> list[read], near_iter:
        list[(read, node_array)] for near-max nodes, epp i64[R],
        lca_bounds (min_dfs, max_dfs) per read)."""
        R = len(self.reads)
        n_nodes = self.n_nodes
        B = self.batch
        keep_j = jnp.asarray(keep)
        fns = {}

        def make(npairs):
            @jax.jit
            def run(pr_read, pr_pos, pr_fwd, pr_rev, eff_b, thr_b):
                width = n_nodes + 1
                flat_f = jnp.zeros(B * width, jnp.int32).at[
                    pr_read * width + pr_pos].add(pr_fwd, mode="drop")
                flat_r = jnp.zeros(B * width, jnp.int32).at[
                    pr_read * width + pr_pos].add(pr_rev, mode="drop")
                sc = jnp.maximum(jnp.cumsum(flat_f.reshape(B, width), axis=1),
                                 jnp.cumsum(flat_r.reshape(B, width), axis=1))[:, :n_nodes]
                live = eff_b[:, None] > 0
                is_max_all = (sc == eff_b[:, None]) & live
                is_max = is_max_all & keep_j[None, :]
                near = (sc >= (eff_b - thr_b)[:, None]) & live
                iota = jnp.arange(n_nodes, dtype=jnp.int32)
                # preorder LCA of a node set = LCA(min dfs, max dfs); bounds
                # over ALL max nodes (kept or not), matching the python DFS
                lca_min = jnp.min(jnp.where(is_max_all, iota, n_nodes), axis=1)
                lca_max = jnp.max(jnp.where(is_max_all, iota, -1), axis=1)
                return is_max, near, jnp.sum(is_max, axis=1), lca_min, lca_max
            return run

        assigned_by_node: dict = {}
        near_iter = []
        epp = np.zeros(R, dtype=np.int64)
        lca_lo = np.full(R, -1, dtype=np.int64)
        lca_hi = np.full(R, -1, dtype=np.int64)
        for off in range(0, R, B):
            hi = min(off + B, R)
            coo = self._batch_coo(off, hi)
            if coo is None:
                continue
            reads_rep, pos, fwd_val, rev_val = coo
            npairs = _pad_pow2(len(pos))
            padw = npairs - len(pos)
            eff_b = np.zeros(B, dtype=np.int32)
            eff_b[: hi - off] = eff[off:hi]
            thr_b = np.maximum(amb_thr,
                               (eff_b * amb_ratio).astype(np.int32))
            if npairs not in fns:
                fns[npairs] = make(npairs)
            is_max, near, cnt, lmin, lmax = fns[npairs](
                np.pad(reads_rep, (0, padw), constant_values=B),
                np.pad(pos, (0, padw)), np.pad(fwd_val, (0, padw)),
                np.pad(rev_val, (0, padw)), eff_b, thr_b)
            is_max = np.asarray(is_max)[: hi - off]
            near = np.asarray(near)[: hi - off]
            epp[off:hi] = np.asarray(cnt)[: hi - off]
            lca_lo[off:hi] = np.asarray(lmin)[: hi - off]
            lca_hi[off:hi] = np.asarray(lmax)[: hi - off]
            rr, nn = np.nonzero(is_max)
            for r_loc, node in zip(rr.tolist(), nn.tolist()):
                assigned_by_node.setdefault(node, []).append(off + r_loc)
            for r_loc in range(hi - off):
                nz = np.flatnonzero(near[r_loc])
                if len(nz):
                    near_iter.append((off + r_loc, nz))
        return assigned_by_node, near_iter, epp, (lca_lo, lca_hi)

    def score_all(self, candidate_nodes: list):
        """Returns (max_score i32[R], snap u16[len(candidates), R])."""
        R = len(self.reads)
        n_cand = len(candidate_nodes)
        cand_pos = np.asarray(candidate_nodes, dtype=np.int64)
        if n_cand == 0:
            cand_pos = np.zeros(1, dtype=np.int64)
        max_score = np.zeros(R, dtype=np.int32)
        snap = np.zeros((n_cand, R), dtype=np.uint16)
        fns = {}

        B = self.batch
        for off in range(0, R, B):
            hi = min(off + B, R)
            uid = self.r_uid[off:hi]
            rev = self.r_rev[off:hi]
            # CSR expansion: (read_local, event) pairs
            reads_rep = []
            ev_idx = []
            agree = []
            for li, (u, rv) in enumerate(zip(uid, rev)):
                ns = self.uid_start[u]
                ne = self.uid_end[u]
                cnt = ne - ns
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                # expand ranges [ns_j, ne_j): base offset per element
                idx = np.repeat(ns, cnt) + (
                    np.arange(tot)
                    - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt))
                rrev = np.repeat(rv, cnt)
                reads_rep.append(np.full(len(idx), li, dtype=np.int32))
                ev_idx.append(idx)
                agree.append(self.ev_rev[idx] == rrev)
            if not ev_idx:
                continue
            reads_rep = np.concatenate(reads_rep)
            ev_idx = np.concatenate(ev_idx)
            agree = np.concatenate(agree)
            deltas = self.ev_delta[ev_idx]
            pos = self.ev_pos[ev_idx].astype(np.int32)
            fwd_val = np.where(agree, deltas, 0).astype(np.int32)
            rev_val = np.where(agree, 0, deltas).astype(np.int32)

            npairs = _pad_pow2(len(pos))
            padw = npairs - len(pos)
            pr_read = np.pad(reads_rep, (0, padw), constant_values=B)  # dropped
            pr_pos = np.pad(pos, (0, padw))
            pr_f = np.pad(fwd_val, (0, padw))
            pr_r = np.pad(rev_val, (0, padw))

            key = npairs
            if key not in fns:
                fns[key] = self._make_score_fn(npairs, len(cand_pos))
            ms, sc_cand = fns[key](pr_read, pr_pos, pr_f, pr_r, cand_pos)
            ms = np.asarray(ms)[: hi - off]
            max_score[off:hi] = ms
            if n_cand:
                snap[:, off:hi] = np.asarray(sc_cand).T[:, : hi - off]
        return max_score, snap
