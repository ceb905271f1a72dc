#!/usr/bin/env python
"""Fuzz study: pseudochain REBUILD (this repo) vs INCREMENTAL-PATCH (reference)
minichain semantics.

This repo's --pseudochain scorer rebuilds a touched read's minichains from
scratch at every node (panmap_tpu/meta/engine.py::score_all_pseudo); the
reference patches the read's existing chain list in place
(/root/reference/src/mgsr.cpp:4616-5478: fillReadToAffectedSeedmerIndex ->
updateMinichains / updateMinichainsMixed / initializeReadMinichains dispatch,
addToMinichains / removeFromMinichains splice ops).  PARITY.md records the
deviation; this tool QUANTIFIES it.

Both semantics are modelled here against one shared mutable reference state
(position map + hash multimap, gapless coordinates so the chain machinery —
not the separately-oracled GapTracker — is what is being compared):

  * rebuild_chains            == initializeReadMinichains + extendMinichain
  * IncrementalRead.apply     == the reference's per-node patch pipeline,
                                 including the all-same-type fast path, the
                                 mixed path, the >= len/2 full-rebuild
                                 fallback, and the splice/merge ops
  * pseudo_score              == getReadPseudoScore + isColinearFromMinichains

The fuzzer drives random edit scripts (seed moves, duplicate transitions,
inserts landing INSIDE active chains, deletes that butt two chains together)
over random reads and diffs the two chain lists + scores after every node.

Run:  python tools/fuzz_pseudochain.py [n_cases] [seed]
Exit 0 always; prints a summary + writes a breakdown of any disagreements.
"""
from __future__ import annotations

import bisect
import sys
from collections import defaultdict
from dataclasses import dataclass, field
from random import Random

SPAN = 10  # seedmer footprint: end = beg + SPAN - 1 (both ref and query)
QSTEP = 4  # query-coordinate stride between consecutive read seedmers
MAX_GAP = 50


# ---------------------------------------------------------------------------
# shared reference state
# ---------------------------------------------------------------------------
class RefState:
    """positionMap (sorted positions -> (hash, rev)) + hashToPositionMap."""

    def __init__(self):
        self.positions: list[int] = []  # sorted
        self.info: dict[int, tuple[int, bool]] = {}  # pos -> (hash, rev)
        self.by_hash: dict[int, list[int]] = defaultdict(list)  # sorted pos

    def insert(self, pos: int, h: int, rev: bool):
        assert pos not in self.info
        bisect.insort(self.positions, pos)
        self.info[pos] = (h, rev)
        bisect.insort(self.by_hash[h], pos)

    def delete(self, pos: int):
        h, _ = self.info.pop(pos)
        self.positions.remove(pos)
        self.by_hash[h].remove(pos)
        if not self.by_hash[h]:
            del self.by_hash[h]

    def status(self, h: int) -> str:
        n = len(self.by_hash.get(h, ()))
        return "NE" if n == 0 else ("U" if n == 1 else "D")

    def unique_pos(self, h: int) -> int:
        ps = self.by_hash[h]
        assert len(ps) == 1
        return ps[0]

    def rank(self, pos: int) -> int:
        return bisect.bisect_left(self.positions, pos)

    def neighbor(self, pos: int, rev: bool) -> int | None:
        """map-adjacent active position in the chain direction."""
        i = self.rank(pos) + (-1 if rev else 1)
        return self.positions[i] if 0 <= i < len(self.positions) else None


@dataclass
class Read:
    hashes: list[int]
    qrevs: list[bool]

    @property
    def n(self):
        return len(self.hashes)

    def qbeg(self, i):
        return i * QSTEP

    def qend(self, i):
        return i * QSTEP + SPAN - 1


# ---------------------------------------------------------------------------
# REBUILD semantics (this repo): initializeReadMinichains + extendMinichain
# ---------------------------------------------------------------------------
def rebuild_chains(read: Read, st: RefState) -> list[tuple[int, int, bool]]:
    out = []
    i = 0
    while i < read.n:
        h = read.hashes[i]
        c = 1
        ps = st.by_hash.get(h)
        if ps is not None and len(ps) == 1:
            pos = ps[0]
            rev = read.qrevs[i] != st.info[pos][1]
            end = i
            cur = pos
            while end + 1 < read.n:
                nh = read.hashes[end + 1]
                nps = st.by_hash.get(nh)
                if nps is None or len(nps) != 1:
                    break
                npos = nps[0]
                if (read.qrevs[end + 1] != st.info[npos][1]) != rev:
                    break
                if st.neighbor(cur, rev) != npos:
                    break
                end += 1
                cur = npos
            c = end - i + 1
            out.append((i, end, rev))
        i += c
    return out


# ---------------------------------------------------------------------------
# scoring: getReadPseudoScore + isColinearFromMinichains (gapless degap)
# ---------------------------------------------------------------------------
def _colinear(read: Read, st: RefState, c1, c2) -> bool:
    """c1 earlier on the read than c2 (reference call order)."""
    rev = c1[2]
    b1, e1 = c1[0], c1[1]
    b2, e2 = c2[0], c2[1]
    qgap = abs(read.qbeg(b2) - read.qend(e1))
    if not rev:
        rbeg1 = st.unique_pos(read.hashes[b1])
        rbeg2 = st.unique_pos(read.hashes[b2])
        rend1 = st.unique_pos(read.hashes[e1]) + SPAN - 1
        rgap = abs(rbeg2 - rend1)
        return rbeg1 < rbeg2 and abs(qgap - rgap) < MAX_GAP
    rbeg1 = st.unique_pos(read.hashes[e1])
    rbeg2 = st.unique_pos(read.hashes[e2])
    rend2 = st.unique_pos(read.hashes[b2]) + SPAN - 1
    rgap = abs(rbeg1 - rend2)
    return rbeg2 < rbeg1 and abs(qgap - rgap) < MAX_GAP


def pseudo_score(read: Read, st: RefState, chains) -> int:
    if not chains:
        return 0
    if len(chains) == 1:
        b, e, _ = chains[0]
        return e - b + 1
    li = 0
    best = 0
    for i, (b, e, _) in enumerate(chains):
        if e - b + 1 > best:
            best = e - b + 1
            li = i
    lb, le, lrev = chains[li]
    total = 0
    for i, (b, e, rev) in enumerate(chains):
        if i == li:
            total += le - lb + 1
            continue
        if rev != lrev:
            continue
        first, second = (chains[li], chains[i]) if li < i else (chains[i], chains[li])
        if _colinear(read, st, first, second):
            total += e - b + 1
    return total


# ---------------------------------------------------------------------------
# INCREMENTAL semantics (reference): per-node patch of the chain list
# ---------------------------------------------------------------------------
@dataclass
class IncRead:
    read: Read
    chains: list[list] = field(default_factory=list)  # [beg, end, rev]

    def init(self, st: RefState):
        self.chains = [list(c) for c in rebuild_chains(self.read, st)]

    # -- splice ops ---------------------------------------------------------
    def _add(self, st: RefState, mc):
        """addToMinichains (mgsr.cpp:4824-4957)."""
        read, chains = self.read, self.chains
        abeg, aend, arev = mc

        def boundary_adj(from_idx, to_idx, rev):
            """colinearAdjacent on the chains' boundary seedmer positions."""
            p_from = st.unique_pos(read.hashes[from_idx])
            p_to = st.unique_pos(read.hashes[to_idx])
            return st.neighbor(p_from, rev) == p_to

        if not chains:
            chains.append(list(mc))
            return
        if len(chains) == 1:
            ob, oe, orev = chains[0]
            if aend == ob - 1 and ob != 0:
                if arev != orev:
                    chains.insert(0, list(mc))
                elif boundary_adj(aend, ob, arev):
                    chains[0][0] = abeg
                else:
                    chains.insert(0, list(mc))
            elif abeg == oe + 1:
                if arev != orev:
                    chains.append(list(mc))
                elif boundary_adj(oe, abeg, orev):
                    chains[0][1] = aend
                else:
                    chains.append(list(mc))
            else:
                chains.insert(0 if aend < ob else len(chains), list(mc))
            return
        # multiple chains: find neighbors by beg (upper_bound on beg)
        ri = bisect.bisect_right([c[0] for c in chains], abeg)
        left = ri - 1 if ri > 0 else None
        right = ri if ri < len(chains) else None
        merge_l = (left is not None and arev == chains[left][2]
                   and chains[left][1] + 1 == abeg
                   and boundary_adj(chains[left][1], abeg, chains[left][2]))
        merge_r = (right is not None and arev == chains[right][2]
                   and aend + 1 == chains[right][0]
                   and boundary_adj(aend, chains[right][0], arev))
        if merge_l and merge_r:
            chains[left][1] = chains[right][1]
            del chains[right]
        elif merge_l:
            chains[left][1] = aend
        elif merge_r:
            chains[right][0] = abeg
        else:
            if left is None:
                chains.insert(0, list(mc))
            elif right is None:
                chains.append(list(mc))
            else:
                chains.insert(left + 1, list(mc))

    def _remove(self, mc):
        """removeFromMinichains (mgsr.cpp:4958-5058)."""
        chains = self.chains
        rbeg, rend = mc[0], mc[1]
        if not chains:
            return
        if len(chains) == 1:
            ob, oe, orev = chains[0]
            if ob == rbeg:
                if oe == rend:
                    chains.clear()
                else:
                    chains[0][0] = rend + 1
            elif oe == rend:
                chains[0][1] = rbeg - 1
            else:
                chains[0][1] = rbeg - 1
                chains.append([rend + 1, oe, orev])
            return
        ci = bisect.bisect_right([c[0] for c in chains], rbeg) - 1
        if ci < 0:
            ci = 0  # defensive; reference would have UB here
        cb, ce, crev = chains[ci]
        if rend > ce:
            # removal spans past this chain into later ones
            it = ci
            n_erase = 0
            if cb == rbeg:
                n_erase += 1
                ci += 1
            else:
                chains[ci][1] = rbeg - 1
                ci += 1
                it += 1
            while ci < len(chains) and chains[ci][1] <= rend:
                n_erase += 1
                ci += 1
            if ci < len(chains) and chains[ci][0] <= rend:
                chains[ci][0] = rend + 1
            del chains[it:it + n_erase]
        else:
            if cb == rbeg:
                if ce == rend:
                    del chains[ci]
                else:
                    chains[ci][0] = rend + 1
            elif ce == rend:
                chains[ci][1] = rbeg - 1
            else:
                chains[ci][1] = rbeg - 1
                chains.insert(ci + 1, [rend + 1, ce, crev])

    # -- per-node patch driver ---------------------------------------------
    def apply(self, st: RefState, infos: list[tuple[int, str, str, bool]]):
        """infos: (seedmer_index, old_status, new_status, ref_rev_now),
        one per occurrence of an affected hash in this read, sorted by index
        (fillReadToAffectedSeedmerIndex + sortAffectedSeedmerInfos +
        the updateMinichains dispatch, mgsr.cpp:5854-5931)."""
        read = self.read
        removals = {("U", "D"), ("U", "NE")}
        additions = {("D", "U"), ("NE", "U")}
        updates = {("U", "U")}
        kinds = {(o, n) for _, o, n, _ in infos}
        all_rm = kinds <= removals
        all_add = kinds <= additions
        if not (all_rm or all_add):
            if len(infos) >= read.n / 2:
                self.init(st)  # reference falls back to a full rebuild
                return
            self._apply_mixed(st, infos)
            return
        # uniform fast path (updateMinichains)
        i = 0
        staged = []
        while i < len(infos):
            idx = infos[i][0]
            c = i + 1
            end = idx
            if all_rm:
                c, end = self._extend_removal(infos, c, end, read.n - 1)
                staged.append([idx, end, False])
            else:
                rev = infos[i][3] != read.qrevs[idx]
                c, end = self._extend_addition(st, infos, c, end, rev,
                                               st.unique_pos(read.hashes[idx]))
                staged.append([idx, end, rev])
            i += end - idx + 1
        if all_rm:
            for mc in staged:
                self._remove(mc)
        else:
            was_empty = not self.chains
            for mc in staged:
                if was_empty:
                    self.chains.append(mc)
                else:
                    self._add(st, mc)

    def _extend_removal(self, infos, c, end, last):
        while end != last and c < len(infos):
            if infos[c][0] != end + 1:
                break
            o, n = infos[c][1], infos[c][2]
            if (o, n) in {("U", "D"), ("U", "NE")}:
                end += 1
                c += 1
            else:
                break
        return c, end

    def _extend_addition(self, st, infos, c, end, chain_rev, ref_pos):
        read = self.read
        while end != read.n - 1 and c < len(infos):
            idx, o, n, rrev = infos[c]
            if end + 1 != idx:
                break
            if (o, n) in {("NE", "U"), ("D", "U")}:
                nrev = rrev != read.qrevs[idx]
                if nrev != chain_rev:
                    break
                cur = st.unique_pos(read.hashes[idx])
                if st.neighbor(ref_pos, chain_rev) == cur:
                    c += 1
                    end += 1
                    ref_pos = cur
                else:
                    break
            else:
                break
        return c, end

    def _extend_update(self, st, infos, c, end, chain_rev, ref_pos):
        read = self.read
        while end != read.n - 1 and c < len(infos):
            idx, o, n, rrev = infos[c]
            if end + 1 != idx:
                break
            if (o, n) == ("U", "U"):
                nrev = rrev != read.qrevs[idx]
                if nrev != chain_rev:
                    break
                cur = st.unique_pos(read.hashes[idx])
                if st.neighbor(ref_pos, chain_rev) == cur:
                    c += 1
                    end += 1
                    ref_pos = cur
                else:
                    break
            else:
                break
        return c, end

    def _apply_mixed(self, st, infos):
        """updateMinichainsMixed (mgsr.cpp:5060-5153)."""
        read = self.read
        to_remove, to_update, to_add = [], [], []
        i = 0
        while i < len(infos):
            idx, o, n, rrev = infos[i]
            c = i + 1
            end = idx
            if (o, n) in {("U", "D"), ("U", "NE")}:
                c, end = self._extend_removal(infos, c, end, read.n - 1)
                to_remove.append([idx, end, False])
                i += end - idx + 1
            elif (o, n) in {("D", "U"), ("NE", "U")}:
                rev = rrev != read.qrevs[idx]
                c, end = self._extend_addition(st, infos, c, end, rev,
                                               st.unique_pos(read.hashes[idx]))
                to_add.append([idx, end, rev])
                i += end - idx + 1
            elif (o, n) == ("U", "U"):
                rev = rrev != read.qrevs[idx]
                c, end = self._extend_update(st, infos, c, end, rev,
                                             st.unique_pos(read.hashes[idx]))
                to_update.append([idx, end, rev])
                i += end - idx + 1
            else:
                i += 1
        for mc in to_remove:
            self._remove(mc)
        for mc in to_update:
            self._remove(mc)
        for mc in to_update:
            self._add(st, mc)
        for mc in to_add:
            self._add(st, mc)


# ---------------------------------------------------------------------------
# fuzz driver
# ---------------------------------------------------------------------------
def run_case(rng: Random, n_nodes: int, stats: dict):
    st = RefState()
    n_ref = rng.randint(30, 70)
    hashes = rng.sample(range(1000, 100000), n_ref + 40)
    extra = hashes[n_ref:]
    for j in range(n_ref):
        st.insert(j * SPAN, hashes[j], rng.random() < 0.15)

    # reads: windows of the ref seed sequence, some reversed, some noise
    reads = []
    for _ in range(rng.randint(3, 6)):
        ln = rng.randint(5, 14)
        start = rng.randint(0, n_ref - ln)
        idxs = list(range(start, start + ln))
        fwd = rng.random() < 0.7
        if not fwd:
            idxs.reverse()
        hs, qr = [], []
        for j in idxs:
            pos = j * SPAN
            h, rrev = st.info.get(pos, (None, False))
            if h is None or rng.random() < 0.12:
                h = rng.choice(extra)  # noise / future hash
                rrev = False
            hs.append(h)
            qr.append(rrev != (not fwd) if rng.random() > 0.1 else rng.random() < 0.5)
        reads.append(Read(hs, qr))

    inc = [IncRead(r) for r in reads]
    one = [IncRead(r) for r in reads]  # resynced to truth after every node:
    for ir in inc + one:               # measures SINGLE-STEP divergence
        ir.init(st)

    for _ in range(n_nodes):
        # one node = a batch of 1..5 edits biased toward adversarial shapes
        n_edits = rng.randint(1, 5)
        old_status = {}
        touched = set()

        def note(h):
            if h not in old_status:
                old_status[h] = st.status(h)
            touched.add(h)

        for _ in range(n_edits):
            op = rng.random()
            if op < 0.35 and st.positions:  # delete an active seed
                pos = rng.choice(st.positions)
                note(st.info[pos][0])
                st.delete(pos)
            elif op < 0.6:  # insert between two active positions (adversarial)
                if len(st.positions) >= 2:
                    k = rng.randrange(len(st.positions) - 1)
                    lo, hi = st.positions[k], st.positions[k + 1]
                    if hi - lo > 1:
                        pos = rng.randint(lo + 1, hi - 1)
                        h = rng.choice(extra) if rng.random() < 0.5 else \
                            rng.choice(list(st.by_hash.keys()))  # dup transition
                        if pos not in st.info:
                            note(h)
                            st.insert(pos, h, rng.random() < 0.15)
            elif op < 0.8 and st.positions:  # move a seed (U->U update)
                pos = rng.choice(st.positions)
                h, rrev = st.info[pos]
                note(h)
                st.delete(pos)
                np_ = pos + rng.choice([-3, -2, 2, 3]) * SPAN
                if np_ > 0 and np_ not in st.info:
                    st.insert(np_, h, rrev)
            else:  # insert a brand-new seed at a fresh position
                pos = rng.randrange(0, n_ref * SPAN + 40)
                if pos not in st.info:
                    h = rng.choice(extra)
                    note(h)
                    st.insert(pos, h, rng.random() < 0.15)

        # per-read: build affected infos exactly like fillReadToAffected...
        for ir in inc + one:
            infos = []
            for i, h in enumerate(ir.read.hashes):
                if h in touched:
                    o, n = old_status[h], st.status(h)
                    # the reference includes every occurrence, even NE->NE /
                    # D->D no-ops (they clear the uniform-type flags)
                    rrev = (st.info[st.unique_pos(h)][1] if n == "U" else False)
                    infos.append((i, o, n, rrev))
            if infos:
                infos.sort(key=lambda t: t[0])
                ir.apply(st, infos)

        # compare vs rebuild
        for ir, ir1 in zip(inc, one):
            truth = rebuild_chains(ir.read, st)
            got = [tuple(c) for c in ir.chains]
            stats["steps"] += 1
            if got != truth:
                stats["chain_mismatch"] += 1
                s_truth = pseudo_score(ir.read, st, truth)
                s_got = pseudo_score(ir.read, st, got)
                if s_got != s_truth:
                    stats["score_mismatch"] += 1
                    d = s_got - s_truth
                    stats["max_abs_dscore"] = max(stats["max_abs_dscore"], abs(d))
                    stats["sum_dscore"] += d
                    if len(stats["examples"]) < 5:
                        stats["examples"].append(
                            dict(truth=truth, got=got,
                                 s_truth=s_truth, s_got=s_got))
            # single-step: ir1 started this node from the TRUE parent chains
            got1 = [tuple(c) for c in ir1.chains]
            if got1 != truth:
                stats["one_step_chain_mismatch"] += 1
                if pseudo_score(ir.read, st, got1) != pseudo_score(
                        ir.read, st, truth):
                    stats["one_step_score_mismatch"] += 1
            ir1.chains = [list(c) for c in truth]  # resync for the next node


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = Random(seed)
    stats = dict(steps=0, chain_mismatch=0, score_mismatch=0,
                 max_abs_dscore=0, sum_dscore=0,
                 one_step_chain_mismatch=0, one_step_score_mismatch=0,
                 examples=[])
    for _ in range(n_cases):
        run_case(rng, rng.randint(4, 12), stats)
    print(f"cases={n_cases} read-node steps={stats['steps']}")
    print(f"chain-list mismatches: {stats['chain_mismatch']} "
          f"({100*stats['chain_mismatch']/max(stats['steps'],1):.3f}%)")
    print(f"score mismatches:      {stats['score_mismatch']} "
          f"({100*stats['score_mismatch']/max(stats['steps'],1):.3f}%)")
    print(f"one-step chain mismatches: {stats['one_step_chain_mismatch']} "
          f"({100*stats['one_step_chain_mismatch']/max(stats['steps'],1):.3f}%)"
          f" / one-step score mismatches: {stats['one_step_score_mismatch']} "
          f"({100*stats['one_step_score_mismatch']/max(stats['steps'],1):.3f}%)")
    print(f"max |d-score| = {stats['max_abs_dscore']}, "
          f"mean signed d-score over mismatches = "
          f"{stats['sum_dscore']/max(stats['score_mismatch'],1):.3f} "
          f"(positive = incremental scores HIGHER than rebuild)")
    for ex in stats["examples"]:
        print("  example:", ex)


if __name__ == "__main__":
    main()
