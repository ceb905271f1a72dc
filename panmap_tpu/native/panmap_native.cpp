// Native host-side kernels for panmap_tpu.
//
// The TPU owns the batched compute path (sketching queries, scoring,
// alignment DP); these C++ kernels cover the HOST hot loops that feed it —
// the index builder's per-window syncmer recomputation and read-table
// encoding — mirroring the roles the reference implements natively
// (src/seeding.cpp:47-229 rollingSyncmers, src/index_single_mode.cpp DFS).
//
// Contracts are bit-exact twins of sketch/cpu.py (tests/test_native.py
// cross-checks against the numpy implementations).
//
// Build: bash panmap_tpu/native/build.sh   (g++ -O3 -march=native -shared)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// per-base hash constants (sketch/cpu.py:33-37; reference seeding.hpp:100-112)
constexpr uint64_t HASH_A = 0x3C8BFBB395C60474ULL;
constexpr uint64_t HASH_C = 0x3193C18562A02B4CULL;
constexpr uint64_t HASH_G = 0x20323ED082572324ULL;
constexpr uint64_t HASH_T = 0x295549F54BE24456ULL;
constexpr uint64_t U64MAX = ~0ULL;

inline uint64_t rol(uint64_t h, int r) {
    r &= 63;
    return r ? (h << r) | (h >> (64 - r)) : h;
}

struct Tables {
    uint64_t chash[256] = {0};
    uint64_t chash_comp[256] = {0};
    Tables() {
        auto set = [&](char c, uint64_t v, uint64_t vc) {
            chash[(uint8_t)c] = v;
            chash[(uint8_t)(c + 32)] = v;  // lowercase
            chash_comp[(uint8_t)c] = vc;
            chash_comp[(uint8_t)(c + 32)] = vc;
        };
        set('A', HASH_A, HASH_T);
        set('C', HASH_C, HASH_G);
        set('G', HASH_G, HASH_C);
        set('T', HASH_T, HASH_A);
    }
};
const Tables T;

// forward/rc hashes of every length-w window (sketch/cpu.py _window_hashes):
//   F_i = XOR_j rol(h[i+j], w-1-j),  R_i = XOR_j rol(hc[i+j], j)
// computed with O(1) rolling updates.
static void window_hashes(const uint64_t* h, const uint64_t* hc, int64_t n,
                          int w, uint64_t* F, uint64_t* R) {
    int64_t m = n - w + 1;
    if (m <= 0) return;
    uint64_t f = 0, r = 0;
    for (int j = 0; j < w; ++j) {
        f ^= rol(h[j], w - 1 - j);
        r ^= rol(hc[j], j);
    }
    F[0] = f;
    R[0] = r;
    for (int64_t i = 1; i < m; ++i) {
        f = rol(f, 1) ^ rol(h[i - 1], w) ^ h[i + w - 1];
        uint64_t rprev = R[i - 1] ^ hc[i - 1];
        r = (rprev >> 1) | (rprev << 63);  // ror 1
        r ^= rol(hc[i + w - 1], w - 1);
        F[i] = f;
        R[i] = r;
    }
}

// sliding minimum over windows of length w (monotonic deque)
static void sliding_min(const uint64_t* x, int64_t n, int w, uint64_t* out) {
    std::vector<int64_t> dq(n);
    int64_t head = 0, tail = 0;  // dq[head..tail)
    for (int64_t i = 0; i < n; ++i) {
        while (tail > head && x[dq[tail - 1]] >= x[i]) --tail;
        dq[tail++] = i;
        if (dq[head] <= i - w) ++head;
        if (i >= w - 1) out[i - w + 1] = x[dq[head]];
    }
}

}  // namespace

extern "C" {

// Per-position syncmer scan, twin of sketch/cpu.py::rolling_syncmers.
// hashes/is_rev/is_sync must have n-k+1 elements.
void pt_rolling_syncmers(const uint8_t* seq, int64_t n, int k, int s, int t,
                         int open_, uint64_t* hashes, uint8_t* is_rev,
                         uint8_t* is_sync) {
    int64_t m = n - k + 1;
    if (m <= 0) return;
    std::vector<uint64_t> h(n), hc(n);
    for (int64_t i = 0; i < n; ++i) {
        h[i] = T.chash[seq[i]];
        hc[i] = T.chash_comp[seq[i]];
    }
    int64_t mk = n - k + 1, ms = n - s + 1;
    std::vector<uint64_t> Fk(mk), Rk(mk), Fs(ms), Rs(ms);
    window_hashes(h.data(), hc.data(), n, k, Fk.data(), Rk.data());
    window_hashes(h.data(), hc.data(), n, s, Fs.data(), Rs.data());

    int w = k - s + 1;
    std::vector<uint64_t> Fmin(mk), Rmin(mk);
    sliding_min(Fs.data(), ms, w, Fmin.data());
    sliding_min(Rs.data(), ms, w, Rmin.data());

    // prefix counts of ambiguous bases
    std::vector<int32_t> cbad(n + 1, 0);
    for (int64_t i = 0; i < n; ++i) cbad[i + 1] = cbad[i] + (h[i] == 0);

    for (int64_t i = 0; i < m; ++i) {
        bool fwd_sync, rev_sync;
        if (open_) {
            fwd_sync = Fs[i + t] == Fmin[i];
            rev_sync = Rs[i + k - s - t] == Rmin[i];
        } else {
            fwd_sync = (Fs[i + t] == Fmin[i]) || (Fs[i + k - s - t] == Fmin[i]);
            rev_sync = (Rs[i + k - s - t] == Rmin[i]) || (Rs[i + t] == Rmin[i]);
        }
        bool amb = (cbad[i + k] - cbad[i]) > 0;
        bool sync = (fwd_sync || rev_sync) && !amb && (Fk[i] != Rk[i]);
        is_sync[i] = sync;
        is_rev[i] = sync && (Rk[i] < Fk[i]);
        hashes[i] = sync ? (Fk[i] < Rk[i] ? Fk[i] : Rk[i]) : U64MAX;
    }
}

// Batched 2-bit read encoding, twin of sketch/tpu.py::encode_reads_batch's
// host path: joined |reads| buffer -> [B, pad_to] code matrix (4 = pad/N).
void pt_encode_reads(const uint8_t* joined, const int64_t* offsets, int64_t b,
                     int64_t pad_to, uint8_t* out) {
    static uint8_t enc[256];
    static bool init = false;
    if (!init) {
        memset(enc, 4, sizeof(enc));
        enc['A'] = enc['a'] = 0;
        enc['C'] = enc['c'] = 1;
        enc['G'] = enc['g'] = 2;
        enc['T'] = enc['t'] = 3;
        init = true;
    }
    for (int64_t r = 0; r < b; ++r) {
        const uint8_t* src = joined + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        if (len > pad_to) len = pad_to;
        uint8_t* dst = out + r * pad_to;
        int64_t i = 0;
        for (; i < len; ++i) dst[i] = enc[src[i]];
        for (; i < pad_to; ++i) dst[i] = 4;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched read sketch + distinct k-min-mer counting (seedFreqInReads).
//
// Twin of place/engine.py::sketch_reads with dedup_reads=False (counting every
// read is identical to dedup + multiplicity weighting) over sketch/cpu.py's
// syncmer_list + kminmer_hashes semantics (reference: placement.cpp:1611-1684).
// Multithreaded over contiguous read ranges with per-thread open-addressing
// maps merged at the end.  Canonical hash U64MAX (p ~ 2^-64) is reserved as
// the empty sentinel and skipped — matching the device path, which uses the
// all-ones hash as its invalid-slot sentinel.
// ---------------------------------------------------------------------------

namespace {

struct CountMap {
    std::vector<uint64_t> keys;
    std::vector<uint32_t> vals;
    size_t mask = 0;
    size_t n = 0;

    void init(size_t cap) {  // cap must be a power of two
        keys.assign(cap, U64MAX);
        vals.assign(cap, 0);
        mask = cap - 1;
        n = 0;
    }
    inline size_t slot(uint64_t h) const {
        return (size_t)((h ^ (h >> 29)) * 0x9E3779B97F4A7C15ULL >> 17) & mask;
    }
    void grow() {
        std::vector<uint64_t> ok;
        std::vector<uint32_t> ov;
        ok.swap(keys);
        ov.swap(vals);
        size_t old_cap = mask + 1;
        init(old_cap * 2);
        for (size_t i = 0; i < old_cap; ++i)
            if (ok[i] != U64MAX) add(ok[i], ov[i]);
    }
    inline void add(uint64_t h, uint32_t c) {
        if ((n + 1) * 10 > (mask + 1) * 7) grow();
        size_t i = slot(h);
        for (;;) {
            if (keys[i] == U64MAX) {
                keys[i] = h;
                vals[i] = c;
                ++n;
                return;
            }
            if (keys[i] == h) {
                vals[i] += c;
                return;
            }
            i = (i + 1) & mask;
        }
    }
};

// scratch buffers reused across reads within one thread
struct SketchScratch {
    std::vector<uint64_t> h, hc, Fk, Rk, Fs, Rs, Fmin, Rmin, H, h2;
    std::vector<int32_t> pos;
    std::vector<uint8_t> rev;  // per-syncmer strand (Rk < Fk)
};

// branchless sliding minimum (van Herk/Gil-Werman): per block of w, suffix
// minima within the block and running prefix minima across it; the deque
// variant's data-dependent branches mispredict ~50% on hash data.
static void sliding_min_vh(const uint64_t* x, int64_t n, int w, uint64_t* out,
                           std::vector<uint64_t>& scratch) {
    int64_t m = n - w + 1;
    if (m <= 0) return;
    scratch.resize(n);
    uint64_t* sfx = scratch.data();  // sfx[i] = min x[i .. block_end]
    for (int64_t b = 0; b < n; b += w) {
        int64_t e = b + w < n ? b + w : n;
        uint64_t acc = x[e - 1];
        sfx[e - 1] = acc;
        for (int64_t i = e - 2; i >= b; --i) {
            acc = x[i] < acc ? x[i] : acc;
            sfx[i] = acc;
        }
    }
    uint64_t pfx = U64MAX;
    int cnt = 0;  // j % w, maintained without division
    for (int64_t j = 0; j < n; ++j) {
        // pfx = min x[block_start(j) .. j]
        pfx = (cnt == 0) ? x[j] : (x[j] < pfx ? x[j] : pfx);
        if (++cnt == w) cnt = 0;
        if (j >= w - 1) {
            int64_t i = j - w + 1;
            out[i] = sfx[i] < pfx ? sfx[i] : pfx;
        }
    }
}

// syncmer scan of one read into scratch.H (canonical hashes, in order) and
// scratch.pos (k-mer start positions); same math as pt_rolling_syncmers.
static void scan_read_syncmers(const uint8_t* seq, int64_t nn, int k, int s,
                               int t, int open_, SketchScratch& sc) {
    sc.H.clear();
    sc.pos.clear();
    sc.rev.clear();
    int64_t m = nn - k + 1;
    if (m <= 0) return;
    sc.h.resize(nn);
    sc.hc.resize(nn);
    bool any_amb = false;
    for (int64_t i = 0; i < nn; ++i) {
        sc.h[i] = T.chash[seq[i]];
        sc.hc[i] = T.chash_comp[seq[i]];
        any_amb |= (sc.h[i] == 0);
    }
    int64_t ms = nn - s + 1;
    sc.Fk.resize(m);
    sc.Rk.resize(m);
    sc.Fs.resize(ms);
    sc.Rs.resize(ms);
    window_hashes(sc.h.data(), sc.hc.data(), nn, k, sc.Fk.data(), sc.Rk.data());
    window_hashes(sc.h.data(), sc.hc.data(), nn, s, sc.Fs.data(), sc.Rs.data());
    int w = k - s + 1;
    sc.Fmin.resize(m);
    sc.Rmin.resize(m);
    sliding_min_vh(sc.Fs.data(), ms, w, sc.Fmin.data(), sc.h2);
    sliding_min_vh(sc.Rs.data(), ms, w, sc.Rmin.data(), sc.h2);
    int32_t bad_run = 0;  // count of ambiguous bases in the current k-window
    if (any_amb)
        for (int64_t i = 0; i < k - 1 && i < nn; ++i) bad_run += (sc.h[i] == 0);
    for (int64_t i = 0; i < m; ++i) {
        if (any_amb) bad_run += (sc.h[i + k - 1] == 0);
        bool fwd_sync, rev_sync;
        if (open_) {
            fwd_sync = sc.Fs[i + t] == sc.Fmin[i];
            rev_sync = sc.Rs[i + k - s - t] == sc.Rmin[i];
        } else {
            fwd_sync = (sc.Fs[i + t] == sc.Fmin[i]) ||
                       (sc.Fs[i + k - s - t] == sc.Fmin[i]);
            rev_sync = (sc.Rs[i + k - s - t] == sc.Rmin[i]) ||
                       (sc.Rs[i + t] == sc.Rmin[i]);
        }
        bool sync = (fwd_sync || rev_sync) && bad_run == 0 &&
                    (sc.Fk[i] != sc.Rk[i]);
        if (sync) {
            sc.H.push_back(sc.Fk[i] < sc.Rk[i] ? sc.Fk[i] : sc.Rk[i]);
            sc.pos.push_back((int32_t)i);
            sc.rev.push_back(sc.Rk[i] < sc.Fk[i]);
        }
        if (any_amb) bad_run -= (sc.h[i] == 0);
    }
}

static void sketch_count_range(const uint8_t* joined, const int64_t* offsets,
                               int64_t r0, int64_t r1, int k, int s, int t,
                               int open_, int l, int trim_start, int trim_end,
                               CountMap& map) {
    SketchScratch sc;
    for (int64_t r = r0; r < r1; ++r) {
        const uint8_t* seq = joined + offsets[r];
        int64_t nn = offsets[r + 1] - offsets[r];
        scan_read_syncmers(seq, nn, k, s, t, open_, sc);
        size_t nh = sc.H.size();
        if ((int64_t)nh < (l > 1 ? l : 1)) continue;
        size_t lo_i = 0, hi_i = nh;  // in-range syncmer sub-list [lo_i, hi_i)
        if (trim_start > 0 || trim_end > 0) {
            int32_t lo = trim_start;
            int32_t hi = (int32_t)(nn - trim_end - k);
            while (lo_i < nh && sc.pos[lo_i] < lo) ++lo_i;
            while (hi_i > lo_i && sc.pos[hi_i - 1] > hi) --hi_i;
            if (hi_i == lo_i) continue;
        }
        const uint64_t* H = sc.H.data() + lo_i;
        int64_t mh = (int64_t)(hi_i - lo_i);
        if (l == 1) {
            for (int64_t i = 0; i < mh; ++i)
                if (H[i] != U64MAX) map.add(H[i], 1);
            continue;
        }
        if (mh < l) continue;
        // l-window combine: F = XOR rol(H[i+w], k*(l-1-w)), R reversed
        // (l is small — direct recompute per window)
        for (int64_t i = 0; i + l <= mh; ++i) {
            uint64_t f = 0, rr = 0;
            for (int w2 = 0; w2 < l; ++w2) {
                int e = (k * (l - 1 - w2)) & 63;
                f ^= rol(H[i + w2], e);
                rr ^= rol(H[i + l - 1 - w2], e);
            }
            if (f != rr) {  // palindromic windows skipped
                uint64_t canon = f < rr ? f : rr;
                if (canon != U64MAX) map.add(canon, 1);
            }
        }
    }
}

}  // namespace

extern "C" {

// Returns the number of distinct k-min-mers written to out_hash/out_count,
// or -1 if cap was insufficient (caller retries with a larger cap).
int64_t pt_sketch_count(const uint8_t* joined, const int64_t* offsets,
                        int64_t n_reads, int k, int s, int t, int open_, int l,
                        int trim_start, int trim_end, int n_threads,
                        uint64_t* out_hash, uint32_t* out_count, int64_t cap) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > (int)n_reads) n_threads = n_reads > 0 ? (int)n_reads : 1;
    std::vector<CountMap> maps(n_threads);
    std::vector<std::thread> threads;
    int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    for (int ti = 0; ti < n_threads; ++ti) {
        int64_t r0 = ti * chunk;
        int64_t r1 = r0 + chunk < n_reads ? r0 + chunk : n_reads;
        maps[ti].init(1 << 16);
        if (r0 >= r1) continue;
        threads.emplace_back([&, ti, r0, r1]() {
            sketch_count_range(joined, offsets, r0, r1, k, s, t, open_, l,
                               trim_start, trim_end, maps[ti]);
        });
    }
    for (auto& th : threads) th.join();
    CountMap& m0 = maps[0];
    for (int ti = 1; ti < n_threads; ++ti) {
        CountMap& mi = maps[ti];
        for (size_t i = 0; i <= mi.mask; ++i)
            if (mi.keys[i] != U64MAX) m0.add(mi.keys[i], mi.vals[i]);
    }
    if ((int64_t)m0.n > cap) return -1;
    int64_t w = 0;
    for (size_t i = 0; i <= m0.mask; ++i)
        if (m0.keys[i] != U64MAX) {
            out_hash[w] = m0.keys[i];
            out_count[w] = m0.vals[i];
            ++w;
        }
    return w;
}

// Per-read seedmer lists for the metagenomic pipeline: canonical k-min-mer
// hash, orientation (reverse combine < forward; for l==1 the syncmer's own
// strand), and read-coordinate extent [qb, qe] per seedmer (qb = first
// member syncmer's k-mer start, qe = last member's k-mer end, inclusive).
// Twin of meta/engine.py::sketch_meta_reads_full's per-read scan
// (reference: mgsr.cpp:1774-2236 initializeQueryData).
// CSR output: read_offsets[n_reads+1] into the flat arrays.
// Returns total seedmers, or -1 if cap was insufficient.
int64_t pt_sketch_meta(const uint8_t* joined, const int64_t* offsets,
                       int64_t n_reads, int k, int s, int t, int open_, int l,
                       int n_threads, int64_t* read_offsets, uint64_t* out_hash,
                       uint8_t* out_rev, int32_t* out_qb, int32_t* out_qe,
                       uint64_t* out_fp1, uint64_t* out_fp2, int64_t cap) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > (int)n_reads) n_threads = n_reads > 0 ? (int)n_reads : 1;
    struct Buf {
        std::vector<uint64_t> h;
        std::vector<uint8_t> rv;
        std::vector<int32_t> qb, qe;
        std::vector<int32_t> cnt;  // per read in range
    };
    std::vector<Buf> bufs(n_threads);
    int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    // order-dependent Horner fingerprints per read (content dedup key)
    constexpr uint64_t FP_W1 = 0x9E3779B97F4A7C15ULL;
    constexpr uint64_t FP_C1 = 0xBF58476D1CE4E5B9ULL;
    constexpr uint64_t FP_W2 = 0xC2B2AE3D27D4EB4FULL;
    constexpr uint64_t FP_C2 = 0x94D049BB133111EBULL;
    auto mix = [](uint64_t v, uint64_t c) {
        v = (v ^ (v >> 31)) * c;
        return v ^ (v >> 29);
    };
    auto work = [&](int ti, int64_t r0, int64_t r1) {
        Buf& o = bufs[ti];
        o.cnt.reserve(r1 - r0);
        // reserve once from the sequence-byte estimate (growth-doubling of
        // hundreds-of-MB vectors is the expensive part on slow-fault hosts)
        int64_t bytes = offsets[r1] - offsets[r0];
        int64_t est = bytes / 4 + 1024;
        o.h.reserve(est);
        o.rv.reserve(est);
        o.qb.reserve(est);
        o.qe.reserve(est);
        SketchScratch sc;
        for (int64_t r = r0; r < r1; ++r) {
            const uint8_t* seq = joined + offsets[r];
            int64_t nn = offsets[r + 1] - offsets[r];
            scan_read_syncmers(seq, nn, k, s, t, open_, sc);
            int64_t mh = (int64_t)sc.H.size();
            int32_t emitted = 0;
            uint64_t fp1 = 0, fp2 = 0;
            auto emit = [&](uint64_t hh, bool rv, int32_t qb, int32_t qe) {
                o.h.push_back(hh);
                o.rv.push_back(rv);
                o.qb.push_back(qb);
                o.qe.push_back(qe);
                uint64_t val = hh ^ ((uint64_t)qb << 17) ^
                               ((uint64_t)qe << 34) ^ ((uint64_t)rv << 63);
                fp1 = fp1 * FP_W1 + mix(val, FP_C1);
                fp2 = fp2 * FP_W2 + mix(val, FP_C2);
                ++emitted;
            };
            if (l == 1) {
                for (int64_t i = 0; i < mh; ++i)
                    emit(sc.H[i], sc.rev[i], sc.pos[i], sc.pos[i] + k - 1);
            } else if (mh >= l) {
                for (int64_t i = 0; i + l <= mh; ++i) {
                    uint64_t f = 0, rr = 0;
                    for (int w2 = 0; w2 < l; ++w2) {
                        int e = (k * (l - 1 - w2)) & 63;
                        f ^= rol(sc.H[i + w2], e);
                        rr ^= rol(sc.H[i + l - 1 - w2], e);
                    }
                    if (f == rr) continue;  // palindromic window
                    emit(f < rr ? f : rr, rr < f, sc.pos[i],
                         sc.pos[i + l - 1] + k - 1);
                }
            }
            o.cnt.push_back(emitted);
            out_fp1[r] = fp1;
            out_fp2[r] = fp2;
        }
    };
    std::vector<std::thread> threads;
    for (int ti = 0; ti < n_threads; ++ti) {
        int64_t r0 = ti * chunk;
        int64_t r1 = r0 + chunk < n_reads ? r0 + chunk : n_reads;
        if (r0 >= r1) {
            bufs[ti].cnt.clear();
            continue;
        }
        threads.emplace_back(work, ti, r0, r1);
    }
    for (auto& th : threads) th.join();
    int64_t total = 0;
    for (auto& b : bufs) total += (int64_t)b.h.size();
    if (total > cap) return -1;
    // global CSR offsets + parallel copy-out
    int64_t roff = 0, doff = 0;
    std::vector<int64_t> dst(n_threads);
    for (int ti = 0; ti < n_threads; ++ti) {
        dst[ti] = doff;
        Buf& b = bufs[ti];
        for (size_t j = 0; j < b.cnt.size(); ++j) {
            read_offsets[roff++] = doff;
            doff += b.cnt[j];
        }
    }
    read_offsets[roff] = doff;
    std::vector<std::thread> copies;
    for (int ti = 0; ti < n_threads; ++ti) {
        if (bufs[ti].h.empty()) continue;
        copies.emplace_back([&, ti]() {
            Buf& b = bufs[ti];
            int64_t d = dst[ti];
            memcpy(out_hash + d, b.h.data(), b.h.size() * 8);
            memcpy(out_rev + d, b.rv.data(), b.rv.size());
            memcpy(out_qb + d, b.qb.data(), b.qb.size() * 4);
            memcpy(out_qe + d, b.qe.data(), b.qe.size() * 4);
        });
    }
    for (auto& th : copies) th.join();
    return total;
}

// Threaded binary-search join of unsorted u64 queries against a sorted table.
// out_idx[i] = lower_bound(U, q[i]); found[i] = (U[out_idx[i]] == q[i]).
void pt_join_u64(const uint64_t* q, int64_t n, const uint64_t* U, int64_t m,
                 int n_threads, int32_t* out_idx, uint8_t* found) {
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            int64_t lo = 0, hi = m;
            uint64_t x = q[i];
            while (lo < hi) {
                int64_t mid = (lo + hi) >> 1;
                if (U[mid] < x)
                    lo = mid + 1;
                else
                    hi = mid;
            }
            int64_t c = lo < m ? lo : (m > 0 ? m - 1 : 0);
            out_idx[i] = (int32_t)c;
            found[i] = (m > 0) && (U[c] == x);
        }
    };
    if (n_threads == 1 || n < 4096) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int ti = 0; ti < n_threads; ++ti) {
        int64_t a = ti * chunk, b = a + chunk < n ? a + chunk : n;
        if (a >= b) break;
        threads.emplace_back(work, a, b);
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// BAQ: banded glocal profile-HMM posterior (htslib probaln.c semantics).
//
// States M/I/D over ref positions; query enters at any ref column (glocal).
// Forward/backward with per-row scaling, then per-query-base MAP state and
// phred-scaled posterior error q[i]; state[i] = (ref_col << 2) | state_tag.
// Transition parameters: gap open d, gap extend e, band width bw.
// ---------------------------------------------------------------------------

namespace {
constexpr double BAQ_EI = 0.25;
constexpr double BAQ_EM = 1.0 / 3.0;

inline int band_u(int bw, int i, int k) {
    int x = i - bw;
    if (x < 0) x = 0;
    return (k - x + 1) * 3;
}
}  // namespace

extern "C" {

// ref/query: 0..3 codes (>=4 ambiguous); qual: phred per query base.
// state/q: l_query outputs.  Returns 0 on success.
int pt_baq_glocal(const uint8_t* ref, int l_ref, const uint8_t* query,
                  int l_query, const uint8_t* qual_in, int bw_cap, double gapd,
                  double gape, int* state, uint8_t* q) {
    if (l_ref <= 0 || l_query <= 0) return -1;
    int bw = l_ref > l_query ? l_ref : l_query;
    if (bw > bw_cap) bw = bw_cap;
    int diff = l_ref - l_query;
    if (diff < 0) diff = -diff;
    if (bw < diff) bw = diff;
    int bw2 = bw * 2 + 1;
    size_t i_dim = (bw2 < l_ref ? (size_t)bw2 * 3 + 6 : (size_t)l_ref * 3 + 6);

    std::vector<double> f((size_t)(l_query + 1) * i_dim, 0.0);
    std::vector<double> b((size_t)(l_query + 1) * i_dim, 0.0);
    std::vector<double> s(l_query + 2, 0.0);
    std::vector<double> qp(l_query);
    for (int i = 0; i < l_query; ++i)
        qp[i] = pow(10.0, -(double)qual_in[i] / 10.0);

    double sM = 1.0 / (2 * l_query + 2), sI = sM;
    double m[9];
    m[0] = (1 - gapd - gapd) * (1 - sM);
    m[1] = m[2] = gapd * (1 - sM);
    m[3] = (1 - gape) * (1 - sI);
    m[4] = gape * (1 - sI);
    m[5] = 0.0;
    m[6] = 1 - gape;
    m[7] = 0.0;
    m[8] = gape;
    double bM = (1 - gapd) / l_ref;
    double bI = gapd / l_ref;

    // ---- forward ----
    f[band_u(bw, 0, 0)] = s[0] = 1.0;
    {
        double* fi = &f[1 * i_dim];
        int end = l_ref < bw + 1 ? l_ref : bw + 1;
        double sum = 0.0;
        for (int k = 1; k <= end; ++k) {
            double e = (ref[k - 1] > 3 || query[0] > 3)
                           ? 1.0
                           : (ref[k - 1] == query[0] ? 1.0 - qp[0]
                                                     : qp[0] * BAQ_EM);
            int u = band_u(bw, 1, k);
            fi[u + 0] = e * bM;
            fi[u + 1] = BAQ_EI * bI;
            sum += fi[u] + fi[u + 1];
        }
        s[1] = sum;
    }
    for (int i = 2; i <= l_query; ++i) {
        double* fi = &f[(size_t)i * i_dim];
        double* fi1 = &f[(size_t)(i - 1) * i_dim];
        double qli = qp[i - 1];
        uint8_t qyi = query[i - 1];
        int beg = 1 > i - bw ? 1 : i - bw;
        int end = l_ref < i + bw ? l_ref : i + bw;
        double E[4] = {qli * BAQ_EM, 1.0 - qli, 1.0, 1.0};
        double M = 1.0 / s[i - 1];
        double sum = 0.0;
        for (int k = beg; k <= end; ++k) {
            int u = band_u(bw, i, k);
            int v11 = band_u(bw, i - 1, k - 1);
            int v10 = band_u(bw, i - 1, k);
            int v01 = band_u(bw, i, k - 1);
            double e = E[(ref[k - 1] > 3 || qyi > 3) * 2 + (ref[k - 1] == qyi)];
            fi[u + 0] = e * (m[0] * M * fi1[v11 + 0] + m[3] * M * fi1[v11 + 1] +
                             m[6] * M * fi1[v11 + 2]);
            fi[u + 1] = BAQ_EI * (m[1] * M * fi1[v10 + 0] + m[4] * M * fi1[v10 + 1]);
            fi[u + 2] = m[2] * fi[v01 + 0] + m[8] * fi[v01 + 2];
            sum += fi[u] + fi[u + 1] + fi[u + 2];
        }
        s[i] = sum;
    }
    {
        double sum = 0.0;
        double M = 1.0 / s[l_query];
        for (int k = 1; k <= l_ref; ++k) {
            int u = band_u(bw, l_query, k);
            if (u < 3 || (size_t)u >= i_dim) continue;
            sum += M * f[(size_t)l_query * i_dim + u + 0] * sM +
                   M * f[(size_t)l_query * i_dim + u + 1] * sI;
        }
        s[l_query + 1] = sum;
    }

    // ---- backward ----
    for (int k = 1; k <= l_ref; ++k) {
        int u = band_u(bw, l_query, k);
        if (u < 3 || (size_t)u >= i_dim) continue;
        double* bi = &b[(size_t)l_query * i_dim];
        bi[u + 0] = sM / s[l_query] / s[l_query + 1];
        bi[u + 1] = sI / s[l_query] / s[l_query + 1];
    }
    for (int i = l_query - 1; i >= 1; --i) {
        double* bi = &b[(size_t)i * i_dim];
        double* bi1 = &b[(size_t)(i + 1) * i_dim];
        double y = (i > 1) ? 1.0 : 0.0;
        double qli1 = qp[i];
        uint8_t qyi1 = query[i];
        int beg = 1 > i - bw ? 1 : i - bw;
        int end = l_ref < i + bw ? l_ref : i + bw;
        double E[4] = {qli1 * BAQ_EM, 1.0 - qli1, 1.0, 1.0};
        for (int k = end; k >= beg; --k) {
            int u = band_u(bw, i, k);
            int v11 = band_u(bw, i + 1, k + 1);
            int v10 = band_u(bw, i + 1, k);
            int v01 = band_u(bw, i, k + 1);
            double e = (k >= l_ref)
                           ? 0.0
                           : E[(ref[k] > 3 || qyi1 > 3) * 2 + (ref[k] == qyi1)] *
                                 bi1[v11];
            bi[u + 0] = e * m[0] + BAQ_EI * m[1] * bi1[v10 + 1] + m[2] * bi[v01 + 2];
            bi[u + 1] = e * m[3] + BAQ_EI * m[4] * bi1[v10 + 1];
            bi[u + 2] = (e * m[6] + m[8] * bi[v01 + 2]) * y;
        }
        int ub = band_u(bw, i, beg), ue = band_u(bw, i, end) + 2;
        double n = 1.0 / s[i];
        for (int k = ub; k <= ue; ++k) bi[k] *= n;
    }

    // ---- MAP per query base ----
    for (int i = 1; i <= l_query; ++i) {
        double* fi = &f[(size_t)i * i_dim];
        double* bi = &b[(size_t)i * i_dim];
        int beg = 1 > i - bw ? 1 : i - bw;
        int end = l_ref < i + bw ? l_ref : i + bw;
        double M = 1.0 / s[i];
        double sum = 0.0, mx = 0.0;
        int max_k = -1;
        for (int k = beg; k <= end; ++k) {
            int u = band_u(bw, i, k);
            double z = M * fi[u + 0] * bi[u + 0];
            if (z > mx) { mx = z; max_k = (k - 1) << 2 | 0; }
            sum += z;
            z = M * fi[u + 1] * bi[u + 1];
            if (z > mx) { mx = z; max_k = (k - 1) << 2 | 1; }
            sum += z;
        }
        mx /= sum;
        state[i - 1] = max_k;
        int kq = (int)(-4.343 * log(1.0 - mx) + 0.499);
        q[i - 1] = kq > 100 ? 99 : (uint8_t)kq;
    }
    return 0;
}

}  // extern "C"
