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

#include <cstdint>
#include <cstring>
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
