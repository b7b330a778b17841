// Native host-side serialization kernels for tpu_vp9.
//
// The boolean range coder and coefficient token writer are inherently
// sequential, so they run on the host; this C++ implementation is the
// production path (the pure-Python versions in tpu_vp9/bitstream are the
// reference oracles and must produce byte-identical output).
//
// Exposed as a plain C ABI for ctypes.  Normative tables (scans, bands,
// neighbor lists, energy classes, category probs) are registered once from
// Python at load time — the numbers live in vp9_tables.npz only.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <thread>
#include <vector>

namespace {

struct Norm {
    uint8_t v[256];
    Norm() {
        v[0] = 0;
        for (int r = 1; r < 256; ++r) {
            int s = 0, x = r;
            while (x < 128) { x <<= 1; ++s; }
            v[r] = (uint8_t)s;
        }
    }
};
const Norm kNorm;

struct TxTables {
    std::vector<int32_t> scan;       // n2
    std::vector<int32_t> nbrs;       // (n2+1)*2
    std::vector<int32_t> band;       // n2
    int n2 = 0;
};

// [tx_size 0..3][tx_type 0..3]
TxTables g_tx[4][4];
int32_t g_energy[12];
uint8_t g_cat_probs[6][14];
int g_cat_bits[6] = {1, 2, 3, 4, 5, 14};
int g_cat_base[6] = {5, 7, 11, 19, 35, 67};

// coef_con_tree paths for tokens 2..10: (prob_idx, bit) pairs
// (8 slots: the vp9 coef_con_tree is at most 4 deep; the walk guards
// the depth explicitly)
struct Path { int len = 0; int idx[8] = {}; int bit[8] = {}; };
Path g_con_paths[11];

}  // namespace

extern "C" {

struct BoolEnc {
    uint32_t low = 0;
    uint32_t range = 255;
    int count = -24;
    std::vector<uint8_t> buf;
};

BoolEnc* boolenc_new() {
    BoolEnc* e = new BoolEnc();
    e->buf.reserve(1 << 16);
    return e;
}

void boolenc_free(BoolEnc* e) { delete e; }

static inline void put_bit(BoolEnc* e, int bit, int prob) {
    uint32_t split = 1 + (((e->range - 1) * (uint32_t)prob) >> 8);
    uint32_t low = e->low;
    uint32_t range;
    if (bit) {
        low += split;
        range = e->range - split;
    } else {
        range = split;
    }
    int shift = kNorm.v[range];
    range <<= shift;
    int count = e->count + shift;
    if (count >= 0) {
        int offset = shift - count;
        if ((low << (offset - 1)) & 0x80000000u) {
            int x = (int)e->buf.size() - 1;
            while (x >= 0 && e->buf[x] == 0xff) {
                e->buf[x] = 0;
                --x;
            }
            if (x >= 0) e->buf[x] += 1;
        }
        e->buf.push_back((uint8_t)((low >> (24 - offset)) & 0xff));
        low = (low << offset) & 0xffffff;
        shift = count;
        count -= 8;
    }
    e->low = (low << shift) & 0xffffffffu;
    e->range = range;
    e->count = count;
}

void boolenc_put(BoolEnc* e, int bit, int prob) { put_bit(e, bit, prob); }

void boolenc_literal(BoolEnc* e, int value, int bits) {
    for (int b = bits - 1; b >= 0; --b) put_bit(e, (value >> b) & 1, 128);
}

void boolenc_start(BoolEnc* e) { put_bit(e, 0, 128); }  // clear bit

int64_t boolenc_size(BoolEnc* e) { return (int64_t)e->buf.size(); }

// Finalize: flush 32 zero bits + superframe-marker guard; copies to out.
int64_t boolenc_finalize(BoolEnc* e, uint8_t* out, int64_t cap) {
    for (int i = 0; i < 32; ++i) put_bit(e, 0, 128);
    if (!e->buf.empty() && (e->buf.back() & 0xe0) == 0xc0)
        e->buf.push_back(0);
    if (e->buf.empty()) e->buf.push_back(0);
    int64_t n = (int64_t)e->buf.size();
    if (n > cap) return -1;
    std::memcpy(out, e->buf.data(), (size_t)n);
    return n;
}

void vp9n_register_tx(int tx_size, int tx_type, const int32_t* scan,
                      const int32_t* nbrs, const int32_t* band, int n2) {
    TxTables& t = g_tx[tx_size][tx_type];
    t.scan.assign(scan, scan + n2);
    t.nbrs.assign(nbrs, nbrs + (n2 + 1) * 2);
    t.band.assign(band, band + n2);
    t.n2 = n2;
}

void vp9n_register_misc(const int32_t* energy, const uint8_t* cat_probs,
                        const int32_t* con_tree) {
    std::memcpy(g_energy, energy, sizeof(g_energy));
    std::memcpy(g_cat_probs, cat_probs, sizeof(g_cat_probs));
    // build paths by walking the con tree (leaves are -token)
    struct Walk {
        const int32_t* tree;
        void go(int i, Path p) {
            if (p.len >= 8) return;  // tree deeper than any vp9 table
            for (int bit = 0; bit < 2; ++bit) {
                Path q = p;
                q.idx[q.len] = i >> 1;
                q.bit[q.len] = bit;
                q.len += 1;
                int node = tree[i + bit];
                if (node <= 0)
                    g_con_paths[-node] = q;
                else
                    go(node, q);
            }
        }
    } w{con_tree};
    w.go(0, Path{});
}

static inline int token_from_mag(int mag) {
    if (mag <= 4) return mag;
    if (mag <= 6) return 5;
    if (mag <= 10) return 6;
    if (mag <= 18) return 7;
    if (mag <= 34) return 8;
    if (mag <= 66) return 9;
    return 10;
}

// Encode one transform block's levels. probs_full: 6*6*11 uint8.
// Returns eob.  counts (optional, 6*6*12 int64) and eob_counts (6*6).
int boolenc_write_coeffs(BoolEnc* e, const int32_t* levels2d, int tx_size,
                         int tx_type, const uint8_t* probs_full, int ctx0,
                         int64_t* counts, int64_t* eob_counts) {
    const TxTables& t = g_tx[tx_size][tx_type];
    const int n2 = t.n2;
    int32_t lv[1024];
    for (int i = 0; i < n2; ++i) lv[i] = levels2d[t.scan[i]];
    int eob = 0;
    for (int i = n2 - 1; i >= 0; --i) {
        if (lv[i]) { eob = i + 1; break; }
    }
    int32_t cache[1024];
    std::memset(cache, 0, sizeof(int32_t) * n2);
    bool skip_eob = false;
    for (int c = 0; c <= eob && c < n2; ++c) {
        int pt = (c == 0)
            ? ctx0
            : (1 + cache[t.nbrs[2 * c]] + cache[t.nbrs[2 * c + 1]]) >> 1;
        int b = t.band[c];
        const uint8_t* p = probs_full + (b * 6 + pt) * 11;
        bool is_eob = (c == eob);
        if (!skip_eob) {
            if (eob_counts) eob_counts[b * 6 + pt] += 1;
            put_bit(e, is_eob ? 0 : 1, p[0]);
        }
        if (is_eob) {
            if (counts && !skip_eob) counts[(b * 6 + pt) * 12 + 11] += 1;
            break;
        }
        int level = lv[c];
        int mag = level < 0 ? -level : level;
        int tokv = token_from_mag(mag);
        if (counts) counts[(b * 6 + pt) * 12 + tokv] += 1;
        if (mag == 0) {
            put_bit(e, 0, p[1]);
            cache[t.scan[c]] = 0;
            skip_eob = true;
            continue;
        }
        put_bit(e, 1, p[1]);
        skip_eob = false;
        cache[t.scan[c]] = g_energy[tokv];
        if (mag == 1) {
            put_bit(e, 0, p[2]);
        } else {
            put_bit(e, 1, p[2]);
            const Path& path = g_con_paths[tokv];
            for (int k = 0; k < path.len; ++k)
                put_bit(e, path.bit[k], p[3 + path.idx[k]]);
            if (tokv >= 5) {
                int cat = tokv - 5;
                int extra = mag - g_cat_base[cat];
                int nbits = g_cat_bits[cat];
                for (int k = 0; k < nbits; ++k)
                    put_bit(e, (extra >> (nbits - 1 - k)) & 1,
                            g_cat_probs[cat][k]);
            }
        }
        put_bit(e, level < 0 ? 1 : 0, 128);
    }
    return eob;
}

// Scan-ordered variant: levels arrive already in scan order (a k-long
// prefix; positions >= k are zero).  Used by the RT serializer so the
// device only ships short int8 prefixes over the slow tunnel.
int boolenc_write_coeffs_pre(BoolEnc* e, const int16_t* lv_scan, int k,
                             int tx_size, int tx_type,
                             const uint8_t* probs_full, int ctx0,
                             int64_t* counts, int64_t* eob_counts) {
    const TxTables& t = g_tx[tx_size][tx_type];
    const int n2 = t.n2;
    int eob = 0;
    for (int i = (k < n2 ? k : n2) - 1; i >= 0; --i) {
        if (lv_scan[i]) { eob = i + 1; break; }
    }
    int32_t cache[1024];
    std::memset(cache, 0, sizeof(int32_t) * n2);
    bool skip_eob = false;
    for (int c = 0; c <= eob && c < n2; ++c) {
        int pt = (c == 0)
            ? ctx0
            : (1 + cache[t.nbrs[2 * c]] + cache[t.nbrs[2 * c + 1]]) >> 1;
        int b = t.band[c];
        const uint8_t* p = probs_full + (b * 6 + pt) * 11;
        bool is_eob = (c == eob);
        if (!skip_eob) {
            if (eob_counts) eob_counts[b * 6 + pt] += 1;
            put_bit(e, is_eob ? 0 : 1, p[0]);
        }
        if (is_eob) {
            if (counts && !skip_eob) counts[(b * 6 + pt) * 12 + 11] += 1;
            break;
        }
        int level = c < k ? lv_scan[c] : 0;
        int mag = level < 0 ? -level : level;
        int tokv = token_from_mag(mag);
        if (counts) counts[(b * 6 + pt) * 12 + tokv] += 1;
        if (mag == 0) {
            put_bit(e, 0, p[1]);
            cache[t.scan[c]] = 0;
            skip_eob = true;
            continue;
        }
        put_bit(e, 1, p[1]);
        skip_eob = false;
        cache[t.scan[c]] = g_energy[tokv];
        if (mag == 1) {
            put_bit(e, 0, p[2]);
        } else {
            put_bit(e, 1, p[2]);
            const Path& path = g_con_paths[tokv];
            for (int kk = 0; kk < path.len; ++kk)
                put_bit(e, path.bit[kk], p[3 + path.idx[kk]]);
            if (tokv >= 5) {
                int cat = tokv - 5;
                int extra = mag - g_cat_base[cat];
                int nbits = g_cat_bits[cat];
                for (int kk = 0; kk < nbits; ++kk)
                    put_bit(e, (extra >> (nbits - 1 - kk)) & 1,
                            g_cat_probs[cat][kk]);
            }
        }
        put_bit(e, level < 0 ? 1 : 0, 128);
    }
    return eob;
}

// ---------------------------------------------------------------------
// Coefficient token RATE (RD full-loop cost model).  Walks the exact
// token path of boolenc_write_coeffs but accumulates bool-coder bit
// costs instead of writing.  Costs are in 1/256-bit units
// (vp9_prob_cost semantics: cost(bit, p) = -256*log2(P(bit))).
// ---------------------------------------------------------------------
static int g_prob_cost[256];
static bool g_prob_cost_init = false;

static void init_prob_cost() {
    if (g_prob_cost_init) return;
    for (int p = 1; p < 256; ++p)
        g_prob_cost[p] = (int)(0.5 - 256.0 * std::log2((double)p / 256.0));
    g_prob_cost[0] = g_prob_cost[1];
    g_prob_cost_init = true;
}

static inline int bit_cost(int bit, int prob) {
    return g_prob_cost[bit ? 256 - prob : prob];
}

// Rate of one transform block's levels under probs_full (6*6*11).
// Returns cost in 1/256 bits (includes EOB, zero runs, sign, extras).
int coeff_token_cost(const int32_t* levels2d, int tx_size, int tx_type,
                     const uint8_t* probs_full, int ctx0) {
    init_prob_cost();
    const TxTables& t = g_tx[tx_size][tx_type];
    const int n2 = t.n2;
    int32_t lv[1024];
    for (int i = 0; i < n2; ++i) lv[i] = levels2d[t.scan[i]];
    int eob = 0;
    for (int i = n2 - 1; i >= 0; --i) {
        if (lv[i]) { eob = i + 1; break; }
    }
    int32_t cache[1024];
    std::memset(cache, 0, sizeof(int32_t) * n2);
    bool skip_eob = false;
    int cost = 0;
    for (int c = 0; c <= eob && c < n2; ++c) {
        int pt = (c == 0)
            ? ctx0
            : (1 + cache[t.nbrs[2 * c]] + cache[t.nbrs[2 * c + 1]]) >> 1;
        int b = t.band[c];
        const uint8_t* p = probs_full + (b * 6 + pt) * 11;
        bool is_eob = (c == eob);
        if (!skip_eob) cost += bit_cost(is_eob ? 0 : 1, p[0]);
        if (is_eob) break;
        int level = lv[c];
        int mag = level < 0 ? -level : level;
        int tokv = token_from_mag(mag);
        if (mag == 0) {
            cost += bit_cost(0, p[1]);
            cache[t.scan[c]] = 0;
            skip_eob = true;
            continue;
        }
        cost += bit_cost(1, p[1]);
        skip_eob = false;
        cache[t.scan[c]] = g_energy[tokv];
        if (mag == 1) {
            cost += bit_cost(0, p[2]);
        } else {
            cost += bit_cost(1, p[2]);
            const Path& path = g_con_paths[tokv];
            for (int k = 0; k < path.len; ++k)
                cost += bit_cost(path.bit[k], p[3 + path.idx[k]]);
            if (tokv >= 5) {
                int cat = tokv - 5;
                int extra = mag - g_cat_base[cat];
                int nbits = g_cat_bits[cat];
                for (int k = 0; k < nbits; ++k)
                    cost += bit_cost((extra >> (nbits - 1 - k)) & 1,
                                     g_cat_probs[cat][k]);
            }
        }
        cost += 256;  // sign bit at prob 128
    }
    return cost;
}

// Batched variant: nb blocks of levels (each n*n int32, row-major 2-D),
// shared probs, per-block ctx0; writes per-block costs (1/256 bits).
void coeff_token_cost_batch(const int32_t* levels, int nb, int n,
                            int tx_size, int tx_type,
                            const uint8_t* probs_full,
                            const int32_t* ctx0, int32_t* costs) {
    for (int i = 0; i < nb; ++i)
        costs[i] = coeff_token_cost(levels + (int64_t)i * n * n, tx_size,
                                    tx_type, probs_full, ctx0[i]);
}

// Batched full-pel SAD search: returns packed (dy<<20)|(dx<<8 as offsets)…
// simple per-block API: src nxn, ref region (n+2r)x(n+2r) with stride.
void sad_full_search(const uint8_t* src, int n, const uint8_t* region,
                     int region_stride, int r, int32_t* best) {
    int best_sad = INT32_MAX, best_dy = 0, best_dx = 0;
    for (int dy = 0; dy <= 2 * r; ++dy) {
        for (int dx = 0; dx <= 2 * r; ++dx) {
            const uint8_t* q = region + dy * region_stride + dx;
            int sad = 0;
            for (int y = 0; y < n; ++y) {
                const uint8_t* a = src + y * n;
                const uint8_t* bptr = q + y * region_stride;
                for (int x = 0; x < n; ++x) {
                    int d = (int)a[x] - (int)bptr[x];
                    sad += d < 0 ? -d : d;
                }
                if (sad >= best_sad) break;
            }
            if (sad < best_sad) {
                best_sad = sad;
                best_dy = dy - r;
                best_dx = dx - r;
            }
        }
    }
    best[0] = best_dy;
    best[1] = best_dx;
    best[2] = best_sad;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Loop filter (exact spec kernels; decisions precomputed in Python)
// ---------------------------------------------------------------------------

extern "C" {

static inline int clamp_i(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int c8(int t) { return clamp_i(t, -128, 127); }

static void lf_filter_line(uint8_t* px[16], int taps, int width, int lvl,
                           int lim, int blim) {
    // px[k] points at pixel offset k-8 from the edge (px[8] = q0).
    // Only `taps` pixels per side are valid to read (4 unless width 16).
    int p[8] = {0}, q[8] = {0};
    for (int k = 0; k < taps; ++k) {
        p[k] = *px[7 - k];
        q[k] = *px[8 + k];
    }
    int thresh = lvl >> 4;
    bool mask = true;
    for (int k = 0; k < 3; ++k) {
        if (std::abs(p[k + 1] - p[k]) > lim) mask = false;
        if (std::abs(q[k + 1] - q[k]) > lim) mask = false;
    }
    if (std::abs(p[0] - q[0]) * 2 + std::abs(p[1] - q[1]) / 2 > blim)
        mask = false;
    // filter4 core
    bool hev = std::abs(p[1] - p[0]) > thresh || std::abs(q[1] - q[0]) > thresh;
    int ps1 = p[1] - 128, ps0 = p[0] - 128, qs0 = q[0] - 128, qs1 = q[1] - 128;
    int f = hev ? c8(ps1 - qs1) : 0;
    f = mask ? c8(f + 3 * (qs0 - ps0)) : 0;
    int f1 = c8(f + 4) >> 3;
    int f2 = c8(f + 3) >> 3;
    int nq0 = c8(qs0 - f1) + 128;
    int np0 = c8(ps0 + f2) + 128;
    int fa = hev ? 0 : ((f1 + 1) >> 1);
    int nq1 = c8(qs1 - fa) + 128;
    int np1 = c8(ps1 + fa) + 128;
    if (width == 4) {
        *px[7] = (uint8_t)np0; *px[6] = (uint8_t)np1;
        *px[8] = (uint8_t)nq0; *px[9] = (uint8_t)nq1;
        return;
    }
    bool flat = mask;
    for (int k = 1; k <= 3 && flat; ++k) {
        if (std::abs(p[k] - p[0]) > 1 || std::abs(q[k] - q[0]) > 1)
            flat = false;
    }
    if (!(flat && mask)) {
        *px[7] = (uint8_t)np0; *px[6] = (uint8_t)np1;
        *px[8] = (uint8_t)nq0; *px[9] = (uint8_t)nq1;
        return;
    }
    if (width == 8) {
        int o[6];
        o[0] = (p[3] + p[3] + p[3] + 2 * p[2] + p[1] + p[0] + q[0] + 4) >> 3;
        o[1] = (p[3] + p[3] + p[2] + 2 * p[1] + p[0] + q[0] + q[1] + 4) >> 3;
        o[2] = (p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2] + 4) >> 3;
        o[3] = (p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3] + 4) >> 3;
        o[4] = (p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] + q[3] + 4) >> 3;
        o[5] = (p[0] + q[0] + q[1] + 2 * q[2] + q[3] + q[3] + q[3] + 4) >> 3;
        *px[5] = (uint8_t)o[0]; *px[6] = (uint8_t)o[1]; *px[7] = (uint8_t)o[2];
        *px[8] = (uint8_t)o[3]; *px[9] = (uint8_t)o[4]; *px[10] = (uint8_t)o[5];
        return;
    }
    // width 16
    bool flat2 = true;
    for (int k = 4; k <= 7 && flat2; ++k) {
        if (std::abs(p[k] - p[0]) > 1 || std::abs(q[k] - q[0]) > 1)
            flat2 = false;
    }
    if (!flat2) {
        // fall back to the 8 path
        int o[6];
        o[0] = (p[3] + p[3] + p[3] + 2 * p[2] + p[1] + p[0] + q[0] + 4) >> 3;
        o[1] = (p[3] + p[3] + p[2] + 2 * p[1] + p[0] + q[0] + q[1] + 4) >> 3;
        o[2] = (p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2] + 4) >> 3;
        o[3] = (p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3] + 4) >> 3;
        o[4] = (p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] + q[3] + 4) >> 3;
        o[5] = (p[0] + q[0] + q[1] + 2 * q[2] + q[3] + q[3] + q[3] + 4) >> 3;
        *px[5] = (uint8_t)o[0]; *px[6] = (uint8_t)o[1]; *px[7] = (uint8_t)o[2];
        *px[8] = (uint8_t)o[3]; *px[9] = (uint8_t)o[4]; *px[10] = (uint8_t)o[5];
        return;
    }
    int np[7], nq[7];
    for (int k = 0; k < 7; ++k) {
        int acc = p[7] * (k + 1) + 2 * p[k];
        for (int j = k + 1; j < 7; ++j) acc += p[j];
        for (int j = 0; j < k; ++j) acc += p[j];
        for (int j = 0; j < 7 - k; ++j) acc += q[j];
        np[k] = (acc + 8) >> 4;
        acc = q[7] * (k + 1) + 2 * q[k];
        for (int j = k + 1; j < 7; ++j) acc += q[j];
        for (int j = 0; j < k; ++j) acc += q[j];
        for (int j = 0; j < 7 - k; ++j) acc += p[j];
        nq[k] = (acc + 8) >> 4;
    }
    for (int k = 0; k < 7; ++k) {
        *px[7 - k] = (uint8_t)np[k];
        *px[8 + k] = (uint8_t)nq[k];
    }
}

static void lf_vert_seg(uint8_t* plane, int stride, int x, int y0, int nrows,
                        int width, int lvl, int lim, int blim) {
    for (int r = 0; r < nrows; ++r) {
        uint8_t* row = plane + (int64_t)(y0 + r) * stride + x;
        int taps = width == 16 ? 8 : 4;
        uint8_t* px[16];
        for (int k = 8 - taps; k < 8 + taps; ++k) px[k] = row + (k - 8);
        lf_filter_line(px, taps, width, lvl, lim, blim);
    }
}

static void lf_horz_seg(uint8_t* plane, int stride, int y, int x0, int ncols,
                        int width, int lvl, int lim, int blim) {
    for (int ccc = 0; ccc < ncols; ++ccc) {
        uint8_t* col = plane + (int64_t)y * stride + x0 + ccc;
        int taps = width == 16 ? 8 : 4;
        uint8_t* px[16];
        for (int k = 8 - taps; k < 8 + taps; ++k)
            px[k] = col + (int64_t)(k - 8) * stride;
        lf_filter_line(px, taps, width, lvl, lim, blim);
    }
}

// decisions: per mi step: [lvl, vw, vint, hw, hint] int32, laid out
// (n_rows_steps, n_col_steps, 5).  mi coordinates/step in plane space.
void lf_plane(uint8_t* plane, int stride, const int32_t* dec,
              int n_row_steps, int n_col_steps, int sb_span,
              int px_per_step, int plane_h, int plane_w,
              const int32_t* lim_lut, const int32_t* mblim_lut) {
    // process per SB in raster order: vert edges then horz edges
    for (int sb_r = 0; sb_r < n_row_steps; sb_r += sb_span) {
        for (int sb_c = 0; sb_c < n_col_steps; sb_c += sb_span) {
            int r1 = sb_r + sb_span < n_row_steps ? sb_r + sb_span
                                                  : n_row_steps;
            int c1 = sb_c + sb_span < n_col_steps ? sb_c + sb_span
                                                  : n_col_steps;
            for (int ci = sb_c; ci < c1; ++ci) {
                int x = ci * px_per_step;
                for (int ri = sb_r; ri < r1; ++ri) {
                    const int32_t* d = dec + ((int64_t)ri * n_col_steps + ci) * 5;
                    int lvl = d[0], vw = d[1], vint = d[2];
                    if (!lvl) continue;
                    int y0 = ri * px_per_step;
                    // odd mi dims: the last step row holds a single mi
                    // (half a step) -- clamp to the mi-aligned plane
                    int nrows = plane_h - y0 < px_per_step ? plane_h - y0
                                                           : px_per_step;
                    if (vw && x > 0)
                        lf_vert_seg(plane, stride, x, y0, nrows, vw,
                                    lvl, lim_lut[lvl], mblim_lut[lvl]);
                    if (vint)
                        lf_vert_seg(plane, stride, x + 4, y0, nrows, 4,
                                    lvl, lim_lut[lvl], mblim_lut[lvl]);
                }
            }
            for (int ri = sb_r; ri < r1; ++ri) {
                int y = ri * px_per_step;
                for (int ci = sb_c; ci < c1; ++ci) {
                    const int32_t* d = dec + ((int64_t)ri * n_col_steps + ci) * 5;
                    int lvl = d[0], hw = d[3], hint = d[4];
                    if (!lvl) continue;
                    int x0 = ci * px_per_step;
                    int ncols = plane_w - x0 < px_per_step ? plane_w - x0
                                                           : px_per_step;
                    if (hw && y > 0)
                        lf_horz_seg(plane, stride, y, x0, ncols, hw,
                                    lvl, lim_lut[lvl], mblim_lut[lvl]);
                    if (hint)
                        lf_horz_seg(plane, stride, y + 4, x0, ncols, 4,
                                    lvl, lim_lut[lvl], mblim_lut[lvl]);
                }
            }
        }
    }
}

// sub-pel SAD probe: 8-tap 2-stage convolve of an (n+7)x(n+7) window.
int64_t subpel_sad(const uint8_t* ref, int stride, const uint8_t* src, int n,
                   int sx, int sy, const int16_t* fx, const int16_t* fy) {
    // ref points at (y0-3, x0-3)
    int inter[71 * 64];
    int ih = n + 7;
    for (int y = 0; y < ih; ++y) {
        const uint8_t* row = ref + (int64_t)y * stride;
        for (int x = 0; x < n; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += row[x + k] * fx[k];
            sum = (sum + 64) >> 7;
            inter[y * 64 + x] = clamp_i(sum, 0, 255);
        }
    }
    int64_t sad = 0;
    for (int y = 0; y < n; ++y) {
        for (int x = 0; x < n; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += inter[(y + k) * 64 + x] * fy[k];
            sum = clamp_i((sum + 64) >> 7, 0, 255);
            int d = sum - (int)src[y * n + x];
            sad += d < 0 ? -d : d;
        }
    }
    return sad;
}

}  // extern "C"

extern "C" {

// Iterative half- then quarter-pel refinement (4-neighbour descent),
// mirroring tpu_vp9.ops.me.subpel_refine.  base = plane pointer at the
// block origin (full-pel); filters: 16 phases x 8 taps int16.
void subpel_refine_c(const uint8_t* base, int stride, const uint8_t* src,
                     int n, int mv_row_q3, int mv_col_q3,
                     const int16_t* filters, int32_t* out) {
    auto sad_at = [&](int row_q3, int col_q3) -> int64_t {
        int x_q4 = col_q3 * 2, y_q4 = row_q3 * 2;
        int x0 = x_q4 >> 4, y0 = y_q4 >> 4;
        int sx = x_q4 & 15, sy = y_q4 & 15;
        const uint8_t* win = base + (int64_t)(y0 - 3) * stride + (x0 - 3);
        return subpel_sad(win, stride, src, n, sx, sy, filters + sx * 8,
                          filters + sy * 8);
    };
    int br = mv_row_q3, bc = mv_col_q3;
    int64_t best = sad_at(br, bc);
    static const int steps[2] = {4, 2};
    for (int si = 0; si < 2; ++si) {
        int st = steps[si];
        bool improved = true;
        while (improved) {
            improved = false;
            const int cand[4][2] = {{-st, 0}, {st, 0}, {0, -st}, {0, st}};
            for (int k = 0; k < 4; ++k) {
                int rr = br + cand[k][0], cc = bc + cand[k][1];
                int64_t s = sad_at(rr, cc);
                if (s < best) {
                    best = s;
                    br = rr;
                    bc = cc;
                    improved = true;
                }
            }
        }
    }
    out[0] = br;
    out[1] = bc;
    out[2] = (int32_t)best;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused MC + SAD for mode-decision candidate evaluation.  Mirrors
// tpu_vp9.ops.inter.predict_inter_block (clamp_mv_to_umv_border, q3->q4,
// exact 2-stage 8-tap convolve, full-pel identity fast path) followed by
// an abs-diff sum vs the source block.  This is the reference's
// "prediction + SAD" fast loop (EbEncDecProcess.c perform_fast_loop
// analogue) with the per-call Python overhead removed.
// ---------------------------------------------------------------------------

extern "C" {

// Predict one luma block (ss=0, w x h, w/h in {8..64}) into out[h*w].
// padded: border-extended plane; stride its row stride; border offset.
static void mc_predict_y(const uint8_t* padded, int stride, int border,
                         int mi_row, int mi_col, int w, int h,
                         int mv_row_q3, int mv_col_q3,
                         int mi_rows, int mi_cols,
                         const int16_t* filters, uint8_t* out) {
    // clamp_mv_to_umv_border, ss=0 (q4 units)
    const int spel_left = (4 + w) << 4;
    const int spel_right = spel_left - 16;
    const int spel_top = (4 + h) << 4;
    const int spel_bottom = spel_top - 16;
    int row = mv_row_q3 * 2, col = mv_col_q3 * 2;
    const int mb_to_left = -((mi_col * 8) * 8);
    const int mb_to_right = ((mi_cols - w / 8 - mi_col) * 8) * 8;
    const int mb_to_top = -((mi_row * 8) * 8);
    const int mb_to_bottom = ((mi_rows - h / 8 - mi_row) * 8) * 8;
    col = clamp_i(col, mb_to_left * 2 - spel_left,
                  mb_to_right * 2 + spel_right);
    row = clamp_i(row, mb_to_top * 2 - spel_top,
                  mb_to_bottom * 2 + spel_bottom);
    const int px = mi_col * 8, py = mi_row * 8;
    const int x_q4 = (px << 4) + col, y_q4 = (py << 4) + row;
    const int x0 = x_q4 >> 4, y0 = y_q4 >> 4;
    const int sx = x_q4 & 15, sy = y_q4 & 15;
    const uint8_t* base =
        padded + (int64_t)(border + y0) * stride + (border + x0);
    if (sx == 0 && sy == 0) {
        for (int y = 0; y < h; ++y)
            for (int x = 0; x < w; ++x) out[y * w + x] = base[y * stride + x];
        return;
    }
    const int16_t* fx = filters + sx * 8;
    const int16_t* fy = filters + sy * 8;
    int inter[71 * 64];
    const int ih = h + 7;
    const uint8_t* win = base - 3 * stride - 3;
    for (int y = 0; y < ih; ++y) {
        const uint8_t* rowp = win + (int64_t)y * stride;
        for (int x = 0; x < w; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += rowp[x + k] * fx[k];
            inter[y * 64 + x] = clamp_i((sum + 64) >> 7, 0, 255);
        }
    }
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += inter[(y + k) * 64 + x] * fy[k];
            out[y * w + x] = (uint8_t)clamp_i((sum + 64) >> 7, 0, 255);
        }
    }
}

int64_t mc_block_sad(const uint8_t* padded, int stride, int border,
                     int mi_row, int mi_col, int w, int h,
                     int mv_row_q3, int mv_col_q3,
                     int mi_rows, int mi_cols,
                     const uint8_t* src, int src_stride,
                     const int16_t* filters) {
    uint8_t pred[64 * 64];
    mc_predict_y(padded, stride, border, mi_row, mi_col, w, h, mv_row_q3,
                 mv_col_q3, mi_rows, mi_cols, filters, pred);
    int64_t sad = 0;
    for (int y = 0; y < h; ++y) {
        const uint8_t* s = src + (int64_t)y * src_stride;
        const uint8_t* p = pred + y * w;
        for (int x = 0; x < w; ++x) {
            int d = (int)p[x] - (int)s[x];
            sad += d < 0 ? -d : d;
        }
    }
    return sad;
}

// Compound (two-reference averaged) MC + SAD: round-to-even average per
// spec ((p0 + p1 + 1) >> 1), as in tpu_vp9 comp_sad.
int64_t mc_block_sad_avg(const uint8_t* padded0, int stride0,
                         const uint8_t* padded1, int stride1, int border,
                         int mi_row, int mi_col, int w, int h,
                         int mv0_row_q3, int mv0_col_q3,
                         int mv1_row_q3, int mv1_col_q3,
                         int mi_rows, int mi_cols,
                         const uint8_t* src, int src_stride,
                         const int16_t* filters) {
    uint8_t p0[64 * 64], p1[64 * 64];
    mc_predict_y(padded0, stride0, border, mi_row, mi_col, w, h, mv0_row_q3,
                 mv0_col_q3, mi_rows, mi_cols, filters, p0);
    mc_predict_y(padded1, stride1, border, mi_row, mi_col, w, h, mv1_row_q3,
                 mv1_col_q3, mi_rows, mi_cols, filters, p1);
    int64_t sad = 0;
    for (int y = 0; y < h; ++y) {
        const uint8_t* s = src + (int64_t)y * src_stride;
        for (int x = 0; x < w; ++x) {
            int avg = ((int)p0[y * w + x] + (int)p1[y * w + x] + 1) >> 1;
            int d = avg - (int)s[x];
            sad += d < 0 ? -d : d;
        }
    }
    return sad;
}

// SSE variants of the fused MC metrics: the mode-decision fast loop
// costs candidates in squared-error units (dimensionally consistent
// with the q^2 lambda; captures compound noise-averaging gains SAD
// cannot see).
int64_t mc_block_sse(const uint8_t* padded, int stride, int border,
                     int mi_row, int mi_col, int w, int h,
                     int mv_row_q3, int mv_col_q3,
                     int mi_rows, int mi_cols,
                     const uint8_t* src, int src_stride,
                     const int16_t* filters) {
    uint8_t pred[64 * 64];
    mc_predict_y(padded, stride, border, mi_row, mi_col, w, h, mv_row_q3,
                 mv_col_q3, mi_rows, mi_cols, filters, pred);
    int64_t sse = 0;
    for (int y = 0; y < h; ++y) {
        const uint8_t* s = src + (int64_t)y * src_stride;
        const uint8_t* p = pred + y * w;
        for (int x = 0; x < w; ++x) {
            int d = (int)p[x] - (int)s[x];
            sse += (int64_t)d * d;
        }
    }
    return sse;
}

int64_t mc_block_sse_avg(const uint8_t* padded0, int stride0,
                         const uint8_t* padded1, int stride1, int border,
                         int mi_row, int mi_col, int w, int h,
                         int mv0_row_q3, int mv0_col_q3,
                         int mv1_row_q3, int mv1_col_q3,
                         int mi_rows, int mi_cols,
                         const uint8_t* src, int src_stride,
                         const int16_t* filters) {
    uint8_t p0[64 * 64], p1[64 * 64];
    mc_predict_y(padded0, stride0, border, mi_row, mi_col, w, h, mv0_row_q3,
                 mv0_col_q3, mi_rows, mi_cols, filters, p0);
    mc_predict_y(padded1, stride1, border, mi_row, mi_col, w, h, mv1_row_q3,
                 mv1_col_q3, mi_rows, mi_cols, filters, p1);
    int64_t sse = 0;
    for (int y = 0; y < h; ++y) {
        const uint8_t* s = src + (int64_t)y * src_stride;
        for (int x = 0; x < w; ++x) {
            int avg = ((int)p0[y * w + x] + (int)p1[y * w + x] + 1) >> 1;
            int d = avg - (int)s[x];
            sse += (int64_t)d * d;
        }
    }
    return sse;
}

// Rectangular full-pel exhaustive SAD search (w x h block, strided src).
// Width-specialised rows let the compiler vectorise the inner loop
// (the generic runtime-width loop with a per-row early exit blocked
// AVX2 codegen — the M0-M4 probe pre-pass runs thousands of these).
}  // extern "C" (template specialisations below are C++-linkage)

namespace sadimpl {
template <int W>
static inline int sad_row_t(const uint8_t* a, const uint8_t* b) {
    int sad = 0;
    for (int x = 0; x < W; ++x) {
        int d = (int)a[x] - (int)b[x];
        sad += d < 0 ? -d : d;
    }
    return sad;
}

template <int W>
static void sad_search_t(const uint8_t* src, int src_stride, int h,
                         const uint8_t* region, int region_stride, int r,
                         int32_t* best) {
    int best_sad = INT32_MAX, best_dy = 0, best_dx = 0;
    for (int dy = 0; dy <= 2 * r; ++dy) {
        for (int dx = 0; dx <= 2 * r; ++dx) {
            const uint8_t* q = region + dy * region_stride + dx;
            int sad = 0;
            for (int y = 0; y < h; ++y) {
                sad += sad_row_t<W>(src + (int64_t)y * src_stride,
                                    q + (int64_t)y * region_stride);
                if (sad >= best_sad) break;
            }
            if (sad < best_sad) {
                best_sad = sad;
                best_dy = dy - r;
                best_dx = dx - r;
            }
        }
    }
    best[0] = best_dy;
    best[1] = best_dx;
    best[2] = best_sad;
}

}  // namespace sadimpl

extern "C" {

void sad_full_search_rect(const uint8_t* src, int src_stride, int w, int h,
                          const uint8_t* region, int region_stride, int r,
                          int32_t* best) {
    using namespace sadimpl;
    switch (w) {
        case 64: return sad_search_t<64>(src, src_stride, h, region,
                                         region_stride, r, best);
        case 32: return sad_search_t<32>(src, src_stride, h, region,
                                         region_stride, r, best);
        case 16: return sad_search_t<16>(src, src_stride, h, region,
                                         region_stride, r, best);
        case 8: return sad_search_t<8>(src, src_stride, h, region,
                                       region_stride, r, best);
        case 4: return sad_search_t<4>(src, src_stride, h, region,
                                       region_stride, r, best);
    }
    int best_sad = INT32_MAX, best_dy = 0, best_dx = 0;
    for (int dy = 0; dy <= 2 * r; ++dy) {
        for (int dx = 0; dx <= 2 * r; ++dx) {
            const uint8_t* q = region + dy * region_stride + dx;
            int sad = 0;
            for (int y = 0; y < h; ++y) {
                const uint8_t* a = src + (int64_t)y * src_stride;
                const uint8_t* bptr = q + (int64_t)y * region_stride;
                for (int x = 0; x < w; ++x) {
                    int d = (int)a[x] - (int)bptr[x];
                    sad += d < 0 ? -d : d;
                }
                if (sad >= best_sad) break;
            }
            if (sad < best_sad) {
                best_sad = sad;
                best_dy = dy - r;
                best_dx = dx - r;
            }
        }
    }
    best[0] = best_dy;
    best[1] = best_dx;
    best[2] = best_sad;
}

// Batched rect full-pel searches with the ZERO-mv guard, threaded over
// jobs (the per-probe ctypes round trips were ~60% of the M0-M4
// partition-descent wall time; one call per TREE LEVEL replaces ~17k
// calls per CIF frame).  jobs rows: (px, py, w, h, cy, cx, r) in plane
// coords plus a guard flag; out rows: (dy, dx, sad) absolute-of-center
// with the zero-mv preference applied when guard != 0 (matches
// ops/me.full_pel_search + probe_inter_cost's guard).
void sad_search_batch(const uint8_t* src_plane, int64_t src_stride,
                      const uint8_t* ref_padded, int64_t ref_stride,
                      int border, int plane_h, int plane_w,
                      const int32_t* jobs, int njobs, int32_t* out) {
    auto run = [&](int lo, int hi) {
        for (int j = lo; j < hi; ++j) {
            const int32_t* q = jobs + (int64_t)j * 8;
            int px = q[0], py = q[1], w = q[2], h = q[3];
            int cy = q[4], cx = q[5], r = q[6], guard = q[7];
            // clamp centre so the window stays inside the padded plane
            int lo_y = r - border - py, hi_y = plane_h - border - py - h - r;
            int lo_x = r - border - px, hi_x = plane_w - border - px - w - r;
            cy = cy < lo_y ? lo_y : (cy > hi_y ? hi_y : cy);
            cx = cx < lo_x ? lo_x : (cx > hi_x ? hi_x : cx);
            const uint8_t* src = src_plane + (int64_t)py * src_stride + px;
            const uint8_t* region = ref_padded
                + (int64_t)(border + py + cy - r) * ref_stride
                + (border + px + cx - r);
            int32_t best[3];
            sad_full_search_rect(src, (int)src_stride, w, h, region,
                                 (int)ref_stride, r, best);
            int dy = cy + best[0], dx = cx + best[1], sad = best[2];
            if (guard) {
                const uint8_t* z = ref_padded
                    + (int64_t)(border + py) * ref_stride + (border + px);
                int zsad = 0;
                for (int y = 0; y < h; ++y) {
                    const uint8_t* a = src + (int64_t)y * src_stride;
                    const uint8_t* b = z + (int64_t)y * ref_stride;
                    for (int x = 0; x < w; ++x) {
                        int d = (int)a[x] - (int)b[x];
                        zsad += d < 0 ? -d : d;
                    }
                }
                if (zsad <= sad) { dy = 0; dx = 0; sad = zsad; }
            }
            out[(int64_t)j * 3] = dy;
            out[(int64_t)j * 3 + 1] = dx;
            out[(int64_t)j * 3 + 2] = sad;
        }
    };
    if (njobs >= 64) {
        int mid = njobs / 2;
        std::thread t(run, 0, mid);
        run(mid, njobs);
        t.join();
    } else {
        run(0, njobs);
    }
}

// Rectangular iterative half/quarter-pel refinement (strided src).
void subpel_refine_rect(const uint8_t* base, int stride, const uint8_t* src,
                        int src_stride, int w, int h,
                        int mv_row_q3, int mv_col_q3,
                        const int16_t* filters, int32_t* out) {
    auto sad_at = [&](int row_q3, int col_q3) -> int64_t {
        int x_q4 = col_q3 * 2, y_q4 = row_q3 * 2;
        int x0 = x_q4 >> 4, y0 = y_q4 >> 4;
        int sx = x_q4 & 15, sy = y_q4 & 15;
        const uint8_t* win = base + (int64_t)(y0 - 3) * stride + (x0 - 3);
        const int16_t* fx = filters + sx * 8;
        const int16_t* fy = filters + sy * 8;
        if (sx == 0 && sy == 0) {
            const uint8_t* p = base + (int64_t)y0 * stride + x0;
            int64_t sad = 0;
            for (int y = 0; y < h; ++y)
                for (int x = 0; x < w; ++x) {
                    int d = (int)p[(int64_t)y * stride + x]
                            - (int)src[(int64_t)y * src_stride + x];
                    sad += d < 0 ? -d : d;
                }
            return sad;
        }
        int inter[71 * 64];
        const int ih = h + 7;
        for (int y = 0; y < ih; ++y) {
            const uint8_t* rowp = win + (int64_t)y * stride;
            for (int x = 0; x < w; ++x) {
                int sum = 0;
                for (int k = 0; k < 8; ++k) sum += rowp[x + k] * fx[k];
                inter[y * 64 + x] = clamp_i((sum + 64) >> 7, 0, 255);
            }
        }
        int64_t sad = 0;
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                int sum = 0;
                for (int k = 0; k < 8; ++k)
                    sum += inter[(y + k) * 64 + x] * fy[k];
                sum = clamp_i((sum + 64) >> 7, 0, 255);
                int d = sum - (int)src[(int64_t)y * src_stride + x];
                sad += d < 0 ? -d : d;
            }
        }
        return sad;
    };
    int br = mv_row_q3, bc = mv_col_q3;
    int64_t best = sad_at(br, bc);
    static const int steps[2] = {4, 2};
    for (int si = 0; si < 2; ++si) {
        int st = steps[si];
        bool improved = true;
        while (improved) {
            improved = false;
            const int cand[4][2] = {{-st, 0}, {st, 0}, {0, -st}, {0, st}};
            for (int k = 0; k < 4; ++k) {
                int rr = br + cand[k][0], cc = bc + cand[k][1];
                int64_t s = sad_at(rr, cc);
                if (s < best) {
                    best = s;
                    br = rr;
                    bc = cc;
                    improved = true;
                }
            }
        }
    }
    out[0] = br;
    out[1] = bc;
    out[2] = (int32_t)best;
}

// Batched bool-coder bit writes: one ctypes crossing for a run of
// (bit, prob) pairs accumulated on the Python side.
void boolenc_put_many(BoolEnc* e, const uint8_t* bits, const uint8_t* probs,
                      int64_t count) {
    for (int64_t i = 0; i < count; ++i) put_bit(e, bits[i], probs[i]);
}

}  // extern "C"

// ===========================================================================
// Fast-loop mode decision for the uniform-grid P-frame path (presets M5-M9).
//
// One call per tile runs the whole per-leaf candidate evaluation natively in
// decode order: the normative MV-reference scan (vp9_mvref_common.c
// semantics, reading the flat mode-info field arrays), NEAREST/NEAR/ZERO
// predictor costs, full-pel (+HME) and subpel NEW search, compound-average
// candidates, and the open-loop intra-DC fallback.  Bit-identical to the
// Python decide_leaf_inter loop (asserted by tests/test_native_fastloop.py);
// reference analogue: EbEncDecProcess.c perform_fast_loop (:180) +
// EbModeDecision.c candidate injection (:185-457).
// ===========================================================================

namespace fastloop {

static const int BW_PX[13] = {4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 32, 64, 64};
static const int BH_PX[13] = {4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 64, 32, 64};

// MV_REF_BLOCKS (row, col) scan offsets per bsize (vp9_mvref_common.c)
static const int8_t MVREF[13][8][2] = {
    {{-1, 0}, {0, -1}, {-1, -1}, {-2, 0}, {0, -2}, {-2, -1}, {-1, -2}, {-2, -2}},
    {{-1, 0}, {0, -1}, {-1, -1}, {-2, 0}, {0, -2}, {-2, -1}, {-1, -2}, {-2, -2}},
    {{-1, 0}, {0, -1}, {-1, -1}, {-2, 0}, {0, -2}, {-2, -1}, {-1, -2}, {-2, -2}},
    {{-1, 0}, {0, -1}, {-1, -1}, {-2, 0}, {0, -2}, {-2, -1}, {-1, -2}, {-2, -2}},
    {{0, -1}, {-1, 0}, {1, -1}, {-1, -1}, {0, -2}, {-2, 0}, {-2, -1}, {-1, -2}},
    {{-1, 0}, {0, -1}, {-1, 1}, {-1, -1}, {-2, 0}, {0, -2}, {-1, -2}, {-2, -1}},
    {{-1, 0}, {0, -1}, {-1, 1}, {1, -1}, {-1, -1}, {-3, 0}, {0, -3}, {-3, -3}},
    {{0, -1}, {-1, 0}, {2, -1}, {-1, -1}, {-1, 1}, {0, -3}, {-3, 0}, {-3, -3}},
    {{-1, 0}, {0, -1}, {-1, 2}, {-1, -1}, {1, -1}, {-3, 0}, {0, -3}, {-3, -3}},
    {{-1, 1}, {1, -1}, {-1, 2}, {2, -1}, {-1, -1}, {-3, 0}, {0, -3}, {-3, -3}},
    {{0, -1}, {-1, 0}, {4, -1}, {-1, 2}, {-1, -1}, {0, -3}, {-3, 0}, {2, -1}},
    {{-1, 0}, {0, -1}, {-1, 4}, {2, -1}, {-1, -1}, {-3, 0}, {0, -3}, {-1, 2}},
    {{-1, 3}, {3, -1}, {-1, 4}, {4, -1}, {-1, -1}, {-1, 0}, {0, -1}, {-1, 6}},
};

static const int COUNTER_TO_CONTEXT[19] = {2, 3, 4, 1, 3, 9, 0, 9, 9, 5,
                                           5, 9, 5, 9, 9, 9, 9, 9, 6};

static inline int mode2counter(int combined_mode) {
    // intra x10 -> 9; NEAREST(10) 0, NEAR(11) 0, ZERO(12) 3, NEW(13) 1
    if (combined_mode < 10) return 9;
    if (combined_mode == 12) return 3;
    if (combined_mode == 13) return 1;
    return 0;
}

struct MiGrid {
    int mi_rows, mi_cols;
    uint8_t* inter;
    int8_t* ref0;
    int8_t* ref1;
    int8_t* mode;
    int32_t* mv0;  // [cell][2]
    int32_t* mv1;
};

struct RefPlane {
    const uint8_t* full;   // border-extended plane
    const uint8_t* half;   // HME pyramid (may be null)
    const uint8_t* quarter;
    int fh, fw;            // full plane dims (incl. borders)
    int range;             // full-pel search range (<=0 => absent)
};

struct Ctx {
    MiGrid g;
    const uint8_t* src;  // padded source Y plane
    int64_t src_stride;
    int border, frame_w, frame_h;
    int tile_mi_start, tile_mi_end;
    int64_t lam;
    int do_subpel, restrict_flag;
    const int32_t* sign_bias;  // [4]
    const int8_t* prev_ref0;
    const int8_t* prev_ref1;
    const int32_t* prev_mv0;
    const int32_t* prev_mv1;
    const int16_t* filters;
    RefPlane refs[3];  // LAST, GOLDEN, ALTREF
};

struct MvRefs {
    int mv[2][2];   // (row, col) x2
    int mode_ctx;
    int stable;
};

static const int MV_BORDER_Q3 = 16 << 3;

static void mb_edges(int mi_row, int mi_col, int bsize, int mi_rows,
                     int mi_cols, int* tl, int* tr, int* tt, int* tb) {
    int bw = BW_PX[bsize] >= 8 ? BW_PX[bsize] / 8 : 1;
    int bh = BH_PX[bsize] >= 8 ? BH_PX[bsize] / 8 : 1;
    *tl = -(mi_col * 8) * 8;
    *tr = ((mi_cols - bw - mi_col) * 8) * 8;
    *tt = -(mi_row * 8) * 8;
    *tb = ((mi_rows - bh - mi_row) * 8) * 8;
}

static inline void clamp_mv(int* r, int* c, int lo_c, int hi_c, int lo_r,
                            int hi_r) {
    if (*r < lo_r) *r = lo_r;
    if (*r > hi_r) *r = hi_r;
    if (*c < lo_c) *c = lo_c;
    if (*c > hi_c) *c = hi_c;
}

// ADD_MV_REF_LIST semantics: unique-2 early exit.  Returns true when done.
static inline bool add_mv(MvRefs* o, int* n, int r, int c) {
    if (*n > 0) {
        if (r != o->mv[0][0] || c != o->mv[0][1]) {
            o->mv[1][0] = r;
            o->mv[1][1] = c;
            *n = 2;
            return true;
        }
    } else {
        o->mv[0][0] = r;
        o->mv[0][1] = c;
        *n = 1;
    }
    return false;
}

static void find_mv_refs(const Ctx& ctx, int mi_row, int mi_col, int bsize,
                         int ref_frame, MvRefs* out) {
    const MiGrid& g = ctx.g;
    const int8_t(*search)[2] = MVREF[bsize];
    int n = 0, counter = 0;
    bool different_ref_found = false, done = false;
    const int this_bias = ctx.sign_bias[ref_frame];

    auto inside = [&](int i) -> int64_t {
        int r = mi_row + search[i][0], c = mi_col + search[i][1];
        if (r < 0 || c < ctx.tile_mi_start || r >= g.mi_rows) return -1;
        int lim = g.mi_cols < ctx.tile_mi_end ? g.mi_cols : ctx.tile_mi_end;
        if (c >= lim) return -1;
        return (int64_t)r * g.mi_cols + c;
    };
    auto flip_r = [&](int v, int cand_ref) {
        return ctx.sign_bias[cand_ref] != this_bias ? -v : v;
    };

    for (int i = 0; i < 2 && !done; ++i) {
        int64_t cell = inside(i);
        if (cell < 0) continue;
        counter += mode2counter(g.mode[cell]);
        different_ref_found = true;
        if (g.inter[cell] && g.ref0[cell] == ref_frame) {
            done = add_mv(out, &n, g.mv0[cell * 2], g.mv0[cell * 2 + 1]);
        } else if (g.inter[cell] && g.ref1[cell] == ref_frame) {
            done = add_mv(out, &n, g.mv1[cell * 2], g.mv1[cell * 2 + 1]);
        }
    }
    if (!done) {
        for (int i = 2; i < 8 && !done; ++i) {
            int64_t cell = inside(i);
            if (cell < 0) continue;
            different_ref_found = true;
            if (g.inter[cell] && g.ref0[cell] == ref_frame) {
                done = add_mv(out, &n, g.mv0[cell * 2], g.mv0[cell * 2 + 1]);
            } else if (g.inter[cell] && g.ref1[cell] == ref_frame) {
                done = add_mv(out, &n, g.mv1[cell * 2], g.mv1[cell * 2 + 1]);
            }
        }
    }
    out->stable = n;
    const int64_t pc = (int64_t)mi_row * g.mi_cols + mi_col;
    if (!done && ctx.prev_ref0 != nullptr) {
        if (ctx.prev_ref0[pc] == ref_frame) {
            done = add_mv(out, &n, ctx.prev_mv0[pc * 2],
                          ctx.prev_mv0[pc * 2 + 1]);
        } else if (ctx.prev_ref1[pc] == ref_frame) {
            done = add_mv(out, &n, ctx.prev_mv1[pc * 2],
                          ctx.prev_mv1[pc * 2 + 1]);
        }
    }
    if (!done && different_ref_found) {
        for (int i = 0; i < 8 && !done; ++i) {
            int64_t cell = inside(i);
            if (cell < 0) continue;
            if (!g.inter[cell]) continue;
            if (g.ref0[cell] != ref_frame) {
                done = add_mv(out, &n,
                              flip_r(g.mv0[cell * 2], g.ref0[cell]),
                              flip_r(g.mv0[cell * 2 + 1], g.ref0[cell]));
                if (done) break;
            }
            if (g.ref1[cell] > 0 && g.ref1[cell] != ref_frame &&
                (g.mv1[cell * 2] != g.mv0[cell * 2] ||
                 g.mv1[cell * 2 + 1] != g.mv0[cell * 2 + 1])) {
                done = add_mv(out, &n,
                              flip_r(g.mv1[cell * 2], g.ref1[cell]),
                              flip_r(g.mv1[cell * 2 + 1], g.ref1[cell]));
            }
        }
    }
    if (!done && ctx.prev_ref0 != nullptr) {
        int p0 = ctx.prev_ref0[pc];
        if (p0 != ref_frame && p0 > 0) {
            done = add_mv(out, &n, flip_r(ctx.prev_mv0[pc * 2], p0),
                          flip_r(ctx.prev_mv0[pc * 2 + 1], p0));
        }
        if (!done) {
            int p1 = ctx.prev_ref1[pc];
            int m0r = ctx.prev_mv0[pc * 2], m0c = ctx.prev_mv0[pc * 2 + 1];
            int m1r = ctx.prev_mv1[pc * 2], m1c = ctx.prev_mv1[pc * 2 + 1];
            if (p1 > 0 && p1 != ref_frame && (m1r != m0r || m1c != m0c)) {
                add_mv(out, &n, flip_r(m1r, p1), flip_r(m1c, p1));
            }
        }
    }
    for (; n < 2; ++n) {
        out->mv[n][0] = 0;
        out->mv[n][1] = 0;
    }
    out->mode_ctx = COUNTER_TO_CONTEXT[counter];
    int tl, tr, tt, tb;
    mb_edges(mi_row, mi_col, bsize, g.mi_rows, g.mi_cols, &tl, &tr, &tt, &tb);
    for (int i = 0; i < 2; ++i) {
        clamp_mv(&out->mv[i][0], &out->mv[i][1], tl - MV_BORDER_Q3,
                 tr + MV_BORDER_Q3, tt - MV_BORDER_Q3, tb + MV_BORDER_Q3);
    }
}

static const int MV_MARGIN_Q3 = (160 - 4) << 3;

// lower_mv_precision (allow_hp = false) + clamp_mv2 -> (nearest, near)
static void best_ref_mvs(const MvRefs& refs, int mi_row, int mi_col,
                         int bsize, int mi_rows, int mi_cols, int nearest[2],
                         int nearv[2]) {
    int tl, tr, tt, tb;
    mb_edges(mi_row, mi_col, bsize, mi_rows, mi_cols, &tl, &tr, &tt, &tb);
    for (int i = 0; i < 2; ++i) {
        int r = refs.mv[i][0], c = refs.mv[i][1];
        if (r & 1) r += r > 0 ? -1 : 1;
        if (c & 1) c += c > 0 ? -1 : 1;
        clamp_mv(&r, &c, tl - MV_MARGIN_Q3, tr + MV_MARGIN_Q3,
                 tt - MV_MARGIN_Q3, tb + MV_MARGIN_Q3);
        (i == 0 ? nearest : nearv)[0] = r;
        (i == 0 ? nearest : nearv)[1] = c;
    }
}

static inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// ops/me.py full_pel_search: exhaustive SAD over +-r around a clamped
// center; first minimum (row-major) wins.  src_blk points at the block's
// top-left pixel (any stride); (px, py) locate the block in PLANE coords.
static void full_pel_search(const uint8_t* plane, int ph, int pw, int border,
                            const uint8_t* src_blk, int64_t src_stride,
                            int px, int py, int w, int h, int r, int cy_in,
                            int cx_in, int* best_dy, int* best_dx,
                            int64_t* best_sad) {
    int cy = clampi(cy_in, r - border - py, ph - border - py - h - r);
    int cx = clampi(cx_in, r - border - px, pw - border - px - w - r);
    const int y0 = border + py + cy - r;
    const int x0 = border + px + cx - r;
    int64_t best = INT64_MAX;
    int bdy = 0, bdx = 0;
    for (int dy = 0; dy <= 2 * r; ++dy) {
        for (int dx = 0; dx <= 2 * r; ++dx) {
            const uint8_t* q = plane + (int64_t)(y0 + dy) * pw + x0 + dx;
            int64_t sad = 0;
            for (int y = 0; y < h; ++y) {
                const uint8_t* a = src_blk + (int64_t)y * src_stride;
                const uint8_t* b = q + (int64_t)y * pw;
                for (int x = 0; x < w; ++x) {
                    int d = (int)a[x] - (int)b[x];
                    sad += d < 0 ? -d : d;
                }
                if (sad >= best) break;
            }
            if (sad < best) {
                best = sad;
                bdy = dy - r;
                bdx = dx - r;
            }
        }
    }
    *best_dy = cy + bdy;
    *best_dx = cx + bdx;
    *best_sad = best;
}

// ops/hme.py downsample2x: 2x2 box average, odd trailing row/col
// replicated.  out must hold ceil(h/2) * ceil(w/2).
static void downsample2x(const uint8_t* p, int64_t stride, int h, int w,
                         uint8_t* out, int* oh, int* ow) {
    int h2 = (h + 1) / 2, w2 = (w + 1) / 2;
    for (int y = 0; y < h2; ++y) {
        const uint8_t* r0 = p + (int64_t)(2 * y) * stride;
        const uint8_t* r1 = (2 * y + 1 < h) ? r0 + stride : r0;
        for (int x = 0; x < w2; ++x) {
            int x0 = 2 * x, x1 = (2 * x + 1 < w) ? 2 * x + 1 : 2 * x;
            int s = r0[x0] + r0[x1] + r1[x0] + r1[x1];
            out[y * w2 + x] = (uint8_t)((s + 2) >> 2);
        }
    }
    *oh = h2;
    *ow = w2;
}

// ops/hme.py hme_search: quarter-res sweep then +-2 refinements.
static void hme_search(const Ctx& ctx, const RefPlane& rp, int px, int py,
                       int w, int h, int total_range, int cy, int cx,
                       int* dy, int* dx, int64_t* sad) {
    const uint8_t* src_blk = ctx.src + (int64_t)py * ctx.src_stride + px;
    const int n = w < h ? w : h;
    if (n < 8 || total_range < 16 || rp.half == nullptr) {
        full_pel_search(rp.full, rp.fh, rp.fw, ctx.border, src_blk,
                        ctx.src_stride, px, py, w, h, total_range, cy, cx,
                        dy, dx, sad);
        return;
    }
    // per-block source pyramid (downsample2x of the block itself)
    uint8_t srcb[64 * 64], src_h[32 * 32], src_q[16 * 16];
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            srcb[y * w + x] = src_blk[(int64_t)y * ctx.src_stride + x];
    int hh, hw, qh, qw;
    downsample2x(srcb, w, h, w, src_h, &hh, &hw);
    downsample2x(src_h, hw, hh, hw, src_q, &qh, &qw);
    const int hfh = (rp.fh + 1) / 2, hfw = (rp.fw + 1) / 2;
    const int qfh = (hfh + 1) / 2, qfw = (hfw + 1) / 2;
    // np.round is round-half-to-even; nearbyint matches under the
    // default FE_TONEAREST mode
    int c2y = (int)nearbyint(cy / 4.0), c2x = (int)nearbyint(cx / 4.0);
    int r2 = total_range >> 2;
    if (r2 < 2) r2 = 2;
    int dy2, dx2, dy1, dx1;
    int64_t s;
    full_pel_search(rp.quarter, qfh, qfw, ctx.border >> 2, src_q, qw, px >> 2,
                    py >> 2, qw, qh, r2, c2y, c2x, &dy2, &dx2, &s);
    full_pel_search(rp.half, hfh, hfw, ctx.border >> 1, src_h, hw, px >> 1,
                    py >> 1, hw, hh, 2, dy2 * 2, dx2 * 2, &dy1, &dx1, &s);
    full_pel_search(rp.full, rp.fh, rp.fw, ctx.border, src_blk,
                    ctx.src_stride, px, py, w, h, 2, dy1 * 2, dx1 * 2, dy,
                    dx, sad);
}

struct EvalOut {
    int64_t cost;
    int ref_id;
    int mode;        // 0 NEAREST / 1 NEAR / 2 ZERO / 3 NEW
    int mv[2];       // winning mv (q3)
    int nearest[2];
    int nearv[2];
    int mode_ctx;
    int valid;
};

static int64_t sse_of(const Ctx& ctx, const RefPlane& rp, int mi_row,
                      int mi_col, int w, int h, int mvr, int mvc) {
    const uint8_t* s = ctx.src + (int64_t)(mi_row * 8) * ctx.src_stride
                       + mi_col * 8;
    return mc_block_sse(rp.full, rp.fw, ctx.border, mi_row, mi_col, w, h,
                        mvr, mvc, ctx.g.mi_rows, ctx.g.mi_cols, s,
                        ctx.src_stride, ctx.filters);
}

static void eval_ref(const Ctx& ctx, int ref_id, const RefPlane& rp,
                     int extra_rate, int mi_row, int mi_col, int bsize,
                     EvalOut* out) {
    const int w = BW_PX[bsize], h = BH_PX[bsize];
    const int px = mi_col * 8, py = mi_row * 8;
    MvRefs refs;
    find_mv_refs(ctx, mi_row, mi_col, bsize, ref_id, &refs);
    int nearest[2], nearv[2];
    best_ref_mvs(refs, mi_row, mi_col, bsize, ctx.g.mi_rows, ctx.g.mi_cols,
                 nearest, nearv);
    out->ref_id = ref_id;
    out->mode_ctx = refs.mode_ctx;
    out->nearest[0] = nearest[0];
    out->nearest[1] = nearest[1];
    out->nearv[0] = nearv[0];
    out->nearv[1] = nearv[1];
    out->valid = 1;
    // predictor candidates (mode, mv, rate); restriction per stable count
    struct Cand { int mode, mvr, mvc, rate; };
    Cand cands[3];
    int ncand = 0;
    bool newmv_ok = true;
    if (ctx.restrict_flag && ctx.prev_ref0 == nullptr) {
        if (refs.stable == 0) {
            cands[ncand++] = {2, 0, 0, 1};
            newmv_ok = false;
        } else if (refs.stable == 1) {
            cands[ncand++] = {0, nearest[0], nearest[1], 2};
            cands[ncand++] = {2, 0, 0, 1};
        } else {
            cands[ncand++] = {0, nearest[0], nearest[1], 2};
            cands[ncand++] = {1, nearv[0], nearv[1], 3};
            cands[ncand++] = {2, 0, 0, 1};
        }
    } else {
        cands[ncand++] = {0, nearest[0], nearest[1], 2};
        cands[ncand++] = {1, nearv[0], nearv[1], 3};
        cands[ncand++] = {2, 0, 0, 1};
    }
    int64_t best_cost = INT64_MAX;
    int best_mode = 2, best_mvr = 0, best_mvc = 0;
    // c_sad caches by mv value in Python; recomputing yields identical
    // numbers, so no cache is needed for parity
    for (int i = 0; i < ncand; ++i) {
        int64_t sse = sse_of(ctx, rp, mi_row, mi_col, w, h, cands[i].mvr,
                             cands[i].mvc);
        int64_t cost = sse + (int64_t)(cands[i].rate + extra_rate) * ctx.lam;
        if (cost < best_cost) {
            best_cost = cost;
            best_mode = cands[i].mode;
            best_mvr = cands[i].mvr;
            best_mvc = cands[i].mvc;
        }
    }
    // lossless NEWMV skip (SAD >= 0 can't flip the decision)
    if (newmv_ok && best_cost > (int64_t)(10 + extra_rate) * ctx.lam) {
        int cy = clampi(nearest[0] >> 3, -64, 64);
        int cx = clampi(nearest[1] >> 3, -64, 64);
        int dy, dx;
        int64_t fsad;
        if (rp.range >= 32) {
            hme_search(ctx, rp, px, py, w, h, rp.range, cy, cx, &dy, &dx,
                       &fsad);
        } else {
            const uint8_t* sblk = ctx.src + (int64_t)py * ctx.src_stride + px;
            full_pel_search(rp.full, rp.fh, rp.fw, ctx.border, sblk,
                            ctx.src_stride, px, py, w, h, rp.range, cy, cx,
                            &dy, &dx, &fsad);
        }
        int new_mv[2] = {dy * 8, dx * 8};
        if (ctx.do_subpel) {
            // strided source view straight from the padded plane
            const uint8_t* s = ctx.src + (int64_t)py * ctx.src_stride + px;
            const uint8_t* base = rp.full
                + (int64_t)(ctx.border + py) * rp.fw + ctx.border + px;
            int32_t o[3];
            subpel_refine_rect(base, rp.fw, s, ctx.src_stride, w, h, dy * 8,
                               dx * 8, ctx.filters, o);
            new_mv[0] = o[0];
            new_mv[1] = o[1];
        }
        int64_t cost = sse_of(ctx, rp, mi_row, mi_col, w, h, new_mv[0],
                              new_mv[1])
                       + (int64_t)(10 + extra_rate) * ctx.lam;
        if (cost < best_cost) {
            best_cost = cost;
            best_mode = 3;
            best_mvr = new_mv[0];
            best_mvc = new_mv[1];
        }
    }
    out->cost = best_cost;
    out->mode = best_mode;
    out->mv[0] = best_mvr;
    out->mv[1] = best_mvc;
}

// compound_refs (vp9_pred_common.c:25)
static void compound_refs_of(const int32_t* sb, int* fixed_ref,
                             int* var0, int* var1) {
    if (sb[1] == sb[2]) {
        *fixed_ref = 3; *var0 = 1; *var1 = 2;
    } else if (sb[1] == sb[3]) {
        *fixed_ref = 2; *var0 = 1; *var1 = 3;
    } else {
        *fixed_ref = 1; *var0 = 2; *var1 = 3;
    }
}

static int64_t sse_avg_of(const Ctx& ctx, const RefPlane& a,
                          const RefPlane& b, int mi_row, int mi_col, int w,
                          int h, const int* mv0, const int* mv1) {
    const uint8_t* s = ctx.src + (int64_t)(mi_row * 8) * ctx.src_stride
                       + mi_col * 8;
    return mc_block_sse_avg(a.full, a.fw, b.full, b.fw, ctx.border, mi_row,
                            mi_col, w, h, mv0[0], mv0[1], mv1[0], mv1[1],
                            ctx.g.mi_rows, ctx.g.mi_cols, s, ctx.src_stride,
                            ctx.filters);
}

}  // namespace fastloop

extern "C" {

// out per leaf (stride 16 int32):
//   [0]=kind (0 intra / 1 single / 2 compound)
//   [1]=ref0 [2]=ref1 [3]=inter_mode [4]=mode_context
//   [5..6]=mv0 (r,c)  [7..8]=mv1
//   [9..10]=best_ref_mv (pair0 nearest)  [11..12]=best_ref_mv2
void fast_loop_decide(
    int mi_rows, int mi_cols, int tile_mi_start, int tile_mi_end, int border,
    int frame_w, int frame_h,
    const uint8_t* src, int64_t src_stride,
    const uint8_t* const* ref_ptrs,      // [9]: (full, half, quarter) x3
    const int32_t* ref_dims,             // [6]: (fh, fw) x3
    const int32_t* ranges,               // [3]; <=0 => ref absent
    int64_t lam, int do_subpel, int restrict_flag, const int32_t* sign_bias,
    const int8_t* prev_ref0, const int8_t* prev_ref1,
    const int32_t* prev_mv0, const int32_t* prev_mv1,
    uint8_t* f_inter, int8_t* f_ref0, int8_t* f_ref1, int8_t* f_mode,
    int32_t* f_mv0, int32_t* f_mv1,
    const int32_t* leaves, int n_leaves, const int16_t* filters,
    int32_t* out) {
    using namespace fastloop;
    Ctx ctx;
    ctx.g = {mi_rows, mi_cols, f_inter, f_ref0, f_ref1, f_mode, f_mv0, f_mv1};
    ctx.src = src;
    ctx.src_stride = src_stride;
    ctx.border = border;
    ctx.frame_w = frame_w;
    ctx.frame_h = frame_h;
    ctx.tile_mi_start = tile_mi_start;
    ctx.tile_mi_end = tile_mi_end;
    ctx.lam = lam;
    ctx.do_subpel = do_subpel;
    ctx.restrict_flag = restrict_flag;
    ctx.sign_bias = sign_bias;
    ctx.prev_ref0 = prev_ref0;
    ctx.prev_ref1 = prev_ref1;
    ctx.prev_mv0 = prev_mv0;
    ctx.prev_mv1 = prev_mv1;
    ctx.filters = filters;
    for (int r = 0; r < 3; ++r) {
        ctx.refs[r].full = ref_ptrs[r * 3];
        ctx.refs[r].half = ref_ptrs[r * 3 + 1];
        ctx.refs[r].quarter = ref_ptrs[r * 3 + 2];
        ctx.refs[r].fh = ref_dims[r * 2];
        ctx.refs[r].fw = ref_dims[r * 2 + 1];
        ctx.refs[r].range = ranges[r];
    }
    const bool has_comp = (sign_bias[1] != sign_bias[2]
                           || sign_bias[1] != sign_bias[3]
                           || sign_bias[2] != sign_bias[3]);

    for (int li = 0; li < n_leaves; ++li) {
        const int mi_row = leaves[li * 3];
        const int mi_col = leaves[li * 3 + 1];
        const int bsize = leaves[li * 3 + 2];
        const int w = BW_PX[bsize], h = BH_PX[bsize];
        const int px = mi_col * 8, py = mi_row * 8;

        EvalOut res[3];
        int nres = 0;
        EvalOut by_ref[4];
        for (int r = 0; r < 3; ++r) by_ref[r + 1].valid = 0;
        for (int r = 0; r < 3; ++r) {
            if (ctx.refs[r].full == nullptr || ctx.refs[r].range <= 0)
                continue;
            int extra = r == 0 ? 0 : 2;
            eval_ref(ctx, r + 1, ctx.refs[r], extra, mi_row, mi_col, bsize,
                     &res[nres]);
            by_ref[r + 1] = res[nres];
            ++nres;
        }
        // min over results: first minimal wins (LAST preferred on tie)
        int best_i = 0;
        for (int i = 1; i < nres; ++i)
            if (res[i].cost < res[best_i].cost) best_i = i;
        const EvalOut& best = res[best_i];

        // compound candidate (EbModeDecision.c bi-pred injection analogue)
        bool have_comp = false;
        int64_t comp_cost = INT64_MAX;
        int comp_mode = 0;
        int comp_mv[2][2] = {{0, 0}, {0, 0}};
        const EvalOut* pairA = nullptr;  // position 0 in ref_frame order
        const EvalOut* pairB = nullptr;
        if (has_comp && nres > 1) {
            int fixed_ref, var0, var1;
            compound_refs_of(sign_bias, &fixed_ref, &var0, &var1);
            const EvalOut& fx = by_ref[fixed_ref];
            if (fx.valid) {
                const int idx = sign_bias[fixed_ref];  // fx's pair slot
                const int vars[2] = {var0, var1};
                for (int vi = 0; vi < 2; ++vi) {
                    const EvalOut& vr = by_ref[vars[vi]];
                    if (!vr.valid) continue;
                    const EvalOut* p0 = idx == 0 ? &fx : &vr;
                    const EvalOut* p1 = idx == 0 ? &vr : &fx;
                    // cands: (mode, mv0, mv1, rate); dedup by
                    // (mode>=3, mv0, mv1)
                    struct CC { int mode; int m0[2]; int m1[2]; int rate; };
                    CC cc[4] = {
                        {0, {p0->nearest[0], p0->nearest[1]},
                            {p1->nearest[0], p1->nearest[1]}, 4},
                        {1, {p0->nearv[0], p0->nearv[1]},
                            {p1->nearv[0], p1->nearv[1]}, 5},
                        {2, {0, 0}, {0, 0}, 3},
                        {3, {p0->mv[0], p0->mv[1]},
                            {p1->mv[0], p1->mv[1]}, 22},
                    };
                    bool seen_used[4] = {false, false, false, false};
                    for (int k = 0; k < 4; ++k) {
                        bool dup = false;
                        for (int j = 0; j < k; ++j) {
                            if (!seen_used[j]) continue;
                            bool knew = cc[k].mode >= 3, jnew = cc[j].mode >= 3;
                            if (knew == jnew
                                && cc[k].m0[0] == cc[j].m0[0]
                                && cc[k].m0[1] == cc[j].m0[1]
                                && cc[k].m1[0] == cc[j].m1[0]
                                && cc[k].m1[1] == cc[j].m1[1]) {
                                dup = true;
                                break;
                            }
                        }
                        if (dup) continue;
                        seen_used[k] = true;
                        const RefPlane& rpa = ctx.refs[p0->ref_id - 1];
                        const RefPlane& rpb = ctx.refs[p1->ref_id - 1];
                        int64_t cost = sse_avg_of(ctx, rpa, rpb, mi_row,
                                                  mi_col, w, h, cc[k].m0,
                                                  cc[k].m1)
                                       + (int64_t)cc[k].rate * ctx.lam;
                        if (cost < best.cost
                            && (!have_comp || cost < comp_cost)) {
                            have_comp = true;
                            comp_cost = cost;
                            comp_mode = cc[k].mode;
                            comp_mv[0][0] = cc[k].m0[0];
                            comp_mv[0][1] = cc[k].m0[1];
                            comp_mv[1][0] = cc[k].m1[0];
                            comp_mv[1][1] = cc[k].m1[1];
                            pairA = p0;
                            pairB = p1;
                        }
                    }
                }
            }
        }

        // open-loop intra DC fallback (source-based references)
        const int n = w < h ? (w < 32 ? w : 32) : (h < 32 ? h : 32);
        const bool ha = py > 0, hl = px > tile_mi_start * 8;
        int64_t sum_a = 0, sum_l = 0;
        if (ha) {
            const uint8_t* arow = src + (int64_t)(py - 1) * src_stride;
            int n_avail = frame_w - px;
            if (n_avail > n) n_avail = n;
            if (n_avail < 0) n_avail = 0;
            if (n_avail) {
                for (int x = 0; x < n_avail; ++x) sum_a += arow[px + x];
                sum_a += (int64_t)(n - n_avail) * arow[px + n_avail - 1];
            } else {
                sum_a = (int64_t)n * arow[frame_w - 1];
            }
        }
        if (hl) {
            int n_avail = frame_h - py;
            if (n_avail > n) n_avail = n;
            if (n_avail < 0) n_avail = 0;
            if (n_avail) {
                for (int y = 0; y < n_avail; ++y)
                    sum_l += src[(int64_t)(py + y) * src_stride + px - 1];
                sum_l += (int64_t)(n - n_avail)
                         * src[(int64_t)(py + n_avail - 1) * src_stride
                               + px - 1];
            } else {
                sum_l = (int64_t)n * src[(int64_t)(frame_h - 1) * src_stride
                                         + px - 1];
            }
        }
        int log2n = 0;
        while ((1 << log2n) < n) ++log2n;
        int dc;
        if (ha && hl) dc = (int)((sum_a + sum_l + n) >> (log2n + 1));
        else if (ha) dc = (int)((sum_a + (n >> 1)) >> log2n);
        else if (hl) dc = (int)((sum_l + (n >> 1)) >> log2n);
        else dc = 128;
        int64_t intra_sse = 0;
        for (int y = 0; y < n; ++y) {
            const uint8_t* s = src + (int64_t)(py + y) * src_stride + px;
            for (int x = 0; x < n; ++x) {
                int d = (int)s[x] - dc;
                intra_sse += (int64_t)d * d;
            }
        }
        const int64_t intra_cost = intra_sse + 15 * ctx.lam;
        const int64_t inter_best = have_comp ? comp_cost : best.cost;

        int32_t* o = out + li * 16;
        const int bw_mi = w >= 8 ? w / 8 : 1;
        const int bh_mi = h >= 8 ? h / 8 : 1;
        const int r1 = mi_row + bh_mi < mi_rows ? mi_row + bh_mi : mi_rows;
        const int c1 = mi_col + bw_mi < mi_cols ? mi_col + bw_mi : mi_cols;
        auto fill_grid = [&](int inter, int rf0, int rf1, int mode, int m0r,
                             int m0c, int m1r, int m1c) {
            for (int rr = mi_row; rr < r1; ++rr) {
                for (int cc2 = mi_col; cc2 < c1; ++cc2) {
                    int64_t cell = (int64_t)rr * mi_cols + cc2;
                    f_inter[cell] = (uint8_t)inter;
                    f_ref0[cell] = (int8_t)rf0;
                    f_ref1[cell] = (int8_t)rf1;
                    f_mode[cell] = (int8_t)mode;
                    f_mv0[cell * 2] = m0r;
                    f_mv0[cell * 2 + 1] = m0c;
                    f_mv1[cell * 2] = m1r;
                    f_mv1[cell * 2 + 1] = m1c;
                }
            }
        };
        if (intra_cost < inter_best) {
            o[0] = 0;
            for (int k = 1; k < 16; ++k) o[k] = 0;
            fill_grid(0, 0, -1, 0, 0, 0, 0, 0);
        } else if (have_comp) {
            o[0] = 2;
            o[1] = pairA->ref_id;
            o[2] = pairB->ref_id;
            o[3] = comp_mode;
            o[4] = pairA->mode_ctx;
            o[5] = comp_mv[0][0];
            o[6] = comp_mv[0][1];
            o[7] = comp_mv[1][0];
            o[8] = comp_mv[1][1];
            o[9] = pairA->nearest[0];
            o[10] = pairA->nearest[1];
            o[11] = pairB->nearest[0];
            o[12] = pairB->nearest[1];
            o[13] = o[14] = o[15] = 0;
            fill_grid(1, pairA->ref_id, pairB->ref_id, 10 + comp_mode,
                      comp_mv[0][0], comp_mv[0][1], comp_mv[1][0],
                      comp_mv[1][1]);
        } else {
            o[0] = 1;
            o[1] = best.ref_id;
            o[2] = -1;
            o[3] = best.mode;
            o[4] = best.mode_ctx;
            o[5] = best.mv[0];
            o[6] = best.mv[1];
            o[7] = o[8] = 0;
            o[9] = best.nearest[0];
            o[10] = best.nearest[1];
            o[11] = o[12] = 0;
            o[13] = o[14] = o[15] = 0;
            fill_grid(1, best.ref_id, -1, 10 + best.mode, best.mv[0],
                      best.mv[1], 0, 0);
        }
    }
}

}  // extern "C"

// ===========================================================================
// Batched winner MC: produce the chosen predictions (Y/U/V, single or
// compound-averaged) for every inter leaf in one call.  Mirrors
// tpu_vp9.ops.inter.predict_inter_block (clamp_mv_to_umv_border with the
// ss=1 chroma scale, two-stage 8-tap convolve) and predict_inter_planes'
// spec-rounded compound average.
// ===========================================================================

namespace fastloop {

static void mc_predict_plane(const uint8_t* padded, int64_t stride,
                             int border, int mi_row, int mi_col, int bw,
                             int bh, int ss, int mv_row_q3, int mv_col_q3,
                             int mi_rows, int mi_cols,
                             const int16_t* filters, uint8_t* out) {
    const int spel_left = (4 + bw) << 4;
    const int spel_right = spel_left - 16;
    const int spel_top = (4 + bh) << 4;
    const int spel_bottom = spel_top - 16;
    const int scale = 1 << (1 - ss);
    int row = mv_row_q3 * scale, col = mv_col_q3 * scale;
    const int mb_to_left = -((mi_col * 8) * 8);
    const int mb_to_right = ((mi_cols - ((bw << ss) / 8) - mi_col) * 8) * 8;
    const int mb_to_top = -((mi_row * 8) * 8);
    const int mb_to_bottom = ((mi_rows - ((bh << ss) / 8) - mi_row) * 8) * 8;
    col = clamp_i(col, mb_to_left * scale - spel_left,
                  mb_to_right * scale + spel_right);
    row = clamp_i(row, mb_to_top * scale - spel_top,
                  mb_to_bottom * scale + spel_bottom);
    const int px = (mi_col * 8) >> ss, py = (mi_row * 8) >> ss;
    const int x_q4 = (px << 4) + col, y_q4 = (py << 4) + row;
    const int x0 = x_q4 >> 4, y0 = y_q4 >> 4;
    const int sx = x_q4 & 15, sy = y_q4 & 15;
    const uint8_t* base = padded + (int64_t)(border + y0) * stride
                          + border + x0;
    if (sx == 0 && sy == 0) {
        for (int y = 0; y < bh; ++y)
            for (int x = 0; x < bw; ++x)
                out[y * bw + x] = base[(int64_t)y * stride + x];
        return;
    }
    const int16_t* fx = filters + sx * 8;
    const int16_t* fy = filters + sy * 8;
    int inter[71 * 64];
    const uint8_t* win = base - 3 * stride - 3;
    for (int y = 0; y < bh + 7; ++y) {
        const uint8_t* rowp = win + (int64_t)y * stride;
        for (int x = 0; x < bw; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += rowp[x + k] * fx[k];
            inter[y * 64 + x] = clamp_i((sum + 64) >> 7, 0, 255);
        }
    }
    for (int y = 0; y < bh; ++y) {
        for (int x = 0; x < bw; ++x) {
            int sum = 0;
            for (int k = 0; k < 8; ++k) sum += inter[(y + k) * 64 + x] * fy[k];
            out[y * bw + x] = (uint8_t)clamp_i((sum + 64) >> 7, 0, 255);
        }
    }
}

}  // namespace fastloop

extern "C" {

// jobs: per leaf 9 int32 (mi_row, mi_col, bsize, ref0, ref1, mv0r, mv0c,
// mv1r, mv1c); ref1 <= 0 => single reference.  ref_planes: [ref][plane]
// pointers laid out flat (LAST y,u,v, GOLDEN y,u,v, ALTREF y,u,v); absent
// refs null.  strides likewise.  out: packed per-job y|u|v blocks at
// out + offsets[i].
void mc_predict_winners(const uint8_t* const* ref_planes,
                        const int64_t* strides, int border, int mi_rows,
                        int mi_cols, const int32_t* jobs, int n,
                        const int16_t* filters, uint8_t* out,
                        const int64_t* offsets) {
    using namespace fastloop;
    uint8_t tmp[64 * 64];
    for (int i = 0; i < n; ++i) {
        const int32_t* j = jobs + i * 9;
        const int mi_row = j[0], mi_col = j[1], bsize = j[2];
        const int r0 = j[3] - 1, r1 = j[4] - 1;
        const int w = BW_PX[bsize], h = BH_PX[bsize];
        uint8_t* dst = out + offsets[i];
        for (int p = 0; p < 3; ++p) {
            const int ss = p == 0 ? 0 : 1;
            const int bw = w >> ss, bh = h >> ss;
            mc_predict_plane(ref_planes[r0 * 3 + p], strides[r0 * 3 + p],
                             border, mi_row, mi_col, bw, bh, ss, j[5], j[6],
                             mi_rows, mi_cols, filters, dst);
            if (r1 >= 0) {
                mc_predict_plane(ref_planes[r1 * 3 + p],
                                 strides[r1 * 3 + p], border, mi_row,
                                 mi_col, bw, bh, ss, j[7], j[8], mi_rows,
                                 mi_cols, filters, tmp);
                for (int k = 0; k < bw * bh; ++k)
                    dst[k] = (uint8_t)(((int)dst[k] + (int)tmp[k] + 1) >> 1);
            }
            dst += bw * bh;
        }
    }
}

}  // extern "C"

// ===========================================================================
// Trellis coefficient optimization (the reference's vp9_optimize_b role,
// EbEncDecProcess.c:426/471/517): backward dynamic program over the scan
// order choosing, per coefficient, the quantized level or level-1, and the
// cheapest EOB truncation point, under the exact token-cost model of
// coeff_token_cost.  Two DP states track the VP9 skip-EOB rule (no EOB
// symbol immediately after a ZERO token).  Contexts use the original
// token cache (the same approximation libvpx makes).
// ===========================================================================

extern "C" {

// levels2d: in/out quantized levels (row-major n x n).  coeffs2d: float
// transform coefficients (pre-quant).  lam: lambda premultiplied by the
// transform gain / 256 so cost = coeff_err^2 + lam * rate_256.
// q_shift: 1 for TX32 (dequant = (l*q) >> 1), else 0.  Returns new eob.
int optimize_coeffs(int32_t* levels2d, const float* coeffs2d, int tx_size,
                    int tx_type, const uint8_t* probs_full, int ctx0,
                    double lam, int q_dc, int q_ac, int q_shift) {
    init_prob_cost();
    const TxTables& t = g_tx[tx_size][tx_type];
    const int n2 = t.n2;
    int32_t lv[1024];
    float cf[1024];
    for (int i = 0; i < n2; ++i) {
        lv[i] = levels2d[t.scan[i]];
        cf[i] = coeffs2d[t.scan[i]];
    }
    int eob = 0;
    for (int i = n2 - 1; i >= 0; --i)
        if (lv[i]) { eob = i + 1; break; }
    if (eob == 0) return 0;

    // per-position contexts from the ORIGINAL levels
    int32_t cache[1024];
    std::memset(cache, 0, sizeof(int32_t) * n2);
    int pt[1025];
    for (int c = 0; c <= eob && c < n2; ++c) {
        pt[c] = (c == 0)
            ? ctx0
            : (1 + cache[t.nbrs[2 * c]] + cache[t.nbrs[2 * c + 1]]) >> 1;
        if (c < eob) {
            int mag = lv[c] < 0 ? -lv[c] : lv[c];
            cache[t.scan[c]] = mag ? g_energy[token_from_mag(mag)] : 0;
        }
    }

    auto tok_rate = [&](int mag, const uint8_t* p) -> int {
        // nonzero-token rate: not-zero bit, one-vs-more, tree, extras, sign
        int r = bit_cost(1, p[1]);
        if (mag == 1) {
            r += bit_cost(0, p[2]);
        } else {
            r += bit_cost(1, p[2]);
            int tokv = token_from_mag(mag);
            const Path& path = g_con_paths[tokv];
            for (int k = 0; k < path.len; ++k)
                r += bit_cost(path.bit[k], p[3 + path.idx[k]]);
            if (tokv >= 5) {
                int cat = tokv - 5;
                int extra = mag - g_cat_base[cat];
                int nbits = g_cat_bits[cat];
                for (int k = 0; k < nbits; ++k)
                    r += bit_cost((extra >> (nbits - 1 - k)) & 1,
                                  g_cat_probs[cat][k]);
            }
        }
        return r + 256;  // sign at prob 128
    };
    auto deq = [&](int mag, int c) -> double {
        int64_t v = (int64_t)mag * (c == 0 ? q_dc : q_ac);
        return (double)(v >> q_shift);
    };

    // suffix distortion of zeroing positions c..eob-1 (END option)
    static thread_local std::vector<double> sufd_v, f0_v, f1_v;
    static thread_local std::vector<int8_t> ch0_v, ch1_v;
    sufd_v.assign(eob + 1, 0.0);
    for (int c = eob - 1; c >= 0; --c)
        sufd_v[c] = sufd_v[c + 1] + (double)cf[c] * cf[c];
    // f[s][c]: min cost of positions c.. given skip state s
    // choice codes: 0 = keep x, 1 = x-1, 2 = END (zero the tail)
    f0_v.assign(eob + 1, 0.0);
    f1_v.assign(eob + 1, 0.0);
    ch0_v.assign(eob + 1, 0);
    ch1_v.assign(eob + 1, 0);
    const double INF = 1e300;
    if (eob < n2) {
        const uint8_t* p = probs_full + (t.band[eob] * 6 + pt[eob]) * 11;
        f0_v[eob] = lam * bit_cost(0, p[0]);
        f1_v[eob] = 0.0;
    }
    for (int c = eob - 1; c >= 0; --c) {
        const uint8_t* p = probs_full + (t.band[c] * 6 + pt[c]) * 11;
        const double eobbit = lam * bit_cost(1, p[0]);  // "not eob" in S0
        const int x = lv[c] < 0 ? -lv[c] : lv[c];
        const double cfa = cf[c] < 0 ? -cf[c] : cf[c];
        double best0 = INF, best1 = INF;
        int bc0 = 0, bc1 = 0;
        for (int k = 0; k < 2; ++k) {
            int m = k == 0 ? x : x - 1;
            if (m < 0 || (k == 1 && x == 0)) continue;
            double e = cfa - deq(m, c);
            double dist = e * e;
            double cost;
            if (m == 0) {
                cost = dist + lam * bit_cost(0, p[1]) + f1_v[c + 1];
            } else {
                cost = dist + lam * tok_rate(m, p) + f0_v[c + 1];
            }
            if (cost + eobbit < best0) { best0 = cost + eobbit; bc0 = k; }
            if (cost < best1) { best1 = cost; bc1 = k; }
        }
        // END: eob symbol here (S0 only), tail zeroed
        double cend = lam * bit_cost(0, p[0]) + sufd_v[c];
        if (cend < best0) { best0 = cend; bc0 = 2; }
        f0_v[c] = best0;
        ch0_v[c] = (int8_t)bc0;
        f1_v[c] = best1;
        ch1_v[c] = (int8_t)bc1;
    }

    // forward reconstruction of the chosen path (position 0 is S0)
    int s = 0;
    for (int c = 0; c < eob; ++c) {
        int choice = s == 0 ? ch0_v[c] : ch1_v[c];
        if (choice == 2) {  // END (only reachable in S0)
            for (int k = c; k < eob; ++k) lv[k] = 0;
            break;
        }
        int x = lv[c] < 0 ? -lv[c] : lv[c];
        int m = choice == 0 ? x : x - 1;
        lv[c] = cf[c] < 0 ? -m : m;
        s = m ? 0 : 1;
    }
    int new_eob = 0;
    for (int i = eob - 1; i >= 0; --i)
        if (lv[i]) { new_eob = i + 1; break; }
    for (int i = 0; i < n2; ++i) levels2d[t.scan[i]] = lv[i];
    return new_eob;
}

// Batched variant over nb blocks (shared probs/lambda, per-block ctx0).
void optimize_coeffs_batch(int32_t* levels, const float* coeffs, int nb,
                           int n, int tx_size, int tx_type,
                           const uint8_t* probs_full, const int32_t* ctx0,
                           double lam, int q_dc, int q_ac, int q_shift,
                           int32_t* eobs) {
    for (int i = 0; i < nb; ++i)
        eobs[i] = optimize_coeffs(levels + (int64_t)i * n * n,
                                  coeffs + (int64_t)i * n * n, tx_size,
                                  tx_type, probs_full, ctx0[i], lam, q_dc,
                                  q_ac, q_shift);
}

}  // extern "C"

// ===========================================================================
// Native realtime-path P-frame serializer.
//
// The device EncDec step returns per-block MVs/refs/levels; turning them
// into a bitstream previously cost ~0.4-1.2 s/frame of Python at 1080p
// (mv-ref classification, mode syntax, token contexts) — the host-side
// wall of the flagship path.  This writes the WHOLE tile natively for the
// RT feature set (single tile, all-inter, uniform 32 grid + optional
// split16 mask + optional 16-strip, LAST/GOLDEN single-ref, implied tx,
// NEAREST/NEAR/ZERO/NEW), fusing the normative classification
// (fastloop::find_mv_refs) with serialization, and accumulates every
// symbol count the backward adaptation needs.
// Byte-identical to the Python serializer (tests/test_native_rt_ser.py).
// ===========================================================================

namespace rtser {

static FILE* g_trace = nullptr;
static inline void pb(BoolEnc* e, int bit, int prob) {
    if (g_trace) fprintf(g_trace, "%d %d\n", bit, prob);
    put_bit(e, bit, prob);
}

using fastloop::MiGrid;
using fastloop::MvRefs;
using fastloop::best_ref_mvs;
using fastloop::find_mv_refs;

// trees (spec constants; leaves are <= 0 with token = -entry)
static const int PARTITION_TREE[6] = {0, 2, -1, 4, -2, -3};
static const int INTER_MODE_TREE[6] = {-2, 2, 0, 4, -1, -3};
static const int MV_JOINT_TREE[6] = {0, 2, -1, 4, -2, -3};
static const int MV_CLASS_TREE[20] = {0, 2,  -1, 4,  6,  8,  -2, -3, 10, 12,
                                      -4, -5, -6, 14, 16, 18, -7, -8, -9, -10};
static const int MV_FP_TREE[6] = {0, 2, -1, 4, -2, -3};

static bool tree_contains(const int* tree, int i, int token) {
    for (int bit = 0; bit < 2; ++bit) {
        int node = tree[i + bit];
        if (node <= 0) {
            if (-node == token) return true;
        } else if (tree_contains(tree, node, token)) {
            return true;
        }
    }
    return false;
}

static void write_tree(BoolEnc* e, const int* tree, const uint8_t* probs,
                       int token) {
    // walk from the root following the branch whose subtree holds token
    // (mirrors tables.write_token's precomputed paths)
    int i = 0;
    while (true) {
        int b = 1;
        int n0 = tree[i];
        if (n0 <= 0 ? -n0 == token : tree_contains(tree, n0, token)) b = 0;
        pb(e, b, probs[i >> 1]);
        int node = tree[i + b];
        if (node <= 0) return;
        i = node;
    }
}

struct MvCounts {
    int64_t* joints;     // (4,)
    int64_t* sign;       // (2,2)
    int64_t* classes;    // (2,11)
    int64_t* class0;     // (2,2)
    int64_t* bits;       // (2,10,2)
    int64_t* class0_fp;  // (2,2,4)
    int64_t* fp;         // (2,4)
};

struct NmvProbs {
    const uint8_t* joints;  // (3,)
    // per component: sign(1) classes(10) class0(1) bits(10)
    // class0_fp(2*3) fp(3) class0_hp(1) hp(1)
    const uint8_t* comp[2];
};

static void write_mv_component(BoolEnc* e, int comp_v, const uint8_t* c,
                               MvCounts* mc, int ci) {
    const uint8_t* sign_p = c;
    const uint8_t* classes_p = c + 1;
    const uint8_t* class0_p = c + 11;
    const uint8_t* bits_p = c + 12;
    const uint8_t* class0_fp_p = c + 22;  // 2*3
    const uint8_t* fp_p = c + 28;
    int sign = comp_v < 0 ? 1 : 0;
    int mag = sign ? -comp_v : comp_v;
    int z = mag - 1;
    int cls = 0;
    if (z >= 2 * 4096) {
        cls = 10;
    } else {
        int n = z >> 3;  // bit_length(n) - 1, 0 for n == 0
        while ((n >> (cls + 1)) != 0) ++cls;
    }
    int base = cls == 0 ? 0 : (2 << (cls + 2));
    int offset = z - base;
    int d = offset >> 3;
    int fr = (offset >> 1) & 3;
    pb(e, sign, sign_p[0]);
    write_tree(e, MV_CLASS_TREE, classes_p, cls);
    if (cls == 0) {
        pb(e, d, class0_p[0]);
    } else {
        int n = cls;
        for (int i = 0; i < n; ++i) pb(e, (d >> i) & 1, bits_p[i]);
    }
    const uint8_t* fp_probs = cls == 0 ? class0_fp_p + d * 3 : fp_p;
    write_tree(e, MV_FP_TREE, fp_probs, fr);
    // no hp bit (allow_hp off)
    if (mc) {
        mc->sign[ci * 2 + sign] += 1;
        mc->classes[ci * 11 + cls] += 1;
        if (cls == 0) {
            mc->class0[ci * 2 + d] += 1;
            mc->class0_fp[(ci * 2 + d) * 4 + fr] += 1;
        } else {
            for (int b = 0; b < cls; ++b)
                mc->bits[(ci * 10 + b) * 2 + ((d >> b) & 1)] += 1;
            mc->fp[ci * 4 + fr] += 1;
        }
    }
}

static void write_mv(BoolEnc* e, int mvr, int mvc, int refr, int refc,
                     const NmvProbs& nm, MvCounts* mc) {
    int dr = mvr - refr, dc = mvc - refc;
    int joint = (dc ? 1 : 0) | (dr ? 2 : 0);
    write_tree(e, MV_JOINT_TREE, nm.joints, joint);
    if (mc) mc->joints[joint] += 1;
    if (dr) write_mv_component(e, dr, nm.comp[0], mc, 0);
    if (dc) write_mv_component(e, dc, nm.comp[1], mc, 1);
}

// PARTITION_CTX_LOOKUP for the subsizes this path writes
static inline int part_ctx_mask(int bsize_px) {
    switch (bsize_px) {
        case 64: return 0;
        case 32: return 8;
        case 16: return 12;
        default: return 14;  // 8
    }
}
static inline int mi_width_log2(int bsize_px) {
    switch (bsize_px) {
        case 64: return 3;
        case 32: return 2;
        case 16: return 1;
        default: return 0;
    }
}

struct Ser {
    BoolEnc* e;
    MiGrid g;
    uint8_t* f_skip;
    int tile_start, tile_end;
    // probs
    const uint8_t* partition_probs;   // (16,3)
    const uint8_t* skip_probs;        // (3,)
    const uint8_t* intra_inter_probs; // (4,)
    const uint8_t* single_ref_probs;  // (5,2)
    const uint8_t* inter_mode_probs;  // (7,3)
    NmvProbs nmv;
    const uint8_t* coef_probs_y;      // (6,6,11) for y tx
    const uint8_t* coef_probs_uv;
    // counts (nullable)
    int64_t* cnt_partition;   // (16,4)
    int64_t* cnt_skip;        // (3,2)
    int64_t* cnt_intra_inter; // (4,2)
    int64_t* cnt_single_ref;  // (5,2,2)
    int64_t* cnt_inter_mode;  // (7,4)
    MvCounts mv_counts;
    bool have_mv_counts;
    int64_t* cnt_coef_y;      // (6,6,12)
    int64_t* cnt_eob_y;       // (6,6)
    int64_t* cnt_coef_uv;
    int64_t* cnt_eob_uv;
    // partition ctx bitmasks
    std::vector<int32_t> pabove, pleft;
    // plane token contexts (per 4px)
    std::vector<int8_t> tok_above[3], tok_left[3];
    // prev-frame mvs
    const int8_t* prev_ref0;
    const int8_t* prev_ref1;
    const int32_t* prev_mv0;
    const int32_t* prev_mv1;
};

static inline int part_ctx(Ser& s, int mi_row, int mi_col, int bsize_px) {
    int bsl = mi_width_log2(bsize_px);
    int a = (s.pabove[mi_col] >> bsl) & 1;
    int l = (s.pleft[mi_row] >> bsl) & 1;
    return (l * 2 + a) + bsl * 4;
}

static void part_update(Ser& s, int mi_row, int mi_col, int sub_px,
                        int bsize_px) {
    int bw = 1 << mi_width_log2(bsize_px);
    int m = part_ctx_mask(sub_px);
    for (int i = 0; i < bw; ++i) {
        s.pabove[mi_col + i] = m;
        s.pleft[mi_row + i] = m;
    }
}

static void write_partition(Ser& s, int mi_row, int mi_col, int bsize_px,
                            int part, bool has_rows, bool has_cols) {
    int ctx = part_ctx(s, mi_row, mi_col, bsize_px);
    const uint8_t* p = s.partition_probs + ctx * 3;
    if (has_rows && has_cols) {
        write_tree(s.e, PARTITION_TREE, p, part);
    } else if (has_cols) {
        pb(s.e, part == 3 ? 1 : 0, p[1]);
    } else if (has_rows) {
        pb(s.e, part == 3 ? 1 : 0, p[2]);
    }
    if (s.cnt_partition) s.cnt_partition[ctx * 4 + part] += 1;
}

static inline int skip_ctx_of(Ser& s, int mi_row, int mi_col) {
    int c = 0;
    if (mi_row > 0) c += s.f_skip[(int64_t)(mi_row - 1) * s.g.mi_cols + mi_col];
    if (mi_col > s.tile_start)
        c += s.f_skip[(int64_t)mi_row * s.g.mi_cols + mi_col - 1];
    return c;
}

static inline int intra_inter_ctx_of(Ser& s, int mi_row, int mi_col) {
    bool ha = mi_row > 0, hl = mi_col > s.tile_start;
    const MiGrid& g = s.g;
    if (ha && hl) {
        bool ai = !g.inter[(int64_t)(mi_row - 1) * g.mi_cols + mi_col];
        bool li = !g.inter[(int64_t)mi_row * g.mi_cols + mi_col - 1];
        return (ai && li) ? 3 : (int)(ai || li);
    }
    if (ha || hl) {
        int64_t cell = ha ? (int64_t)(mi_row - 1) * g.mi_cols + mi_col
                          : (int64_t)mi_row * g.mi_cols + mi_col - 1;
        return 2 * (int)(!g.inter[cell]);
    }
    return 0;
}

// single_ref_p1/p2 contexts (vp9_pred_common.c:158/224), no-compound grid
struct NInfo { bool present, is_inter; int ref0, ref1; };

static NInfo ninfo(Ser& s, int mi_row, int mi_col, bool above) {
    NInfo n{false, false, 0, -1};
    int r = above ? mi_row - 1 : mi_row;
    int c = above ? mi_col : mi_col - 1;
    if (r < 0 || (!above && c < s.tile_start)) return n;
    int64_t cell = (int64_t)r * s.g.mi_cols + c;
    n.present = true;
    n.is_inter = s.g.inter[cell];
    n.ref0 = s.g.ref0[cell];
    n.ref1 = s.g.ref1[cell];
    return n;
}

static inline bool has2(const NInfo& n) { return n.is_inter && n.ref1 > 0; }

static int single_ref_p1_ctx_of(Ser& s, int mi_row, int mi_col) {
    const int LAST = 1;
    NInfo a = ninfo(s, mi_row, mi_col, true);
    NInfo l = ninfo(s, mi_row, mi_col, false);
    if (a.present && l.present) {
        bool ai = !a.is_inter, li = !l.is_inter;
        if (ai && li) return 2;
        if (ai || li) {
            const NInfo& edge = ai ? l : a;
            if (!has2(edge)) return 4 * (edge.ref0 == LAST);
            return 1 + (edge.ref0 == LAST || edge.ref1 == LAST);
        }
        bool a2 = has2(a), l2 = has2(l);
        if (a2 && l2)
            return 1 + (a.ref0 == LAST || a.ref1 == LAST ||
                        l.ref0 == LAST || l.ref1 == LAST);
        if (a2 || l2) {
            int rfs = !a2 ? a.ref0 : l.ref0;
            int crf1 = a2 ? a.ref0 : l.ref0;
            int crf2 = a2 ? a.ref1 : l.ref1;
            if (rfs == LAST) return 3 + (crf1 == LAST || crf2 == LAST);
            return (int)(crf1 == LAST || crf2 == LAST);
        }
        return 2 * (a.ref0 == LAST) + 2 * (l.ref0 == LAST);
    }
    if (a.present || l.present) {
        const NInfo& edge = a.present ? a : l;
        if (!edge.is_inter) return 2;
        if (!has2(edge)) return 4 * (edge.ref0 == LAST);
        return 1 + (edge.ref0 == LAST || edge.ref1 == LAST);
    }
    return 2;
}

static int single_ref_p2_ctx_of(Ser& s, int mi_row, int mi_col) {
    const int LAST = 1, GOLDEN = 2, ALT = 3;
    NInfo a = ninfo(s, mi_row, mi_col, true);
    NInfo l = ninfo(s, mi_row, mi_col, false);
    if (a.present && l.present) {
        bool ai = !a.is_inter, li = !l.is_inter;
        if (ai && li) return 2;
        if (ai || li) {
            const NInfo& edge = ai ? l : a;
            if (!has2(edge)) {
                if (edge.ref0 == LAST) return 3;
                return 4 * (edge.ref0 == GOLDEN);
            }
            return 1 + 2 * (edge.ref0 == GOLDEN || edge.ref1 == GOLDEN);
        }
        bool a2 = has2(a), l2 = has2(l);
        if (a2 && l2) {
            if (a.ref0 == l.ref0 && a.ref1 == l.ref1)
                return 3 * (a.ref0 == GOLDEN || a.ref1 == GOLDEN ||
                            l.ref0 == GOLDEN || l.ref1 == GOLDEN);
            return 2;
        }
        if (a2 || l2) {
            int rfs = !a2 ? a.ref0 : l.ref0;
            int crf1 = a2 ? a.ref0 : l.ref0;
            int crf2 = a2 ? a.ref1 : l.ref1;
            if (rfs == GOLDEN) return 3 + (crf1 == GOLDEN || crf2 == GOLDEN);
            if (rfs == ALT) return (int)(crf1 == GOLDEN || crf2 == GOLDEN);
            return 1 + 2 * (crf1 == GOLDEN || crf2 == GOLDEN);
        }
        if (a.ref0 == LAST && l.ref0 == LAST) return 3;
        if (a.ref0 == LAST || l.ref0 == LAST) {
            int edge0 = a.ref0 == LAST ? l.ref0 : a.ref0;
            return 4 * (edge0 == GOLDEN);
        }
        return 2 * (a.ref0 == GOLDEN) + 2 * (l.ref0 == GOLDEN);
    }
    if (a.present || l.present) {
        const NInfo& edge = a.present ? a : l;
        if (!edge.is_inter || (edge.ref0 == LAST && !has2(edge))) return 2;
        if (!has2(edge)) return 4 * (edge.ref0 == GOLDEN);
        return 3 * (edge.ref0 == GOLDEN || edge.ref1 == GOLDEN);
    }
    return 2;
}

// plane token context helpers
static inline int tok_get_ctx(Ser& s, int plane, int x4, int y4, int txs) {
    int n4 = 1 << txs;
    int a = 0, l = 0;
    for (int i = 0; i < n4; ++i) {
        a |= s.tok_above[plane][x4 + i];
        l |= s.tok_left[plane][y4 + i];
    }
    return a + l;
}

static inline void tok_set_ctx(Ser& s, int plane, int x4, int y4, int txs,
                               bool has_eob, int max_x4, int max_y4) {
    int n4 = 1 << txs;
    int va = has_eob ? std::min(n4, std::max(0, max_x4 - x4)) : 0;
    int vl = has_eob ? std::min(n4, std::max(0, max_y4 - y4)) : 0;
    for (int i = 0; i < n4; ++i) {
        s.tok_above[plane][x4 + i] = i < va ? 1 : 0;
        s.tok_left[plane][y4 + i] = i < vl ? 1 : 0;
    }
}

}  // namespace rtser

extern "C" {

// Serialize one RT P-frame tile natively; returns tile size (bytes
// written into out, capacity out_cap) or -1 on overflow.
//
// Zones (device outputs, raster order within each zone):
//   m32: B32 = rows32*cols32 blocks; when split32 != NULL, blocks with
//        split32[b] == 1 are replaced by their four m16f children
//        (full 16-grid raster, B16 = rows32*2 * cols32*2).
//   strip: when strip16 != 0, one extra row of 16-blocks (cols16).
// Per-zone arrays: mv (B,2 int32 q3), ref (B int8: 1=LAST 2=GOLDEN),
// skip (B u8), lv_y/lv_u/lv_v (int16 blocks), eob_* unused (recomputed
// by the coeff writer).
// fc probs/counters as documented in rtser::Ser.
// Grid field arrays are OUTPUTS (caller allocates zeroed); they carry
// the motion field for the next frame's temporal candidates.
// out_modes: per-leaf (decode order) [mode, mode_ctx, nearest_r,
// nearest_c] int32 rows for the host (n_leaves_cap rows).
int64_t rt_serialize(
    int mi_rows, int mi_cols, int rows32, int cols32, int strip16,
    const int32_t* split32,
    // scan-prefix lengths per tx (0 = full 2-D level planes): the
    // level pointers then hold (B, K) int16 scan-ordered prefixes
    int k32, int k16, int kuv16, int kuv8,
    // m32 zone
    const int32_t* mv32, const int8_t* ref32, const uint8_t* skip32,
    const int16_t* lv32_y, const int16_t* lv32_u, const int16_t* lv32_v,
    // m16f zone (nullable)
    const int32_t* mv16, const int8_t* ref16, const uint8_t* skip16,
    const int16_t* lv16_y, const int16_t* lv16_u, const int16_t* lv16_v,
    // strip zone (nullable)
    const int32_t* mvs16, const int8_t* refs16, const uint8_t* skips16,
    const int16_t* lvs_y, const int16_t* lvs_u, const int16_t* lvs_v,
    // prev-frame motion field (nullable)
    const int8_t* prev_ref0, const int8_t* prev_ref1,
    const int32_t* prev_mv0, const int32_t* prev_mv1,
    // per-RefFrame sign biases [4] (entry 0 unused; future ALTREF = 1)
    const int32_t* sign_bias,
    // probabilities
    const uint8_t* partition_probs, const uint8_t* skip_probs,
    const uint8_t* intra_inter_probs, const uint8_t* single_ref_probs,
    const uint8_t* inter_mode_probs, const uint8_t* nmv_joints,
    const uint8_t* nmv_comp0, const uint8_t* nmv_comp1,
    const uint8_t* coef_y32, const uint8_t* coef_uv16,
    const uint8_t* coef_y16, const uint8_t* coef_uv8,
    // counts (all nullable as a group: pass counts_on = 0)
    int counts_on,
    int64_t* cnt_partition, int64_t* cnt_skip, int64_t* cnt_intra_inter,
    int64_t* cnt_single_ref, int64_t* cnt_inter_mode,
    int64_t* mvc_joints, int64_t* mvc_sign, int64_t* mvc_classes,
    int64_t* mvc_class0, int64_t* mvc_bits, int64_t* mvc_class0_fp,
    int64_t* mvc_fp,
    int64_t* cnt_coef_y32, int64_t* cnt_eob_y32,
    int64_t* cnt_coef_uv16, int64_t* cnt_eob_uv16,
    int64_t* cnt_coef_y16, int64_t* cnt_eob_y16,
    int64_t* cnt_coef_uv8, int64_t* cnt_eob_uv8,
    // grid outputs
    uint8_t* f_inter, int8_t* f_ref0, int8_t* f_ref1, int8_t* f_mode,
    int32_t* f_mv0, int32_t* f_mv1, uint8_t* f_skip,
    int32_t* out_modes,
    uint8_t* out, int64_t out_cap) {
    using namespace rtser;
    BoolEnc enc;
    const char* tr = getenv("TPU_VP9_RTSER_TRACE");
    rtser::g_trace = tr ? fopen(tr, "w") : nullptr;
    rtser::pb(&enc, 0, 128);  // boolenc_start clear bit
    Ser s;
    s.e = &enc;
    s.g = {mi_rows, mi_cols, f_inter, f_ref0, f_ref1, f_mode, f_mv0, f_mv1};
    s.f_skip = f_skip;
    s.tile_start = 0;
    s.tile_end = mi_cols;
    s.partition_probs = partition_probs;
    s.skip_probs = skip_probs;
    s.intra_inter_probs = intra_inter_probs;
    s.single_ref_probs = single_ref_probs;
    s.inter_mode_probs = inter_mode_probs;
    s.nmv.joints = nmv_joints;
    s.nmv.comp[0] = nmv_comp0;
    s.nmv.comp[1] = nmv_comp1;
    s.cnt_partition = counts_on ? cnt_partition : nullptr;
    s.cnt_skip = counts_on ? cnt_skip : nullptr;
    s.cnt_intra_inter = counts_on ? cnt_intra_inter : nullptr;
    s.cnt_single_ref = counts_on ? cnt_single_ref : nullptr;
    s.cnt_inter_mode = counts_on ? cnt_inter_mode : nullptr;
    s.have_mv_counts = counts_on != 0;
    s.mv_counts = {mvc_joints, mvc_sign, mvc_classes, mvc_class0,
                   mvc_bits, mvc_class0_fp, mvc_fp};
    s.prev_ref0 = prev_ref0;
    s.prev_ref1 = prev_ref1;
    s.prev_mv0 = prev_mv0;
    s.prev_mv1 = prev_mv1;
    s.pabove.assign(mi_cols + 8, 0);
    s.pleft.assign(mi_rows + 8, 0);
    for (int p = 0; p < 3; ++p) {
        int ssx = p == 0 ? 0 : 1;
        s.tok_above[p].assign(((mi_cols * 2) >> ssx) + 16, 0);
        s.tok_left[p].assign(((mi_rows * 2) >> ssx) + 16, 0);
    }
    // a fastloop::Ctx view for find_mv_refs
    static const int32_t SIGN_BIAS0[4] = {0, 0, 0, 0};
    fastloop::Ctx fctx;
    fctx.g = s.g;
    fctx.tile_mi_start = 0;
    fctx.tile_mi_end = mi_cols;
    fctx.sign_bias = sign_bias ? sign_bias : SIGN_BIAS0;
    fctx.prev_ref0 = prev_ref0;
    fctx.prev_ref1 = prev_ref1;
    fctx.prev_mv0 = prev_mv0;
    fctx.prev_mv1 = prev_mv1;

    int32_t lvbuf[1024];
    int leaf_i = 0;

    auto write_leaf = [&](int mi_row, int mi_col, int bsize_px, int zone,
                          int bi) {
        // zone arrays
        const int32_t* mv = zone == 0 ? mv32 : zone == 1 ? mv16 : mvs16;
        const int8_t* rf = zone == 0 ? ref32 : zone == 1 ? ref16 : refs16;
        const uint8_t* sk = zone == 0 ? skip32 : zone == 1 ? skip16
                                               : skips16;
        const int16_t* ly = zone == 0 ? lv32_y : zone == 1 ? lv16_y : lvs_y;
        const int16_t* lu = zone == 0 ? lv32_u : zone == 1 ? lv16_u : lvs_u;
        const int16_t* lv = zone == 0 ? lv32_v : zone == 1 ? lv16_v : lvs_v;
        const int n = bsize_px;          // luma block px
        const int nc = n >> 1;
        const int mvr = mv[bi * 2], mvc = mv[bi * 2 + 1];
        const int ref_id = rf ? rf[bi] : 1;
        const bool skip = sk[bi] != 0;
        // classification: normative mv-ref scan against final neighbors
        const int bsize_enum = n == 32 ? 9 : 6;  // BLOCK_32X32 / 16X16
        MvRefs refs_out;
        find_mv_refs(fctx, mi_row, mi_col, bsize_enum, ref_id, &refs_out);
        int nearest[2], nearv[2];
        best_ref_mvs(refs_out, mi_row, mi_col, bsize_enum, mi_rows, mi_cols,
                     nearest, nearv);
        int mode;
        if (mvr == nearest[0] && mvc == nearest[1]) mode = 0;
        else if (mvr == nearv[0] && mvc == nearv[1]) mode = 1;
        else if (mvr == 0 && mvc == 0) mode = 2;
        else mode = 3;
        // ---- syntax ----
        int sctx = skip_ctx_of(s, mi_row, mi_col);
        rtser::pb(&enc, skip ? 1 : 0, s.skip_probs[sctx]);
        if (s.cnt_skip) s.cnt_skip[sctx * 2 + (skip ? 1 : 0)] += 1;
        int iictx = intra_inter_ctx_of(s, mi_row, mi_col);
        rtser::pb(&enc, 1, s.intra_inter_probs[iictx]);
        if (s.cnt_intra_inter) s.cnt_intra_inter[iictx * 2 + 1] += 1;
        // single-ref selection
        int rctx = single_ref_p1_ctx_of(s, mi_row, mi_col);
        int not_last = ref_id != 1;
        rtser::pb(&enc, not_last, s.single_ref_probs[rctx * 2 + 0]);
        if (s.cnt_single_ref)
            s.cnt_single_ref[(rctx * 2 + 0) * 2 + not_last] += 1;
        if (not_last) {
            int rctx2 = single_ref_p2_ctx_of(s, mi_row, mi_col);
            int is_alt = ref_id == 3;  // GOLDEN = 0, ALTREF = 1
            rtser::pb(&enc, is_alt, s.single_ref_probs[rctx2 * 2 + 1]);
            if (s.cnt_single_ref)
                s.cnt_single_ref[(rctx2 * 2 + 1) * 2 + is_alt] += 1;
        }
        write_tree(&enc, INTER_MODE_TREE,
                   s.inter_mode_probs + refs_out.mode_ctx * 3, mode);
        if (s.cnt_inter_mode)
            s.cnt_inter_mode[refs_out.mode_ctx * 4 + mode] += 1;
        if (mode == 3)
            write_mv(&enc, mvr, mvc, nearest[0], nearest[1], s.nmv,
                     s.have_mv_counts ? &s.mv_counts : nullptr);
        // ---- grid update (before tokens is fine: token ctx is separate)
        const int bw_mi = n / 8, bh_mi = n / 8;
        const int r1 = std::min(mi_row + bh_mi, mi_rows);
        const int c1 = std::min(mi_col + bw_mi, mi_cols);
        for (int rr = mi_row; rr < r1; ++rr)
            for (int cc = mi_col; cc < c1; ++cc) {
                int64_t cell = (int64_t)rr * mi_cols + cc;
                f_inter[cell] = 1;
                f_ref0[cell] = (int8_t)ref_id;
                f_ref1[cell] = -1;
                f_mode[cell] = (int8_t)(10 + mode);
                f_mv0[cell * 2] = mvr;
                f_mv0[cell * 2 + 1] = mvc;
                f_mv1[cell * 2] = 0;
                f_mv1[cell * 2 + 1] = 0;
                f_skip[cell] = skip ? 1 : 0;
            }
        if (out_modes) {
            int32_t* om = out_modes + (int64_t)leaf_i * 4;
            om[0] = mode;
            om[1] = refs_out.mode_ctx;
            om[2] = nearest[0];
            om[3] = nearest[1];
        }
        leaf_i += 1;
        // ---- tokens ----
        const int y_txs = n == 32 ? 3 : 2;   // TX_32X32 / TX_16X16
        const int uv_txs = y_txs - 1;
        const int w4 = n / 4, h4 = n / 4;
        const int w4c = nc / 4, h4c = nc / 4;
        if (skip) {
            for (int p = 0; p < 3; ++p) {
                int ssx = p == 0 ? 0 : 1;
                int bx4 = (mi_col * 2) >> ssx, by4 = (mi_row * 2) >> ssx;
                int pw4 = p == 0 ? w4 : w4c, ph4 = p == 0 ? h4 : h4c;
                for (int i = 0; i < pw4; ++i) s.tok_above[p][bx4 + i] = 0;
                for (int i = 0; i < ph4; ++i) s.tok_left[p][by4 + i] = 0;
            }
            return;
        }
        const uint8_t* py_probs = n == 32 ? coef_y32 : coef_y16;
        const uint8_t* puv_probs = n == 32 ? coef_uv16 : coef_uv8;
        int64_t* ccy = n == 32 ? cnt_coef_y32 : cnt_coef_y16;
        int64_t* cey = n == 32 ? cnt_eob_y32 : cnt_eob_y16;
        int64_t* ccu = n == 32 ? cnt_coef_uv16 : cnt_coef_uv8;
        int64_t* ceu = n == 32 ? cnt_eob_uv16 : cnt_eob_uv8;
        // y block
        {
            int x4 = mi_col * 2, y4 = mi_row * 2;
            int ctx0 = tok_get_ctx(s, 0, x4, y4, y_txs);
            if (rtser::g_trace) fprintf(rtser::g_trace, "COEF %d\n", y_txs);
            int eob;
            const int ky = n == 32 ? k32 : k16;
            if (ky > 0) {
                eob = boolenc_write_coeffs_pre(
                    &enc, ly + (int64_t)bi * ky, ky, y_txs, 0, py_probs,
                    ctx0, counts_on ? ccy : nullptr,
                    counts_on ? cey : nullptr);
            } else {
                for (int i = 0; i < n * n; ++i)
                    lvbuf[i] = ly[(int64_t)bi * n * n + i];
                eob = boolenc_write_coeffs(
                    &enc, lvbuf, y_txs, 0, py_probs, ctx0,
                    counts_on ? ccy : nullptr, counts_on ? cey : nullptr);
            }
            tok_set_ctx(s, 0, x4, y4, y_txs, eob > 0, mi_cols * 2,
                        mi_rows * 2);
        }
        for (int p = 1; p < 3; ++p) {
            const int16_t* lp = p == 1 ? lu : lv;
            int x4 = mi_col, y4 = mi_row;
            int ctx0 = tok_get_ctx(s, p, x4, y4, uv_txs);
            if (rtser::g_trace) fprintf(rtser::g_trace, "COEF %d\n", uv_txs);
            int eob;
            const int kuv = n == 32 ? kuv16 : kuv8;
            if (kuv > 0) {
                eob = boolenc_write_coeffs_pre(
                    &enc, lp + (int64_t)bi * kuv, kuv, uv_txs, 0,
                    puv_probs, ctx0, counts_on ? ccu : nullptr,
                    counts_on ? ceu : nullptr);
            } else {
                for (int i = 0; i < nc * nc; ++i)
                    lvbuf[i] = lp[(int64_t)bi * nc * nc + i];
                eob = boolenc_write_coeffs(
                    &enc, lvbuf, uv_txs, 0, puv_probs, ctx0,
                    counts_on ? ccu : nullptr, counts_on ? ceu : nullptr);
            }
            tok_set_ctx(s, p, x4, y4, uv_txs, eob > 0, mi_cols,
                        mi_rows);
        }
    };

    // walk: SB raster; 64 -> 32 (NONE or SPLIT by split32) -> 16
    for (int sb_r = 0; sb_r < mi_rows; sb_r += 8) {
        for (int sb_c = 0; sb_c < mi_cols; sb_c += 8) {
            // node 64
            bool hr64 = sb_r + 4 < mi_rows, hc64 = sb_c + 4 < mi_cols;
            write_partition(s, sb_r, sb_c, 64, 3, hr64, hc64);
            for (int dr = 0; dr < 8; dr += 4) {
                for (int dc = 0; dc < 8; dc += 4) {
                    int r = sb_r + dr, c = sb_c + dc;
                    if (r >= mi_rows || c >= mi_cols) continue;
                    bool hr = r + 2 < mi_rows, hc = c + 2 < mi_cols;
                    if (hr && hc) {
                        // 32-block (main zone or split into 16s)
                        int b32 = (r / 4) * cols32 + (c / 4);
                        int do_split = split32 ? split32[b32] : 0;
                        write_partition(s, r, c, 32, do_split ? 3 : 0,
                                        true, true);
                        if (!do_split) {
                            write_leaf(r, c, 32, 0, b32);
                            part_update(s, r, c, 32, 32);
                        } else {
                            for (int i = 0; i < 2; ++i)
                                for (int j = 0; j < 2; ++j) {
                                    int rr = r + 2 * i, cc = c + 2 * j;
                                    int b16 = (rr / 2) * (cols32 * 2)
                                              + (cc / 2);
                                    write_partition(s, rr, cc, 16, 0,
                                                    true, true);
                                    write_leaf(rr, cc, 16, 1, b16);
                                    part_update(s, rr, cc, 16, 16);
                                }
                        }
                    } else {
                        // forced descent: the 16-strip row
                        write_partition(s, r, c, 32, 3, hr, hc);
                        for (int i = 0; i < 2; ++i)
                            for (int j = 0; j < 2; ++j) {
                                int rr = r + 2 * i, cc = c + 2 * j;
                                if (rr >= mi_rows || cc >= mi_cols)
                                    continue;
                                bool hr16 = rr + 1 < mi_rows;
                                bool hc16 = cc + 1 < mi_cols;
                                write_partition(s, rr, cc, 16, 0, hr16,
                                                hc16);
                                int bi = cc / 2;  // strip: single row
                                write_leaf(rr, cc, 16, 2, bi);
                                part_update(s, rr, cc, 16, 16);
                            }
                    }
                }
            }
        }
    }
    if (rtser::g_trace) { fclose(rtser::g_trace); rtser::g_trace = nullptr; }
    return boolenc_finalize(&enc, out, out_cap);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Exact integer inverse transforms (port of ops/txfm.py idct/iadst
// butterflies; int64 intermediates, bit-identical to the Python oracle
// — tested by tests/test_native.py::test_native_inv_txfm).  The Python
// per-block butterflies were the top wall-time of the M0-M4 host
// encode (CIF M4: ~3s of numpy idct per 5 frames).
// ---------------------------------------------------------------------------

namespace itx {

static const int64_t C[32] = {
    16384, 16364, 16305, 16207, 16069, 15893, 15679, 15426, 15137, 14811,
    14449, 14053, 13623, 13160, 12665, 12140, 11585, 11003, 10394, 9760,
    9102, 8423, 7723, 7005, 6270, 5520, 4756, 3981, 3196, 2404, 1606, 804};
static const int64_t SP[5] = {0, 5283, 9929, 13377, 15212};

static inline int64_t rs(int64_t x) { return (x + 8192) >> 14; }

static void idct4(const int64_t* x, int64_t* o) {
    int64_t s0 = rs((x[0] + x[2]) * C[16]);
    int64_t s1 = rs((x[0] - x[2]) * C[16]);
    int64_t s2 = rs(x[1] * C[24] - x[3] * C[8]);
    int64_t s3 = rs(x[1] * C[8] + x[3] * C[24]);
    o[0] = s0 + s3; o[1] = s1 + s2; o[2] = s1 - s2; o[3] = s0 - s3;
}

static void iadst4(const int64_t* x, int64_t* o) {
    int64_t s0 = SP[1] * x[0] + SP[4] * x[2] + SP[2] * x[3];
    int64_t s1 = SP[2] * x[0] - SP[1] * x[2] - SP[4] * x[3];
    int64_t s3 = SP[3] * x[1];
    int64_t s2 = SP[3] * (x[0] - x[2] + x[3]);
    o[0] = rs(s0 + s3); o[1] = rs(s1 + s3); o[2] = rs(s2);
    o[3] = rs(s0 + s1 - s3);
}

static void idct8(const int64_t* x, int64_t* o) {
    int64_t s4 = rs(x[1] * C[28] - x[7] * C[4]);
    int64_t s7 = rs(x[1] * C[4] + x[7] * C[28]);
    int64_t s5 = rs(x[5] * C[12] - x[3] * C[20]);
    int64_t s6 = rs(x[5] * C[20] + x[3] * C[12]);
    int64_t ev_in[4] = {x[0], x[2], x[4], x[6]}, ev[4];
    idct4(ev_in, ev);
    int64_t t4 = s4 + s5, t5 = s4 - s5, t6 = -s6 + s7, t7 = s6 + s7;
    int64_t u5 = rs((t6 - t5) * C[16]);
    int64_t u6 = rs((t5 + t6) * C[16]);
    o[0] = ev[0] + t7; o[1] = ev[1] + u6; o[2] = ev[2] + u5;
    o[3] = ev[3] + t4; o[4] = ev[3] - t4; o[5] = ev[2] - u5;
    o[6] = ev[1] - u6; o[7] = ev[0] - t7;
}

static void iadst8(const int64_t* xin, int64_t* o) {
    int64_t x0 = xin[7], x1 = xin[0], x2 = xin[5], x3 = xin[2];
    int64_t x4 = xin[3], x5 = xin[4], x6 = xin[1], x7 = xin[6];
    int64_t s0 = C[2] * x0 + C[30] * x1;
    int64_t s1 = C[30] * x0 - C[2] * x1;
    int64_t s2 = C[10] * x2 + C[22] * x3;
    int64_t s3 = C[22] * x2 - C[10] * x3;
    int64_t s4 = C[18] * x4 + C[14] * x5;
    int64_t s5 = C[14] * x4 - C[18] * x5;
    int64_t s6 = C[26] * x6 + C[6] * x7;
    int64_t s7 = C[6] * x6 - C[26] * x7;
    x0 = rs(s0 + s4); x1 = rs(s1 + s5); x2 = rs(s2 + s6); x3 = rs(s3 + s7);
    x4 = rs(s0 - s4); x5 = rs(s1 - s5); x6 = rs(s2 - s6); x7 = rs(s3 - s7);
    s4 = C[8] * x4 + C[24] * x5;
    s5 = C[24] * x4 - C[8] * x5;
    s6 = -C[24] * x6 + C[8] * x7;
    s7 = C[8] * x6 + C[24] * x7;
    int64_t y0 = x0 + x2, y1 = x1 + x3, y2 = x0 - x2, y3 = x1 - x3;
    x4 = rs(s4 + s6); x5 = rs(s5 + s7);
    int64_t x6n = rs(s4 - s6), x7n = rs(s5 - s7);
    int64_t y2n = rs(C[16] * (y2 + y3));
    int64_t y3n = rs(C[16] * (y2 - y3));
    int64_t y6n = rs(C[16] * (x6n + x7n));
    int64_t y7n = rs(C[16] * (x6n - x7n));
    o[0] = y0; o[1] = -x4; o[2] = y6n; o[3] = -y2n;
    o[4] = y3n; o[5] = -y7n; o[6] = x5; o[7] = -y1;
}

static void idct16(const int64_t* x, int64_t* o) {
    int64_t s8 = rs(x[1] * C[30] - x[15] * C[2]);
    int64_t s15 = rs(x[1] * C[2] + x[15] * C[30]);
    int64_t s9 = rs(x[9] * C[14] - x[7] * C[18]);
    int64_t s14 = rs(x[9] * C[18] + x[7] * C[14]);
    int64_t s10 = rs(x[5] * C[22] - x[11] * C[10]);
    int64_t s13 = rs(x[5] * C[10] + x[11] * C[22]);
    int64_t s11 = rs(x[13] * C[6] - x[3] * C[26]);
    int64_t s12 = rs(x[13] * C[26] + x[3] * C[6]);
    int64_t t8 = s8 + s9, t9 = s8 - s9, t10 = -s10 + s11, t11 = s10 + s11;
    int64_t t12 = s12 + s13, t13 = s12 - s13, t14 = -s14 + s15,
            t15 = s14 + s15;
    int64_t ev_in[8], ev[8];
    for (int k = 0; k < 8; ++k) ev_in[k] = x[2 * k];
    idct8(ev_in, ev);
    int64_t u9 = rs(-t9 * C[8] + t14 * C[24]);
    int64_t u14 = rs(t9 * C[24] + t14 * C[8]);
    int64_t u10 = rs(-t10 * C[24] - t13 * C[8]);
    int64_t u13 = rs(-t10 * C[8] + t13 * C[24]);
    int64_t v8 = t8 + t11, v9 = u9 + u10, v10 = u9 - u10, v11 = t8 - t11;
    int64_t v12 = -t12 + t15, v13 = -u13 + u14, v14 = u13 + u14,
            v15 = t12 + t15;
    int64_t w10 = rs((-v10 + v13) * C[16]);
    int64_t w13 = rs((v10 + v13) * C[16]);
    int64_t w11 = rs((-v11 + v12) * C[16]);
    int64_t w12 = rs((v11 + v12) * C[16]);
    int64_t odd[8] = {v8, v9, w10, w11, w12, w13, v14, v15};
    for (int k = 0; k < 8; ++k) o[k] = ev[k] + odd[7 - k];
    for (int k = 0; k < 8; ++k) o[8 + k] = ev[7 - k] - odd[k];
}

static void iadst16(const int64_t* xin, int64_t* o) {
    int64_t x0 = xin[15], x1 = xin[0], x2 = xin[13], x3 = xin[2];
    int64_t x4 = xin[11], x5 = xin[4], x6 = xin[9], x7 = xin[6];
    int64_t x8 = xin[7], x9 = xin[8], x10 = xin[5], x11 = xin[10];
    int64_t x12 = xin[3], x13 = xin[12], x14 = xin[1], x15 = xin[14];
    int64_t s0 = x0 * C[1] + x1 * C[31];
    int64_t s1 = x0 * C[31] - x1 * C[1];
    int64_t s2 = x2 * C[5] + x3 * C[27];
    int64_t s3 = x2 * C[27] - x3 * C[5];
    int64_t s4 = x4 * C[9] + x5 * C[23];
    int64_t s5 = x4 * C[23] - x5 * C[9];
    int64_t s6 = x6 * C[13] + x7 * C[19];
    int64_t s7 = x6 * C[19] - x7 * C[13];
    int64_t s8 = x8 * C[17] + x9 * C[15];
    int64_t s9 = x8 * C[15] - x9 * C[17];
    int64_t s10 = x10 * C[21] + x11 * C[11];
    int64_t s11 = x10 * C[11] - x11 * C[21];
    int64_t s12 = x12 * C[25] + x13 * C[7];
    int64_t s13 = x12 * C[7] - x13 * C[25];
    int64_t s14 = x14 * C[29] + x15 * C[3];
    int64_t s15 = x14 * C[3] - x15 * C[29];
    x0 = rs(s0 + s8); x8 = rs(s0 - s8);
    x1 = rs(s1 + s9); x9 = rs(s1 - s9);
    x2 = rs(s2 + s10); x10 = rs(s2 - s10);
    x3 = rs(s3 + s11); x11 = rs(s3 - s11);
    x4 = rs(s4 + s12); x12 = rs(s4 - s12);
    x5 = rs(s5 + s13); x13 = rs(s5 - s13);
    x6 = rs(s6 + s14); x14 = rs(s6 - s14);
    x7 = rs(s7 + s15); x15 = rs(s7 - s15);
    s8 = x8 * C[4] + x9 * C[28];
    s9 = x8 * C[28] - x9 * C[4];
    s10 = x10 * C[20] + x11 * C[12];
    s11 = x10 * C[12] - x11 * C[20];
    s12 = -x12 * C[28] + x13 * C[4];
    s13 = x12 * C[4] + x13 * C[28];
    s14 = -x14 * C[12] + x15 * C[20];
    s15 = x14 * C[20] + x15 * C[12];
    int64_t y0 = x0 + x4, y4 = x0 - x4;
    int64_t y1 = x1 + x5, y5 = x1 - x5;
    int64_t y2 = x2 + x6, y6 = x2 - x6;
    int64_t y3 = x3 + x7, y7 = x3 - x7;
    x8 = rs(s8 + s12); x12 = rs(s8 - s12);
    x9 = rs(s9 + s13); x13 = rs(s9 - s13);
    x10 = rs(s10 + s14); x14 = rs(s10 - s14);
    x11 = rs(s11 + s15); x15 = rs(s11 - s15);
    s4 = y4 * C[8] + y5 * C[24];
    s5 = y4 * C[24] - y5 * C[8];
    s6 = -y6 * C[24] + y7 * C[8];
    s7 = y6 * C[8] + y7 * C[24];
    s12 = x12 * C[8] + x13 * C[24];
    s13 = x12 * C[24] - x13 * C[8];
    s14 = -x14 * C[24] + x15 * C[8];
    s15 = x14 * C[8] + x15 * C[24];
    int64_t z0 = y0 + y2, z2 = y0 - y2;
    int64_t z1 = y1 + y3, z3 = y1 - y3;
    int64_t z4 = rs(s4 + s6), z6 = rs(s4 - s6);
    int64_t z5 = rs(s5 + s7), z7 = rs(s5 - s7);
    int64_t z8 = x8 + x10, z10 = x8 - x10;
    int64_t z9 = x9 + x11, z11 = x9 - x11;
    int64_t z12 = rs(s12 + s14), z14 = rs(s12 - s14);
    int64_t z13 = rs(s13 + s15), z15 = rs(s13 - s15);
    int64_t w2 = rs(-C[16] * (z2 + z3));
    int64_t w3 = rs(C[16] * (z2 - z3));
    int64_t w6 = rs(C[16] * (z6 + z7));
    int64_t w7 = rs(C[16] * (-z6 + z7));
    int64_t w10 = rs(C[16] * (z10 + z11));
    int64_t w11 = rs(C[16] * (-z10 + z11));
    int64_t w14 = rs(-C[16] * (z14 + z15));
    int64_t w15 = rs(C[16] * (z14 - z15));
    o[0] = z0; o[1] = -z8; o[2] = z12; o[3] = -z4;
    o[4] = w6; o[5] = w14; o[6] = w10; o[7] = w2;
    o[8] = w3; o[9] = w11; o[10] = w15; o[11] = w7;
    o[12] = z5; o[13] = -z13; o[14] = z9; o[15] = -z1;
}

static void idct32(const int64_t* x, int64_t* o) {
    int64_t s16 = rs(x[1] * C[31] - x[31] * C[1]);
    int64_t s31 = rs(x[1] * C[1] + x[31] * C[31]);
    int64_t s17 = rs(x[17] * C[15] - x[15] * C[17]);
    int64_t s30 = rs(x[17] * C[17] + x[15] * C[15]);
    int64_t s18 = rs(x[9] * C[23] - x[23] * C[9]);
    int64_t s29 = rs(x[9] * C[9] + x[23] * C[23]);
    int64_t s19 = rs(x[25] * C[7] - x[7] * C[25]);
    int64_t s28 = rs(x[25] * C[25] + x[7] * C[7]);
    int64_t s20 = rs(x[5] * C[27] - x[27] * C[5]);
    int64_t s27 = rs(x[5] * C[5] + x[27] * C[27]);
    int64_t s21 = rs(x[21] * C[11] - x[11] * C[21]);
    int64_t s26 = rs(x[21] * C[21] + x[11] * C[11]);
    int64_t s22 = rs(x[13] * C[19] - x[19] * C[13]);
    int64_t s25 = rs(x[13] * C[13] + x[19] * C[19]);
    int64_t s23 = rs(x[29] * C[3] - x[3] * C[29]);
    int64_t s24 = rs(x[29] * C[29] + x[3] * C[3]);
    int64_t t16 = s16 + s17, t17 = s16 - s17;
    int64_t t18 = -s18 + s19, t19 = s18 + s19;
    int64_t t20 = s20 + s21, t21 = s20 - s21;
    int64_t t22 = -s22 + s23, t23 = s22 + s23;
    int64_t t24 = s24 + s25, t25 = s24 - s25;
    int64_t t26 = -s26 + s27, t27 = s26 + s27;
    int64_t t28 = s28 + s29, t29 = s28 - s29;
    int64_t t30 = -s30 + s31, t31 = s30 + s31;
    int64_t u17 = rs(-t17 * C[4] + t30 * C[28]);
    int64_t u30 = rs(t17 * C[28] + t30 * C[4]);
    int64_t u18 = rs(-t18 * C[28] - t29 * C[4]);
    int64_t u29 = rs(-t18 * C[4] + t29 * C[28]);
    int64_t u21 = rs(-t21 * C[20] + t26 * C[12]);
    int64_t u26 = rs(t21 * C[12] + t26 * C[20]);
    int64_t u22 = rs(-t22 * C[12] - t25 * C[20]);
    int64_t u25 = rs(-t22 * C[20] + t25 * C[12]);
    int64_t v16 = t16 + t19, v17 = u17 + u18, v18 = u17 - u18,
            v19 = t16 - t19;
    int64_t v20 = -t20 + t23, v21 = -u21 + u22, v22 = u21 + u22,
            v23 = t20 + t23;
    int64_t v24 = t24 + t27, v25 = u25 + u26, v26 = u25 - u26,
            v27 = t24 - t27;
    int64_t v28 = -t28 + t31, v29 = -u29 + u30, v30 = u29 + u30,
            v31 = t28 + t31;
    int64_t w18 = rs(-v18 * C[8] + v29 * C[24]);
    int64_t w29 = rs(v18 * C[24] + v29 * C[8]);
    int64_t w19 = rs(-v19 * C[8] + v28 * C[24]);
    int64_t w28 = rs(v19 * C[24] + v28 * C[8]);
    int64_t w20 = rs(-v20 * C[24] - v27 * C[8]);
    int64_t w27 = rs(-v20 * C[8] + v27 * C[24]);
    int64_t w21 = rs(-v21 * C[24] - v26 * C[8]);
    int64_t w26 = rs(-v21 * C[8] + v26 * C[24]);
    int64_t a16 = v16 + v23, a17 = v17 + v22, a18 = w18 + w21,
            a19 = w19 + w20;
    int64_t a20 = w19 - w20, a21 = w18 - w21, a22 = v17 - v22,
            a23 = v16 - v23;
    int64_t a24 = -v24 + v31, a25 = -v25 + v30, a26 = -w26 + w29,
            a27 = -w27 + w28;
    int64_t a28 = w27 + w28, a29 = w26 + w29, a30 = v25 + v30,
            a31 = v24 + v31;
    int64_t b20 = rs((-a20 + a27) * C[16]);
    int64_t b27 = rs((a20 + a27) * C[16]);
    int64_t b21 = rs((-a21 + a26) * C[16]);
    int64_t b26 = rs((a21 + a26) * C[16]);
    int64_t b22 = rs((-a22 + a25) * C[16]);
    int64_t b25 = rs((a22 + a25) * C[16]);
    int64_t b23 = rs((-a23 + a24) * C[16]);
    int64_t b24 = rs((a23 + a24) * C[16]);
    int64_t odd[16] = {a16, a17, a18, a19, b20, b21, b22, b23,
                       b24, b25, b26, b27, a28, a29, a30, a31};
    int64_t ev_in[16], ev[16];
    for (int k = 0; k < 16; ++k) ev_in[k] = x[2 * k];
    idct16(ev_in, ev);
    for (int k = 0; k < 16; ++k) o[k] = ev[k] + odd[15 - k];
    for (int k = 0; k < 16; ++k) o[16 + k] = ev[15 - k] - odd[k];
}

typedef void (*Tx1d)(const int64_t*, int64_t*);

static Tx1d pick(int n, int adst) {
    if (adst) {
        if (n == 4) return iadst4;
        if (n == 8) return iadst8;
        return iadst16;
    }
    if (n == 4) return idct4;
    if (n == 8) return idct8;
    if (n == 16) return idct16;
    return idct32;
}

}  // namespace itx

extern "C" {

// tx_type: 0 DCT_DCT, 1 ADST_DCT (col adst), 2 DCT_ADST (row adst),
// 3 ADST_ADST — matching bitstream.tables.TxType / ops/txfm.inv_txfm2d.
void inv_txfm_add_batch(const int32_t* coeffs, const uint8_t* pred,
                        uint8_t* out, int n, int tx_type, int nblocks) {
    const int shift = n == 4 ? 4 : (n == 8 ? 5 : 6);
    int row_adst = (tx_type == 3 || tx_type == 2) && n <= 16;
    int col_adst = (tx_type == 3 || tx_type == 1) && n <= 16;
    itx::Tx1d rowf = itx::pick(n, row_adst);
    itx::Tx1d colf = itx::pick(n, col_adst);
    int64_t tmp[32 * 32], buf[32], obuf[32];
    for (int b = 0; b < nblocks; ++b) {
        const int32_t* cin = coeffs + (int64_t)b * n * n;
        const uint8_t* p = pred + (int64_t)b * n * n;
        uint8_t* q = out + (int64_t)b * n * n;
        // rows pass
        for (int r = 0; r < n; ++r) {
            for (int k = 0; k < n; ++k) buf[k] = cin[r * n + k];
            rowf(buf, tmp + r * n);
        }
        // columns pass
        for (int c = 0; c < n; ++c) {
            for (int k = 0; k < n; ++k) buf[k] = tmp[k * n + c];
            colf(buf, obuf);
            for (int k = 0; k < n; ++k) tmp[k * n + c] = obuf[k];
        }
        const int64_t half = 1ll << (shift - 1);
        for (int i = 0; i < n * n; ++i) {
            int64_t v = (tmp[i] + half) >> shift;
            int64_t s = (int64_t)p[i] + v;
            q[i] = (uint8_t)(s < 0 ? 0 : (s > 255 ? 255 : s));
        }
    }
}

}  // extern "C"
