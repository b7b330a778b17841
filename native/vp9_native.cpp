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
#include <cstring>
#include <cstdlib>
#include <cmath>
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
void sad_full_search_rect(const uint8_t* src, int src_stride, int w, int h,
                          const uint8_t* region, int region_stride, int r,
                          int32_t* best) {
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
