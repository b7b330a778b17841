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
struct Path { int len; int idx[4]; int bit[4]; };
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
    Path p;
    p.len = 0;
    w.go(0, p);
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
