// MSAC range encoder + coefficient tokenizer - the host-native hot path.
//
// Reference analog: rav1e's src/ec.rs + src/context/transform_unit.rs hot
// loops (hand-SIMD in the reference; serial C++ here since entropy coding is
// inherently sequential).  Byte-identical to the python oracle in
// rav1e_tpu/ec/msac.py; parity enforced by tests/test_native_msac.py.
//
// Build: make -C native   ->  native/libmsac.so

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;

struct MsacEnc {
    uint64_t low;
    uint32_t rng;
    int32_t cnt;
    uint16_t *precarry;
    size_t n, cap;
};

inline void grow(MsacEnc *e, size_t need) {
    if (e->n + need <= e->cap) return;
    size_t ncap = e->cap * 2 + need;
    e->precarry = (uint16_t *)realloc(e->precarry, ncap * sizeof(uint16_t));
    e->cap = ncap;
}

inline int ilog_nz(uint32_t x) { return 32 - __builtin_clz(x); }

inline void normalize(MsacEnc *e, uint64_t low, uint32_t rng) {
    int d = 16 - ilog_nz(rng);
    int c = e->cnt;
    int s = c + d;
    if (s >= 9) {
        grow(e, 2);
        c += 16;
        uint64_t m = (1ull << c) - 1;
        if (s >= 16) {
            e->precarry[e->n++] = (uint16_t)(low >> c);
            low &= m;
            c -= 8;
            m >>= 8;
        }
        e->precarry[e->n++] = (uint16_t)(low >> c);
        s = c + d - 24;
        low &= m;
    }
    e->low = low << d;
    e->rng = rng << d;
    e->cnt = s;
}

inline void encode_q15(MsacEnc *e, unsigned fl, unsigned fh, int s, int nsyms) {
    uint64_t low = e->low;
    uint32_t r = e->rng;
    const int n = nsyms - 1;
    if (fl < 32768u) {
        unsigned u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
                     EC_MIN_PROB * (n - (s - 1));
        unsigned v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
                     EC_MIN_PROB * (n - s);
        low += r - u;
        r = u - v;
    } else {
        r -= (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
             EC_MIN_PROB * (n - s);
    }
    normalize(e, low, r);
}

inline void update_cdf(uint16_t *icdf, int val, int nsymbs) {
    static const int nsymbs2speed[17] = {0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2};
    const int count = icdf[nsymbs];
    const int rate = 3 + (count > 15) + (count > 31) + nsymbs2speed[nsymbs];
    int tmp = 32768;
    for (int i = 0; i < nsymbs - 1; i++) {
        if (i == val) tmp = 0;
        const int cur = icdf[i];
        if (tmp < cur)
            icdf[i] = cur - ((cur - tmp) >> rate);
        else
            icdf[i] = cur + ((tmp - cur) >> rate);
    }
    icdf[nsymbs] = count + (count < 32);
}

inline void enc_symbol(MsacEnc *e, uint16_t *icdf, int nsyms, int val, int adapt) {
    unsigned fl = val == 0 ? 32768 : icdf[val - 1];
    unsigned fh = icdf[val];
    encode_q15(e, fl, fh, val, nsyms);
    if (adapt) update_cdf(icdf, val, nsyms);
}

inline void enc_bool(MsacEnc *e, int bit, unsigned f) {
    if (bit)
        encode_q15(e, f, 0, 1, 2);
    else
        encode_q15(e, 32768, f, 0, 2);
}

}  // namespace

extern "C" {

MsacEnc *msac_new() {
    MsacEnc *e = (MsacEnc *)calloc(1, sizeof(MsacEnc));
    e->rng = 0x8000;
    e->cnt = -9;
    e->cap = 1 << 16;
    e->precarry = (uint16_t *)malloc(e->cap * sizeof(uint16_t));
    return e;
}

void msac_free(MsacEnc *e) {
    if (!e) return;
    free(e->precarry);
    free(e);
}

void msac_reset(MsacEnc *e) {
    e->low = 0;
    e->rng = 0x8000;
    e->cnt = -9;
    e->n = 0;
}

size_t msac_size_upper(MsacEnc *e) { return e->n + 8; }

// flush + carry propagate into out; returns byte count
size_t msac_done(MsacEnc *e, uint8_t *out) {
    uint64_t low = e->low;
    int c = e->cnt;
    int s = 10 + c;
    const uint64_t m = 0x3FFF;
    uint64_t val = ((low + m) & ~m) | (m + 1);
    size_t n = e->n;
    grow(e, 8);
    if (s > 0) {
        uint64_t mm = (1ull << (c + 16)) - 1;
        do {
            e->precarry[n++] = (uint16_t)(val >> (c + 16));
            val &= mm;
            s -= 8;
            c -= 8;
            mm >>= 8;
        } while (s > 0);
    }
    uint32_t carry = 0;
    for (size_t i = n; i-- > 0;) {
        uint32_t v = e->precarry[i] + carry;
        out[i] = (uint8_t)v;
        carry = v >> 8;
    }
    return n;
}

void msac_symbol(MsacEnc *e, uint16_t *icdf, int nsyms, int val, int adapt) {
    enc_symbol(e, icdf, nsyms, val, adapt);
}

// approximate stream position in bits (for RD rate measurement)
int msac_tell(MsacEnc *e) { return (int)(e->n * 8) + e->cnt + 10; }

void msac_bool(MsacEnc *e, int bit, unsigned f) { enc_bool(e, bit, f); }

void msac_literal(MsacEnc *e, unsigned value, int bits) {
    for (int i = bits - 1; i >= 0; i--) enc_bool(e, (value >> i) & 1, 16384);
}

// ---------------------------------------------------------------------------
// coefficient tokenizer (spec 5.11.39 + 8.3.2 context derivations)
// ---------------------------------------------------------------------------

namespace {

constexpr int NUM_BASE_LEVELS = 2;
constexpr int COEFF_BASE_RANGE = 12;
constexpr int BR_CDF_SIZE = 4;
constexpr int MAX_KNOWN = 15;
constexpr int SIG_2D = 26;

inline int base_ctx_offset_2d(int row, int col, int w, int h) {
    if ((row | col) == 0) return 0;
    if (w < h && row < 2) return 11;
    if (w > h && col < 2) return 16;
    if (row + col < 2) return 1;
    if (row + col < 4) return 6;
    return 21;
}

// neighbor sets per tx class
static const int NB_BASE[3][5][2] = {
    {{0, 1}, {1, 0}, {1, 1}, {0, 2}, {2, 0}},
    {{0, 1}, {0, 2}, {0, 3}, {0, 4}, {0, 5}},
    {{1, 0}, {2, 0}, {3, 0}, {4, 0}, {5, 0}},
};
static const int NB_BR[3][3][2] = {
    {{0, 1}, {1, 0}, {1, 1}},
    {{0, 1}, {0, 2}, {0, 3}},
    {{1, 0}, {2, 0}, {3, 0}},
};
static const int OFF_1D[3] = {0, 5, 10};

inline int base_ctx(const uint8_t *known, int row, int col, int w, int h, int txc) {
    if (txc == 0 && (row | col) == 0) return 0;
    int mag = 0;
    for (int k = 0; k < 5; k++) {
        int r = row + NB_BASE[txc][k][0], c = col + NB_BASE[txc][k][1];
        if (r < h && c < w) {
            int l = known[r * w + c];
            mag += l < 3 ? l : 3;
        }
    }
    int ctx = (mag + 1) >> 1;
    if (ctx > 4) ctx = 4;
    if (txc == 0) return ctx + base_ctx_offset_2d(row, col, w, h);
    int idx = txc == 1 ? col : row;
    return SIG_2D + ctx + OFF_1D[idx < 2 ? idx : 2];
}

inline int br_ctx(const uint8_t *known, int row, int col, int w, int h, int txc) {
    int mag = 0;
    for (int k = 0; k < 3; k++) {
        int r = row + NB_BR[txc][k][0], c = col + NB_BR[txc][k][1];
        if (r < h && c < w) mag += known[r * w + c];
    }
    mag = (mag + 1) >> 1;
    if (mag > 6) mag = 6;
    if ((row | col) == 0) return mag;
    if (txc == 0) return mag + ((row < 2 && col < 2) ? 7 : 14);
    int idx = txc == 1 ? col : row;
    return mag + (idx == 0 ? 7 : 14);
}

inline void write_golomb(MsacEnc *e, int value) {
    unsigned x = value + 1;
    int len = ilog_nz(x);
    for (int i = 0; i < len - 1; i++) enc_bool(e, 0, 16384);
    for (int i = len - 1; i >= 0; i--) enc_bool(e, (x >> i) & 1, 16384);
}

}  // namespace

// levels: int32 h*w row-major.  scan: int32 indices, length w*h.
// cdf pointers: rows/tables with trailing counter slots (stride ns+1).
// Returns (cul_level << 8) | dc_category, or -1 on error.
int msac_encode_txb(
    MsacEnc *e, const int32_t *levels, int w, int h, const int32_t *scan,
    int plane_type, int tx_class, int txb_skip_ctx, int dc_sign_ctx,
    uint16_t *txb_skip_row,   // [3]
    uint16_t *eob_pt_row,     // [eob_pt_ns+1]
    int eob_pt_ns,
    uint16_t *eob_extra_tbl,  // [9][3]
    uint16_t *base_eob_tbl,   // [4][4]
    uint16_t *base_tbl,       // [42][5]
    uint16_t *br_tbl,         // [21][5]
    uint16_t *dc_sign_row,    // [3]
    int adapt, int tx_type_sym, uint16_t *tx_type_row, int tx_type_ns) {
    const int area = w * h;
    int eob = 0;
    for (int c = 0; c < area; c++)
        if (levels[scan[c]]) eob = c + 1;

    enc_symbol(e, txb_skip_row, 2, eob == 0, adapt);
    if (eob == 0) return 0;

    if (tx_type_row)  // luma tx-type signaling (spec: right after all_zero)
        enc_symbol(e, tx_type_row, tx_type_ns, tx_type_sym, adapt);

    // eob position class
    int eob_pt;
    if (eob <= 2) {
        eob_pt = eob;
    } else {
        eob_pt = ilog_nz(eob - 1) + 1;  // ceil(log2(eob)) + 1 for eob > 2
        // ceil(log2(x)) = ilog_nz(x-1) for x >= 2
    }
    enc_symbol(e, eob_pt_row, eob_pt_ns, eob_pt - 1, adapt);
    if (eob_pt >= 3) {
        const int nbits = eob_pt - 2;
        const int rem = eob - ((1 << (eob_pt - 2)) + 1);
        const int msb = (rem >> (nbits - 1)) & 1;
        enc_symbol(e, eob_extra_tbl + (eob_pt - 3) * 3, 2, msb, adapt);
        for (int i = 1; i < nbits; i++) enc_bool(e, (rem >> (nbits - 1 - i)) & 1, 16384);
    }

    uint8_t known[32 * 32];
    memset(known, 0, area);

    for (int ci = eob - 1; ci >= 0; ci--) {
        const int pos = scan[ci];
        const int row = pos / w, col = pos % w;
        int level = levels[pos];
        if (level < 0) level = -level;
        if (ci == eob - 1) {
            int ctx;
            if (ci == 0)
                ctx = 0;
            else if (ci <= area / 8)
                ctx = 1;
            else if (ci <= area / 4)
                ctx = 2;
            else
                ctx = 3;
            int s = (level < 3 ? level : 3) - 1;
            enc_symbol(e, base_eob_tbl + ctx * 4, 3, s, adapt);
        } else {
            const int ctx = base_ctx(known, row, col, w, h, tx_class);
            int s = level < 3 ? level : 3;
            enc_symbol(e, base_tbl + ctx * 5, 4, s, adapt);
        }
        if (level > NUM_BASE_LEVELS) {
            const int bctx = br_ctx(known, row, col, w, h, tx_class);
            const int base_range = level - 1 - NUM_BASE_LEVELS;
            for (int idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
                int k = base_range - idx;
                if (k > BR_CDF_SIZE - 1) k = BR_CDF_SIZE - 1;
                enc_symbol(e, br_tbl + bctx * 5, 4, k, adapt);
                if (k < BR_CDF_SIZE - 1) break;
            }
        }
        known[pos] = level < MAX_KNOWN ? level : MAX_KNOWN;
    }

    // signs + golomb extras, forward scan
    int cul = 0;
    for (int ci = 0; ci < eob; ci++) {
        const int pos = scan[ci];
        const int v = levels[pos];
        int level = v < 0 ? -v : v;
        if (level) {
            if (ci == 0)
                enc_symbol(e, dc_sign_row, 2, v < 0, adapt);
            else
                enc_bool(e, v < 0, 16384);
            if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
                write_golomb(e, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS);
        }
        cul += level;
    }
    if (cul > 63) cul = 63;
    const int dc0 = levels[0];
    const int dc_cat = dc0 == 0 ? 0 : (dc0 < 0 ? 1 : 2);
    return (cul << 8) | dc_cat;
}

}  // extern "C"
