// Native per-block intra encode: edge build, prediction, fused forward
// transform + quantize, tx-type RD, symbol coding and reconstruction for
// one leaf block — the host hot loop of the key-frame encoder.
//
// Reference analog: rav1e's write_coeffs/encode_block fast path in
// src/encoder.rs (hand-SIMD there; serial C++ here, sharing the live MSAC
// instance and the python encoder's numpy context arrays).  Byte-identical
// to the python path in rav1e_tpu/models/intra_frame.py (parity enforced
// by tests/test_native_block.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>

struct MsacEnc;  // opaque (msac.cc)

extern "C" {
void msac_symbol(MsacEnc *e, uint16_t *icdf, int nsyms, int val, int adapt);
void msac_bool(MsacEnc *e, int bit, unsigned f);
void msac_literal(MsacEnc *e, unsigned value, int bits);
int msac_encode_txb(MsacEnc *e, const int32_t *levels, int w, int h,
                    const int32_t *scan, int plane_type, int tx_class,
                    int txb_skip_ctx, int dc_sign_ctx, uint16_t *txb_skip_row,
                    uint16_t *eob_pt_row, int eob_pt_ns,
                    uint16_t *eob_extra_tbl, uint16_t *base_eob_tbl,
                    uint16_t *base_tbl, uint16_t *br_tbl, uint16_t *dc_sign_row,
                    int adapt, int tx_type_sym, uint16_t *tx_type_row,
                    int tx_type_ns);
void fdct_quant(const int32_t *resid, int w, int h, const double *Fv,
                const double *FhT, double scale, int dc_q, int ac_q, int shift,
                int bias_num, int bd, int32_t *levels_out, int32_t *dq_out,
                double thr1);
void inv_txfm(const int32_t *coeffs, int w, int h, int tx_type, int bd,
              int32_t *out);
}

namespace {

// mode ids (rav1e_tpu/ops/intra_np.py:22)
enum {
    DC_PRED = 0, V_PRED = 1, H_PRED = 2,
    D45 = 3, D135 = 4, D113 = 5, D157 = 6, D203 = 7, D67 = 8,
    SMOOTH_PRED = 9, SMOOTH_V = 10, SMOOTH_H = 11, PAETH = 12,
};
// transforms_np.py:447 (spec tx-type enum)
enum { TX_DCT_DCT = 0, TX_ADST_DCT = 1, TX_DCT_ADST = 2, TX_ADST_ADST = 3,
       TX_IDTX = 9 };
// luma tx-type RD candidates in intra_frame.TX_SET2_SYM iteration order:
// (set-2 symbol, tx type, packed-mats index; index 0 = the DCT fy_* args)
struct TTCand { int sym; int txt; int mat; };
constexpr TTCand LUMA_TT[5] = {{1, TX_DCT_DCT, 0}, {2, TX_ADST_ADST, 1},
                               {3, TX_ADST_DCT, 2}, {4, TX_DCT_ADST, 3},
                               {0, TX_IDTX, 4}};
// uv-mode RD candidates (intra_frame.UV_RD_MODES order) with the derived
// chroma tx type (spec Mode_To_Txfm_Type) and its chroma-mats pack index
// (0 DCT, 1 AA, 2 AD, 3 DA)
struct UVCand { int mode; int txt; int mat; };
constexpr UVCand UV_RD[9] = {
    {1, TX_ADST_DCT, 2},  {2, TX_DCT_ADST, 3},  {4, TX_ADST_ADST, 1},
    {5, TX_ADST_DCT, 2},  {6, TX_DCT_ADST, 3},  {9, TX_ADST_ADST, 1},
    {10, TX_ADST_DCT, 2}, {11, TX_DCT_ADST, 3}, {12, TX_ADST_ADST, 1}};
// spec Mode_To_Txfm_Type for the final chroma reconstruction
constexpr int MODE_TO_TXFM[14] = {
    TX_DCT_DCT, TX_ADST_DCT, TX_DCT_ADST, TX_DCT_DCT, TX_ADST_ADST,
    TX_ADST_DCT, TX_DCT_ADST, TX_DCT_ADST, TX_ADST_DCT, TX_ADST_ADST,
    TX_ADST_DCT, TX_DCT_ADST, TX_ADST_ADST, TX_DCT_DCT};

// registry slots (must match rav1e_tpu/ec/native_block.py)
enum {
    R_KF_Y = 0,      // u16 [5][5][14]
    R_ANGLE,         // u16 [8][8]
    R_UV,            // u16 [2][13][15]
    R_SKIP,          // u16 [3][3]
    R_TXB_SKIP,      // u16 [5][13][3]
    R_EOB16, R_EOB32, R_EOB64, R_EOB128, R_EOB256, R_EOB512, R_EOB1024,
    R_EOB_EXTRA,     // u16 [5][2][9][3]
    R_BASE_EOB,      // u16 [5][2][4][4]
    R_BASE,          // u16 [5][2][42][5]
    R_BR,            // u16 [4][2][21][5]
    R_DC_SIGN,       // u16 [2][3][3]
    R_TXTYPE2,       // u16 [4][13][6]
    R_CFL_SIGN,      // u16 [1][9]
    R_CFL_ALPHA,     // u16 [6][17]
    R_SEG_ID,        // u16 [3][9]
    R_SM_WEIGHTS,    // i32 [68] (concatenated sizes 4,8,16,32,64)
    R_DR,            // i32 dr_intra_derivative (indexed by angle)
    R_COUNT,
};
constexpr int N_CDF = 21;  // u16 tables in the registry (before SM/DR)
constexpr int UV_CFL_SYM = 13;

// intra_frame.py INTRA_MODE_CTX (intra mode -> context class)
constexpr int INTRA_MODE_CTX[13] = {0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0};
constexpr int MODE_ANGLE[13] = {0, 90, 180, 45, 135, 113, 157, 203, 67,
                                0, 0, 0, 0};

struct Ptrs {
    uint16_t *c[N_CDF];
    const int32_t *sm;
    const int32_t *dr;
};

inline const int32_t *sm_weights(const Ptrs &p, int n) {
    // intra_np.py:52 offsets for sizes 4,8,16,32,64
    int off = n == 4 ? 0 : n == 8 ? 4 : n == 16 ? 12 : n == 32 ? 28 : 60;
    return p.sm + off;
}

// numpy pairwise summation (exact replica so the float rate sums in the
// tx-type RD match the python path bit-for-bit)
double np_pairwise_sum(const double *a, int n) {
    if (n < 8) {
        double r = 0.0;
        for (int i = 0; i < n; i++) r += a[i];
        return r;
    }
    if (n <= 128) {
        double r[8] = {a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7]};
        int i;
        for (i = 8; i < n - (n % 8); i += 8)
            for (int j = 0; j < 8; j++) r[j] += a[i + j];
        double res = ((r[0] + r[1]) + (r[2] + r[3])) +
                     ((r[4] + r[5]) + (r[6] + r[7]));
        for (; i < n; i++) res += a[i];
        return res;
    }
    int n2 = n / 2;
    n2 -= n2 % 8;
    return np_pairwise_sum(a, n2) + np_pairwise_sum(a + n2, n - n2);
}

// spec 7.11.2 edge build (intra_np.py:56); above[0]/left[0] = top-left.
// n_tr/n_bl: valid pixels beyond the block edge (0 if unavailable).
void build_edges(const int32_t *rec, int stride, int x, int y, int w, int h,
                 bool have_above, bool have_left, int bd, int max_x, int max_y,
                 int64_t *above, int64_t *left, int n_tr = 0, int n_bl = 0) {
    const int base = 1 << (bd - 1);
    const int n = w + h;
    if (have_above) {
        const int32_t *row = rec + (int64_t)(y - 1) * stride;
        const int avail = w + (n_tr < h ? n_tr : h);
        for (int i = 0; i < avail; i++)
            above[1 + i] = row[x + i < max_x ? x + i : max_x];
        for (int i = avail; i < n; i++) above[1 + i] = above[avail];
    } else {
        int64_t v = have_left ? rec[(int64_t)y * stride + x - 1] : base - 1;
        for (int i = 1; i <= n; i++) above[i] = v;
    }
    if (have_left) {
        const int avail = h + (n_bl < w ? n_bl : w);
        for (int i = 0; i < avail; i++) {
            int yy = y + i < max_y ? y + i : max_y;
            left[1 + i] = rec[(int64_t)yy * stride + x - 1];
        }
        for (int i = avail; i < n; i++) left[1 + i] = left[avail];
    } else {
        int64_t v = have_above ? rec[(int64_t)(y - 1) * stride + x] : base + 1;
        for (int i = 1; i <= n; i++) left[i] = v;
    }
    int64_t tl;
    if (have_above && have_left) tl = rec[(int64_t)(y - 1) * stride + x - 1];
    else if (have_above) tl = rec[(int64_t)(y - 1) * stride + x];
    else if (have_left) tl = rec[(int64_t)y * stride + x - 1];
    else tl = base;
    above[0] = left[0] = tl;
}

void dr_predict_angle(const Ptrs &p, int p_angle, const int64_t *above,
                      const int64_t *left, int w, int h, int32_t *out);

// intra_np.py:119 predict(): DC/V/H, PAETH, SMOOTH family and all
// directional modes with angle deltas (via dr_predict_angle).
void predict(const Ptrs &p, int mode, int angle_delta,
             const int64_t *above, const int64_t *left,
             int w, int h, bool have_above, bool have_left, int bd,
             int32_t *out) {
    if (mode >= V_PRED && mode <= D67 &&
        !((mode == V_PRED || mode == H_PRED) && angle_delta == 0)) {
        dr_predict_angle(p, MODE_ANGLE[mode] + angle_delta * 3, above, left,
                         w, h, out);
        return;
    }
    const int64_t *A = above + 1;
    const int64_t *L = left + 1;
    const int64_t tl = above[0];
    const int base = 1 << (bd - 1);

    switch (mode) {
    case DC_PRED: {
        int64_t avg;
        if (have_above && have_left) {
            int64_t s = 0;
            for (int i = 0; i < w; i++) s += A[i];
            for (int i = 0; i < h; i++) s += L[i];
            avg = (s + ((w + h) >> 1)) / (w + h);
        } else if (have_above) {
            int64_t s = 0;
            for (int i = 0; i < w; i++) s += A[i];
            avg = (s + (w >> 1)) >> __builtin_ctz(w);
        } else if (have_left) {
            int64_t s = 0;
            for (int i = 0; i < h; i++) s += L[i];
            avg = (s + (h >> 1)) >> __builtin_ctz(h);
        } else {
            avg = base;
        }
        for (int i = 0; i < w * h; i++) out[i] = (int32_t)avg;
        return;
    }
    case V_PRED:
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) out[r * w + c] = (int32_t)A[c];
        return;
    case H_PRED:
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) out[r * w + c] = (int32_t)L[r];
        return;
    case PAETH:
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int64_t b = A[c] + L[r] - tl;
                int64_t pa = llabs(b - A[c]), pl = llabs(b - L[r]),
                        ptl = llabs(b - tl);
                out[r * w + c] = (int32_t)((pl <= pa && pl <= ptl)
                                               ? L[r]
                                               : (pa <= ptl ? A[c] : tl));
            }
        return;
    case SMOOTH_PRED: case SMOOTH_V: case SMOOTH_H: {
        const int32_t *wx = sm_weights(p, w);
        const int32_t *wy = sm_weights(p, h);
        int64_t below = L[h - 1], right = A[w - 1];
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int64_t v;
                if (mode == SMOOTH_PRED)
                    v = ((int64_t)wy[r] * A[c] + (256 - wy[r]) * below +
                         (int64_t)wx[c] * L[r] + (256 - wx[c]) * right + 256) >> 9;
                else if (mode == SMOOTH_V)
                    v = ((int64_t)wy[r] * A[c] + (256 - wy[r]) * below + 128) >> 8;
                else
                    v = ((int64_t)wx[c] * L[r] + (256 - wx[c]) * right + 128) >> 8;
                out[r * w + c] = (int32_t)v;
            }
        return;
    }
    default:  // unreachable: directional modes dispatched above
        return;
    }
}

// directional prediction for any p_angle (intra_np.py _dr_predict):
// zone 1 (< 90), zone 2 (90..180), zone 3 (> 180); no edge filter /
// upsampling (enable_intra_edge_filter is signalled off)
void dr_predict_angle(const Ptrs &p, int p_angle, const int64_t *above,
                      const int64_t *left, int w, int h, int32_t *out) {
    const int64_t *A = above + 1;
    const int64_t *L = left + 1;
    if (p_angle < 90) {
        int dx = p.dr[p_angle];
        int max_base_x = w + h - 1;
        for (int r = 0; r < h; r++) {
            int xpos = (r + 1) * dx;
            int base_x = xpos >> 6;
            int sh = (xpos >> 1) & 0x1F;
            for (int c = 0; c < w; c++) {
                int b = base_x + c;
                out[r * w + c] = (int32_t)(b >= max_base_x
                    ? A[max_base_x]
                    : (A[b] * (32 - sh) + A[b + 1] * sh + 16) >> 5);
            }
        }
    } else if (p_angle == 90) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) out[r * w + c] = (int32_t)A[c];
    } else if (p_angle < 180) {
        int dx = p.dr[180 - p_angle];
        int dy = p.dr[p_angle - 90];
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int xpos = (c << 6) - (r + 1) * dx;
                int bx = xpos >> 6;
                if (bx >= -1) {
                    int sh = (xpos >> 1) & 0x1F;
                    out[r * w + c] = (int32_t)((above[1 + bx] * (32 - sh) +
                                                above[2 + bx] * sh + 16) >> 5);
                } else {
                    int ypos = (r << 6) - (c + 1) * dy;
                    int by = ypos >> 6;
                    int sh = (ypos >> 1) & 0x1F;
                    out[r * w + c] = (int32_t)((left[1 + by] * (32 - sh) +
                                                left[2 + by] * sh + 16) >> 5);
                }
            }
    } else if (p_angle == 180) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) out[r * w + c] = (int32_t)L[r];
    } else {
        int dy = p.dr[270 - p_angle];
        int max_base_y = w + h - 1;
        for (int c = 0; c < w; c++) {
            int ypos = (c + 1) * dy;
            int base_y = ypos >> 6;
            int sh = (ypos >> 1) & 0x1F;
            for (int r = 0; r < h; r++) {
                int b = base_y + r;
                out[r * w + c] = (int32_t)(b >= max_base_y
                    ? L[max_base_y]
                    : (L[b] * (32 - sh) + L[b + 1] * sh + 16) >> 5);
            }
        }
    }
}

// entropy/coeffs.py:31 get_txsize_entropy_ctx (leaf tx dims are <= 32 here)
inline int tx_size_ctx(int w, int h) {
    auto lg = [](int d) {
        return d >= 64 ? 4 : d >= 32 ? 3 : d >= 16 ? 2 : d >= 8 ? 1 : 0;
    };
    return (lg(w) + lg(h) + 1) >> 1;
}

// All the symbol coding + context updates for one decided block: skip,
// modes, residual txbs, neighbor state.  Shared by the normal encode path
// and the cached pass-B replay (two-pass LR flow).
// tt is the luma tx-type SYMBOL within the DTT4_IDTX set (0 IDTX, 1 DCT,
// 2 ADST_ADST, 3 ADST_DCT, 4 DCT_ADST); uv_mode 0..12 or 13 (UV_CFL).
int code_block_symbols(
    MsacEnc *enc, const Ptrs &P,
    int x, int y, int bw, int bh, int y_mode, int skip, int tt, int uv_mode,
    int au, int av, int y_delta, int seg_symv, int seg_ctx, int seg_nsyms,
    const int32_t *lv_y, const int32_t *lv_u, const int32_t *lv_v,
    const int32_t *scan_y, const int32_t *scan_c,
    bool ha, bool hl,
    int32_t *above_mode, int32_t *left_mode,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx, int mi_cols, int mi_rows, int adapt, int q_nonzero,
    int cdef_bits, int cdef_idx)
{
    const int cx = x >> 1, cy = y >> 1, cw = bw >> 1, ch = bh >> 1;
    const int mc = x / 4, mr = y / 4;

    // ---- mode symbols (intra_frame.py:790) ----
    int skip_ctx = above_skip[mc] + left_skip[mr];
    msac_symbol(enc, P.c[R_SKIP] + skip_ctx * 3, 2, skip, adapt);
    // intra segment id follows skip (SegIdPreSkip == 0) and is omitted
    // (spatially predicted) for skip blocks
    if (seg_nsyms > 0 && !skip)
        msac_symbol(enc, P.c[R_SEG_ID] + (int64_t)seg_ctx * 9, seg_nsyms,
                    seg_symv, adapt);
    // cdef_idx literal at the first non-skip block of the 64x64 unit
    // (spec read_cdef: after skip/segment, before the mode symbols)
    if (cdef_bits > 0 && cdef_idx >= 0 && !skip)
        msac_literal(enc, (unsigned)cdef_idx, cdef_bits);

    int actx = ha ? INTRA_MODE_CTX[above_mode[mc]] : 0;
    int lctx = hl ? INTRA_MODE_CTX[left_mode[mr]] : 0;
    msac_symbol(enc, P.c[R_KF_Y] + (actx * 5 + lctx) * 14, 13, y_mode, adapt);
    if ((bw < bh ? bw : bh) >= 8 && y_mode >= V_PRED && y_mode <= D67)
        msac_symbol(enc, P.c[R_ANGLE] + (y_mode - V_PRED) * 8, 7,
                    y_delta + 3, adapt);
    int cfl_allowed = (bw > bh ? bw : bh) <= 32 ? 1 : 0;
    const int uv_cfl = uv_mode == UV_CFL_SYM ? 1 : 0;
    msac_symbol(enc, P.c[R_UV] + ((int64_t)cfl_allowed * 13 + y_mode) * 15,
                cfl_allowed ? 14 : 13, uv_mode, adapt);
    if (!uv_cfl && (bw < bh ? bw : bh) >= 8 && uv_mode >= V_PRED
        && uv_mode <= D67)
        msac_symbol(enc, P.c[R_ANGLE] + (uv_mode - V_PRED) * 8, 7,
                    0 + 3, adapt);  // uv angle delta (always 0 here)
    if (uv_cfl) {
        int su = au == 0 ? 0 : (au < 0 ? 1 : 2);
        int sv = av == 0 ? 0 : (av < 0 ? 1 : 2);
        msac_symbol(enc, P.c[R_CFL_SIGN], 8, su * 3 + sv - 1, adapt);
        if (su)
            msac_symbol(enc,
                        P.c[R_CFL_ALPHA] + ((int64_t)((su == 2) ? 3 : 0) + sv) * 17,
                        16, (au < 0 ? -au : au) - 1, adapt);
        if (sv)
            msac_symbol(enc,
                        P.c[R_CFL_ALPHA] + ((int64_t)((sv == 2) ? 3 : 0) + su) * 17,
                        16, (av < 0 ? -av : av) - 1, adapt);
    }

    // ---- residual coding (intra_frame.py:887 _residual) ----
    const int eob_area[7] = {16, 32, 64, 128, 256, 512, 1024};
    auto residual = [&](int plane, int px, int py, int tw, int th,
                        const int32_t *lv, const int32_t *scan) {
        const int ptype = plane ? 1 : 0;
        const int txs = tx_size_ctx(tw, th);
        int32_t *a_cul = (int32_t *)pctx[plane * 4 + 0];
        int32_t *l_cul = (int32_t *)pctx[plane * 4 + 1];
        int32_t *a_dc = (int32_t *)pctx[plane * 4 + 2];
        int32_t *l_dc = (int32_t *)pctx[plane * 4 + 3];
        int tctx = 0;
        if (plane) {
            bool aa = false, la = false;
            for (int i = px / 4; i < (px + tw) / 4; i++) aa |= a_cul[i] != 0;
            for (int i = py / 4; i < (py + th) / 4; i++) la |= l_cul[i] != 0;
            tctx = 7 + (aa ? 1 : 0) + (la ? 1 : 0);
        }
        int pos = 0, neg = 0;
        for (int i = px / 4; i < (px + tw) / 4; i++) {
            pos += a_dc[i] == 2;
            neg += a_dc[i] == 1;
        }
        for (int i = py / 4; i < (py + th) / 4; i++) {
            pos += l_dc[i] == 2;
            neg += l_dc[i] == 1;
        }
        const int s = pos - neg;
        const int dctx = s == 0 ? 0 : (s > 0 ? 2 : 1);
        uint16_t *tx_row = nullptr;
        int tx_sym = 1, tx_ns = 0;
        if (plane == 0 && (tw > th ? tw : th) <= 16 && q_nonzero) {
            int mn = tw < th ? tw : th;
            int txsqr = mn >= 16 ? 2 : (mn >= 8 ? 1 : 0);
            tx_row = P.c[R_TXTYPE2] + ((int64_t)txsqr * 13 + y_mode) * 6;
            tx_sym = tt;  // set-2 symbol: IDTX, DCT, AA, AD, DA
            tx_ns = 5;
        }
        // TX sizes above 32 keep only the top-left 32x32 coefficients
        // (spec 7.13.3 zero rule); contexts still index the true size
        const int ctw = tw > 32 ? 32 : tw, cth = th > 32 ? 32 : th;
        int ei = 0;
        while (eob_area[ei] < ctw * cth) ei++;
        const int eob_ns = 5 + ei;
        uint16_t *eob_row =
            P.c[R_EOB16 + ei] + (int64_t)ptype * 2 * (eob_ns + 1);
        const int txs_br = txs < 3 ? txs : 3;
        int ret = msac_encode_txb(
            enc, lv, ctw, cth, scan, ptype, 0, tctx, dctx,
            P.c[R_TXB_SKIP] + ((int64_t)txs * 13 + tctx) * 3,
            eob_row, eob_ns,
            P.c[R_EOB_EXTRA] + ((int64_t)txs * 2 + ptype) * 9 * 3,
            P.c[R_BASE_EOB] + ((int64_t)txs * 2 + ptype) * 4 * 4,
            P.c[R_BASE] + ((int64_t)txs * 2 + ptype) * 42 * 5,
            P.c[R_BR] + ((int64_t)txs_br * 2 + ptype) * 21 * 5,
            P.c[R_DC_SIGN] + ((int64_t)ptype * 3 + dctx) * 3,
            adapt, tx_sym, tx_row, tx_ns);
        const int cul = (ret >> 8) & 0xFF, dc_cat = ret & 0xFF;
        const int sub = plane ? 1 : 0;
        const int maxc = ((mi_cols * 4) >> sub) / 4;
        const int maxr = ((mi_rows * 4) >> sub) / 4;
        const int c1 = (px + tw) / 4 < maxc ? (px + tw) / 4 : maxc;
        const int r1 = (py + th) / 4 < maxr ? (py + th) / 4 : maxr;
        for (int i = px / 4; i < c1; i++) { a_cul[i] = cul; a_dc[i] = dc_cat; }
        for (int i = py / 4; i < r1; i++) { l_cul[i] = cul; l_dc[i] = dc_cat; }
    };
    auto zero_ctx = [&](int plane, int px, int py, int tw, int th) {
        const int sub = plane ? 1 : 0;
        int32_t *a_cul = (int32_t *)pctx[plane * 4 + 0];
        int32_t *l_cul = (int32_t *)pctx[plane * 4 + 1];
        int32_t *a_dc = (int32_t *)pctx[plane * 4 + 2];
        int32_t *l_dc = (int32_t *)pctx[plane * 4 + 3];
        const int maxc = ((mi_cols * 4) >> sub) / 4;
        const int maxr = ((mi_rows * 4) >> sub) / 4;
        const int c1 = (px + tw) / 4 < maxc ? (px + tw) / 4 : maxc;
        const int r1 = (py + th) / 4 < maxr ? (py + th) / 4 : maxr;
        for (int i = px / 4; i < c1; i++) { a_cul[i] = 0; a_dc[i] = 0; }
        for (int i = py / 4; i < r1; i++) { l_cul[i] = 0; l_dc[i] = 0; }
    };

    if (!skip) {
        residual(0, x, y, bw, bh, lv_y, scan_y);
        residual(1, cx, cy, cw, ch, lv_u, scan_c);
        residual(2, cx, cy, cw, ch, lv_v, scan_c);
    } else {
        zero_ctx(0, x, y, bw, bh);
        zero_ctx(1, cx, cy, cw, ch);
        zero_ctx(2, cx, cy, cw, ch);
    }

    // ---- neighbor state ----
    const int c1 = mc + bw / 4 < mi_cols ? mc + bw / 4 : mi_cols;
    const int r1 = mr + bh / 4 < mi_rows ? mr + bh / 4 : mi_rows;
    for (int i = mc; i < c1; i++) { above_mode[i] = y_mode; above_skip[i] = skip; }
    for (int i = mr; i < r1; i++) { left_mode[i] = y_mode; left_skip[i] = skip; }
    return skip | (tt << 1);
}

// -- block cache: pass A stores decisions + levels, pass B replays symbols
// without repeating prediction/transform/reconstruction (the rav1e
// WriterRecorder idea, moved down to the decision layer).
struct BlockCache {
    std::vector<int32_t> buf;
    size_t cursor = 0;
};

// quantizer deadzone bias numerator (x/32 of a step); settable for
// calibration experiments (rav1e_tpu/ops/quantize_np.QUANT_BIAS_NUM)
int g_quant_bias = 16;

}  // namespace

extern "C" {

// Encode one intra leaf block (luma y_mode + DC chroma): the full
// _block() fast path of IntraFrameEncoder (intra_frame.py:767).
// pctx: 12 pointers — per plane {above_cul, left_cul, above_dc, left_dc}
// int32 arrays in 4-sample units (SB-padded like the python ones).
// Returns skip | (tx_flag << 1)  (tx_flag: 0 DCT_DCT, 1 ADST_ADST).
int encode_intra_block(
    MsacEnc *enc, const uint64_t *reg,
    const int32_t *src_y, const int32_t *src_u, const int32_t *src_v,
    int32_t *rec_y, int32_t *rec_u, int32_t *rec_v,
    int stride_y, int stride_c,
    int x, int y, int bw, int bh,
    int have_above, int have_left,
    int max_x_y, int max_y_y, int max_x_c, int max_y_c,
    int y_mode, int dc_q, int ac_q, int bd,
    int tx_search, int q_nonzero, double lam,
    const double *fy_v, const double *fy_h, double fy_s,
    const double *mats_y_ext,  // packed AA, AD, DA, IDTX: [Fv, FhT, scale]
    const double *mats_c,      // packed DCT, AA, AD, DA at chroma dims
    int uv_search,
    const int32_t *scan_y, const int32_t *scan_c,
    int32_t *above_mode, int32_t *left_mode,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx,
    int mi_cols, int mi_rows, int adapt, int recon_only, void *cache_vp,
    int cfl, uint8_t *mi_coded, int mi_stride,
    int tx0, int ty0, int tx1, int ty1, int fine_dir,
    int seg_symv, int seg_ctx, int seg_nsyms)
{
    Ptrs P;
    for (int i = 0; i < N_CDF; i++) P.c[i] = (uint16_t *)reg[i];
    P.sm = (const int32_t *)reg[R_SM_WEIGHTS];
    P.dr = (const int32_t *)reg[R_DR];

    const int cx = x >> 1, cy = y >> 1, cw = bw >> 1, ch = bh >> 1;
    const int mc = x / 4, mr = y / 4;
    const bool ha = have_above != 0, hl = have_left != 0;

    int64_t above[132], left[132];
    static thread_local int32_t pred_y[32 * 32], pred_u[16 * 16], pred_v[16 * 16];
    static thread_local int32_t res[32 * 32];
    static thread_local int32_t lv_y[32 * 32], dq_y[32 * 32];
    static thread_local int32_t lv_u[16 * 16], dq_u[16 * 16];
    static thread_local int32_t lv_v[16 * 16], dq_v[16 * 16];
    static thread_local int32_t lv_t[32 * 32], dq_t[32 * 32], inv_t[32 * 32];
    static thread_local double lbuf[32 * 32];

    // ---- luma predict + transform (+ DCT-vs-ADST RD, intra_frame.py:853) ----
    const bool y_dir = y_mode >= V_PRED && y_mode <= D67;
    int n_tr = 0, n_bl = 0;
    if (y_dir) {  // intra_frame.py _edge_avail (decoder blockDecoded analog)
        // top-right segment = block WIDTH, bottom-left = block HEIGHT
        // (dav1d ipred_prepare); equal for squares, distinct for rect
        if (y > ty0 && x + bw < tx1 &&
            mi_coded[(int64_t)((y - 1) / 4) * mi_stride + (x + bw) / 4])
            n_tr = bw;
        if (x > tx0 && y + bh < ty1 &&
            mi_coded[(int64_t)((y + bh) / 4) * mi_stride + (x - 1) / 4])
            n_bl = bh;
    }
    build_edges(rec_y, stride_y, x, y, bw, bh, ha, hl, bd, max_x_y, max_y_y,
                above, left, n_tr, n_bl);
    int y_delta = 0;
    if (fine_dir && y_dir && (bw < bh ? bw : bh) >= 8) {
        // intra_frame.py _choose_delta: SATD (8x8 Hadamard) over
        // spec-exact edges; SATD separates structured (rate-expensive)
        // residuals from noise in a way SAD cannot (src/dist.rs get_satd)
        int64_t best_cost = -1;
        for (int d = -3; d <= 3; d++) {
            predict(P, y_mode, d, above, left, bw, bh, ha, hl, bd, pred_y);
            int64_t cost = 0;
            for (int r0 = 0; r0 < bh; r0 += 8)
                for (int c0 = 0; c0 < bw; c0 += 8) {
                    int64_t t[8][8];
                    for (int r = 0; r < 8; r++)
                        for (int c = 0; c < 8; c++)
                            t[r][c] = src_y[(int64_t)(y + r0 + r) * stride_y
                                            + x + c0 + c]
                                      - pred_y[(r0 + r) * bw + c0 + c];
                    // butterfly Hadamard along rows then columns
                    for (int r = 0; r < 8; r++)
                        for (int s = 1; s < 8; s <<= 1)
                            for (int c = 0; c < 8; c += s << 1)
                                for (int k = 0; k < s; k++) {
                                    int64_t a0 = t[r][c + k],
                                            b0 = t[r][c + k + s];
                                    t[r][c + k] = a0 + b0;
                                    t[r][c + k + s] = a0 - b0;
                                }
                    for (int c = 0; c < 8; c++)
                        for (int s = 1; s < 8; s <<= 1)
                            for (int r = 0; r < 8; r += s << 1)
                                for (int k = 0; k < s; k++) {
                                    int64_t a0 = t[r + k][c],
                                            b0 = t[r + k + s][c];
                                    t[r + k][c] = a0 + b0;
                                    t[r + k + s][c] = a0 - b0;
                                }
                    int64_t acc = 0;
                    for (int r = 0; r < 8; r++)
                        for (int c = 0; c < 8; c++)
                            acc += t[r][c] < 0 ? -t[r][c] : t[r][c];
                    cost += acc >> 2;
                }
            if (best_cost < 0 || cost < best_cost) {
                best_cost = cost;
                y_delta = d;
            }
        }
    }
    predict(P, y_mode, y_delta, above, left, bw, bh, ha, hl, bd, pred_y);
    for (int r = 0; r < bh; r++)
        for (int c = 0; c < bw; c++)
            res[r * bw + c] =
                src_y[(int64_t)(y + r) * stride_y + x + c] - pred_y[r * bw + c];
    const int shift_y = (bw * bh > 256 ? 1 : 0) + (bw * bh > 1024 ? 1 : 0);
    // packed-matrix entry stride: Fv (bh*bh) + FhT (bw*bw) + scale
    const size_t ystride = (size_t)bh * bh + (size_t)bw * bw + 1;
    int tt_sym = 1;  // DTT4_IDTX set symbol (1 = DCT_DCT)
    int tt_txt = TX_DCT_DCT;
    fdct_quant(res, bw, bh, fy_v, fy_h, fy_s, dc_q, ac_q, shift_y, g_quant_bias, bd,
               lv_y, dq_y, 0.0);
    if (tx_search && (bw > bh ? bw : bh) <= 16 && q_nonzero) {
        // full DTT4_IDTX race, mirrored on intra_frame._code_plane_tx
        // (iteration order and strict-< tie-break must match byte-for-byte)
        double best = -1.0;
        for (int cand = 0; cand < 5; cand++) {
            const int32_t *lv = lv_y, *dq = dq_y;
            if (cand) {
                const double *m = mats_y_ext + (size_t)(cand - 1) * ystride;
                fdct_quant(res, bw, bh, m, m + (size_t)bh * bh,
                           m[ystride - 1], dc_q, ac_q, shift_y, g_quant_bias, bd,
                           lv_t, dq_t, 0.0);
                lv = lv_t;
                dq = dq_t;
            }
            inv_txfm(dq, bw, bh, LUMA_TT[cand].txt, bd, inv_t);
            double dist = 0.0;
            int nz = 0;
            for (int i = 0; i < bw * bh; i++) {
                double d = (double)res[i] - inv_t[i];
                dist += d * d;
                int a = lv[i] < 0 ? -lv[i] : lv[i];
                nz += a != 0;
                lbuf[i] = log2(1.0 + (double)a);
            }
            double rate = 1.45 * nz + 0.95 * np_pairwise_sum(lbuf, bw * bh);
            double cost = dist + lam * rate;
            if (best < 0.0 || cost < best) {
                best = cost;
                tt_sym = LUMA_TT[cand].sym;
                tt_txt = LUMA_TT[cand].txt;
                if (cand) {
                    memcpy(lv_y, lv_t, sizeof(int32_t) * bw * bh);
                    memcpy(dq_y, dq_t, sizeof(int32_t) * bw * bh);
                }
            }
        }
    }

    // ---- luma reconstruct (before chroma: CFL reads it; all-zero levels
    // imply all-zero dequant, so the later skip path matches) ----
    const int maxval = (1 << bd) - 1;
    inv_txfm(dq_y, bw, bh, tt_txt, bd, inv_t);
    for (int r = 0; r < bh; r++)
        for (int c = 0; c < bw; c++) {
            int v = pred_y[r * bw + c] + inv_t[r * bw + c];
            rec_y[(int64_t)(y + r) * stride_y + x + c] =
                v < 0 ? 0 : (v > maxval ? maxval : v);
        }

    // ---- chroma DC ----
    const size_t cstride = (size_t)ch * ch + (size_t)cw * cw + 1;
    const double *fc_v = mats_c;                       // pack 0 = DCT
    const double *fc_h = mats_c + (size_t)ch * ch;
    const double fc_s = mats_c[cstride - 1];
    static thread_local int32_t res_u[16 * 16], res_v[16 * 16];
    static thread_local int64_t above_u[132], left_u[132];
    static thread_local int64_t above_v[132], left_v[132];
    build_edges(rec_u, stride_c, cx, cy, cw, ch, ha, hl, bd, max_x_c, max_y_c,
                above_u, left_u);
    predict(P, DC_PRED, 0, above_u, left_u, cw, ch, ha, hl, bd, pred_u);
    for (int r = 0; r < ch; r++)
        for (int c = 0; c < cw; c++)
            res_u[r * cw + c] =
                src_u[(int64_t)(cy + r) * stride_c + cx + c] - pred_u[r * cw + c];
    fdct_quant(res_u, cw, ch, fc_v, fc_h, fc_s, dc_q, ac_q, 0, g_quant_bias, bd, lv_u, dq_u, 0.0);
    build_edges(rec_v, stride_c, cx, cy, cw, ch, ha, hl, bd, max_x_c, max_y_c,
                above_v, left_v);
    predict(P, DC_PRED, 0, above_v, left_v, cw, ch, ha, hl, bd, pred_v);
    for (int r = 0; r < ch; r++)
        for (int c = 0; c < cw; c++)
            res_v[r * cw + c] =
                src_v[(int64_t)(cy + r) * stride_c + cx + c] - pred_v[r * cw + c];
    fdct_quant(res_v, cw, ch, fc_v, fc_h, fc_s, dc_q, ac_q, 0, g_quant_bias, bd, lv_v, dq_v, 0.0);

    auto sym_bits0 = [](const uint16_t *row, int s) {
        int fl = s == 0 ? 32768 : row[s - 1];
        int d = fl - row[s];
        if (d < 1) d = 1;
        return -log2((double)d / 32768.0);
    };
    auto plane_cost_t = [&](const int32_t *resid, const int32_t *lv,
                            const int32_t *dq, int txt) {
        inv_txfm(dq, cw, ch, txt, bd, inv_t);
        double dist = 0.0;
        int nz = 0;
        for (int i = 0; i < cw * ch; i++) {
            double d = (double)resid[i] - inv_t[i];
            dist += d * d;
            int a = lv[i] < 0 ? -lv[i] : lv[i];
            nz += a != 0;
            lbuf[i] = log2(1.0 + (double)a);
        }
        double rate = 1.45 * nz + 0.95 * np_pairwise_sum(lbuf, cw * ch);
        return dist + lam * rate;
    };

    // ---- uv-mode RD race (intra_frame._decide_chroma mirror): non-DC
    // candidates predict from the standard edges only; each transforms
    // with its DERIVED tx type (spec Mode_To_Txfm_Type).  A non-DC winner
    // pre-empts the CFL-vs-DC decision, exactly like the python path. ----
    int uv_mode = DC_PRED;
    if (uv_search && q_nonzero) {
        const int cfl_allowed_uv = (bw > bh ? bw : bh) <= 32 ? 1 : 0;
        const uint16_t *uv_row =
            P.c[R_UV] + ((int64_t)cfl_allowed_uv * 13 + y_mode) * 15;
        const bool use_delta = (bw < bh ? bw : bh) >= 8;
        static thread_local int32_t cp_u[16 * 16], cl_u[16 * 16], cq_u[16 * 16];
        static thread_local int32_t cp_v[16 * 16], cl_v[16 * 16], cq_v[16 * 16];
        static thread_local int32_t bp_u[16 * 16], blv_u[16 * 16], bq_u[16 * 16];
        static thread_local int32_t bp_v[16 * 16], blv_v[16 * 16], bq_v[16 * 16];
        static thread_local int32_t rc_c[16 * 16];
        double best = lam * sym_bits0(uv_row, DC_PRED)
                      + plane_cost_t(res_u, lv_u, dq_u, TX_DCT_DCT)
                      + plane_cost_t(res_v, lv_v, dq_v, TX_DCT_DCT);
        for (int ci = 0; ci < 9; ci++) {
            const int m = UV_RD[ci].mode;
            const double *mcp = mats_c + (size_t)UV_RD[ci].mat * cstride;
            double r = sym_bits0(uv_row, m);
            if (use_delta && m >= V_PRED && m <= D67)
                r += sym_bits0(P.c[R_ANGLE] + (int64_t)(m - V_PRED) * 8, 3);
            double cost = lam * r;
            for (int pi = 0; pi < 2; pi++) {
                const int64_t *ab = pi ? above_v : above_u;
                const int64_t *lf = pi ? left_v : left_u;
                const int32_t *sp = pi ? src_v : src_u;
                int32_t *cp = pi ? cp_v : cp_u;
                int32_t *cl = pi ? cl_v : cl_u;
                int32_t *cq = pi ? cq_v : cq_u;
                predict(P, m, 0, ab, lf, cw, ch, ha, hl, bd, cp);
                for (int rr = 0; rr < ch; rr++)
                    for (int cc = 0; cc < cw; cc++)
                        rc_c[rr * cw + cc] =
                            sp[(int64_t)(cy + rr) * stride_c + cx + cc]
                            - cp[rr * cw + cc];
                fdct_quant(rc_c, cw, ch, mcp, mcp + (size_t)ch * ch,
                           mcp[cstride - 1], dc_q, ac_q, 0, g_quant_bias, bd, cl, cq,
                           0.0);
                cost += plane_cost_t(rc_c, cl, cq, UV_RD[ci].txt);
            }
            if (cost < best) {
                best = cost;
                uv_mode = m;
                memcpy(bp_u, cp_u, sizeof(int32_t) * cw * ch);
                memcpy(blv_u, cl_u, sizeof(int32_t) * cw * ch);
                memcpy(bq_u, cq_u, sizeof(int32_t) * cw * ch);
                memcpy(bp_v, cp_v, sizeof(int32_t) * cw * ch);
                memcpy(blv_v, cl_v, sizeof(int32_t) * cw * ch);
                memcpy(bq_v, cq_v, sizeof(int32_t) * cw * ch);
            }
        }
        if (uv_mode != DC_PRED) {
            memcpy(pred_u, bp_u, sizeof(int32_t) * cw * ch);
            memcpy(lv_u, blv_u, sizeof(int32_t) * cw * ch);
            memcpy(dq_u, bq_u, sizeof(int32_t) * cw * ch);
            memcpy(pred_v, bp_v, sizeof(int32_t) * cw * ch);
            memcpy(lv_v, blv_v, sizeof(int32_t) * cw * ch);
            memcpy(dq_v, bq_v, sizeof(int32_t) * cw * ch);
        }
    }

    // ---- CFL decision (intra_frame.py _decide_chroma mirror) ----
    int au = 0, av = 0;
    if (uv_mode == DC_PRED && cfl && q_nonzero && (bw > bh ? bw : bh) <= 32) {
        static thread_local int32_t acb[16 * 16];
        static thread_local int32_t pc_u[16 * 16], lc_u[16 * 16], qc_u[16 * 16];
        static thread_local int32_t pc_v[16 * 16], lc_v[16 * 16], qc_v[16 * 16];
        static thread_local int32_t res_c[16 * 16];
        int64_t acsum = 0;
        for (int r = 0; r < ch; r++)
            for (int c = 0; c < cw; c++) {
                const int32_t *p0 = rec_y + (int64_t)(y + 2 * r) * stride_y + x + 2 * c;
                int64_t s = (int64_t)p0[0] + p0[1] + p0[stride_y] + p0[stride_y + 1];
                int64_t L = s << 1;
                acb[r * cw + c] = (int32_t)L;
                acsum += L;
            }
        const int log2sz = __builtin_ctz(cw * ch);
        const int64_t avg = (acsum + (1ll << (log2sz - 1))) >> log2sz;
        int64_t a_den = 0;
        for (int i = 0; i < cw * ch; i++) {
            acb[i] -= (int32_t)avg;
            a_den += (int64_t)acb[i] * acb[i];
        }
        auto plane_cost = [&](const int32_t *resid, const int32_t *lv,
                              const int32_t *dq) {
            inv_txfm(dq, cw, ch, TX_DCT_DCT, bd, inv_t);
            double dist = 0.0;
            int nz = 0;
            for (int i = 0; i < cw * ch; i++) {
                double d = (double)resid[i] - inv_t[i];
                dist += d * d;
                int a = lv[i] < 0 ? -lv[i] : lv[i];
                nz += a != 0;
                lbuf[i] = log2(1.0 + (double)a);
            }
            double rate = 1.45 * nz + 0.95 * np_pairwise_sum(lbuf, cw * ch);
            return dist + lam * rate;
        };
        auto sym_bits = [](const uint16_t *row, int s) {
            int fl = s == 0 ? 32768 : row[s - 1];
            int d = fl - row[s];
            if (d < 1) d = 1;
            return -log2((double)d / 32768.0);
        };
        double cost_dc = 0.0, cost_cfl = 0.0;
        int alphas[2] = {0, 0};
        const int32_t *resids[2] = {res_u, res_v};
        const int32_t *preds[2] = {pred_u, pred_v};
        const int32_t *lvs[2] = {lv_u, lv_v};
        const int32_t *dqs[2] = {dq_u, dq_v};
        const int32_t *srcs_base[2] = {src_u, src_v};
        int32_t *cand_p[2] = {pc_u, pc_v};
        int32_t *cand_l[2] = {lc_u, lc_v};
        int32_t *cand_q[2] = {qc_u, qc_v};
        for (int pi = 0; pi < 2; pi++) {
            int alpha = 0;
            if (a_den) {
                int64_t num = 0;
                for (int i = 0; i < cw * ch; i++)
                    num += (int64_t)resids[pi][i] * acb[i];
                double af = nearbyint(64.0 * (double)num / (double)a_den);
                if (af < -16.0) af = -16.0;
                if (af > 16.0) af = 16.0;
                alpha = (int)af;
            }
            double c_dc = plane_cost(resids[pi], lvs[pi], dqs[pi]);
            cost_dc += c_dc;
            if (alpha == 0) {
                cost_cfl += c_dc;
                continue;
            }
            for (int i = 0; i < cw * ch; i++) {
                int64_t prod = (int64_t)alpha * acb[i];
                int64_t sc = prod > 0 ? ((prod + 32) >> 6)
                             : prod < 0 ? -((-prod + 32) >> 6) : 0;
                int64_t v = preds[pi][i] + sc;
                cand_p[pi][i] = (int32_t)(v < 0 ? 0 : (v > maxval ? maxval : v));
            }
            const int32_t *sp = srcs_base[pi];
            for (int r = 0; r < ch; r++)
                for (int c = 0; c < cw; c++)
                    res_c[r * cw + c] = sp[(int64_t)(cy + r) * stride_c + cx + c]
                                        - cand_p[pi][r * cw + c];
            fdct_quant(res_c, cw, ch, fc_v, fc_h, fc_s, dc_q, ac_q, 0, g_quant_bias, bd,
                       cand_l[pi], cand_q[pi], 0.0);
            cost_cfl += plane_cost(res_c, cand_l[pi], cand_q[pi]);
            alphas[pi] = alpha;
        }
        if (alphas[0] || alphas[1]) {
            const uint16_t *uv_row = P.c[R_UV] + ((int64_t)1 * 13 + y_mode) * 15;
            int su = alphas[0] == 0 ? 0 : (alphas[0] < 0 ? 1 : 2);
            int sv = alphas[1] == 0 ? 0 : (alphas[1] < 0 ? 1 : 2);
            double rate_dc = sym_bits(uv_row, DC_PRED);
            double rate_cfl = sym_bits(uv_row, UV_CFL_SYM);
            rate_cfl += sym_bits(P.c[R_CFL_SIGN], su * 3 + sv - 1);
            if (su)
                rate_cfl += sym_bits(
                    P.c[R_CFL_ALPHA] + ((int64_t)((su == 2) ? 3 : 0) + sv) * 17,
                    (alphas[0] < 0 ? -alphas[0] : alphas[0]) - 1);
            if (sv)
                rate_cfl += sym_bits(
                    P.c[R_CFL_ALPHA] + ((int64_t)((sv == 2) ? 3 : 0) + su) * 17,
                    (alphas[1] < 0 ? -alphas[1] : alphas[1]) - 1);
            if (cost_cfl + lam * rate_cfl < cost_dc + lam * rate_dc) {
                au = alphas[0];
                av = alphas[1];
                if (au) {
                    memcpy(pred_u, pc_u, sizeof(int32_t) * cw * ch);
                    memcpy(lv_u, lc_u, sizeof(int32_t) * cw * ch);
                    memcpy(dq_u, qc_u, sizeof(int32_t) * cw * ch);
                }
                if (av) {
                    memcpy(pred_v, pc_v, sizeof(int32_t) * cw * ch);
                    memcpy(lv_v, lc_v, sizeof(int32_t) * cw * ch);
                    memcpy(dq_v, qc_v, sizeof(int32_t) * cw * ch);
                }
            }
        }
    }

    if (au || av) uv_mode = UV_CFL_SYM;

    bool any = false;
    for (int i = 0; i < bw * bh && !any; i++) any = lv_y[i] != 0;
    for (int i = 0; i < cw * ch && !any; i++) any = lv_u[i] != 0;
    for (int i = 0; i < cw * ch && !any; i++) any = lv_v[i] != 0;
    const int skip = any ? 0 : 1;

    if (recon_only) {
        // throwaway decision sweep (pass A of the two-pass LR flow):
        // decisions + recon only, no symbols / context updates.  With a
        // cache, the levels + decisions are stored so pass B can replay
        // the symbols without repeating prediction/transform work.
        if (cache_vp) {
            BlockCache *bc = (BlockCache *)cache_vp;
            int32_t hdr[15] = {x, y, bw, bh, y_mode, skip, tt_sym,
                               (have_above << 1) | have_left, au, av, y_delta,
                               seg_symv, seg_ctx, seg_nsyms, uv_mode};
            bc->buf.insert(bc->buf.end(), hdr, hdr + 15);
            if (!skip) {
                bc->buf.insert(bc->buf.end(), lv_y, lv_y + bw * bh);
                bc->buf.insert(bc->buf.end(), lv_u, lv_u + cw * ch);
                bc->buf.insert(bc->buf.end(), lv_v, lv_v + cw * ch);
            }
        }
        if (skip) {
            memset(dq_y, 0, sizeof(int32_t) * bw * bh);
            memset(dq_u, 0, sizeof(int32_t) * cw * ch);
            memset(dq_v, 0, sizeof(int32_t) * cw * ch);
        }
    } else {
        code_block_symbols(enc, P, x, y, bw, bh, y_mode, skip, tt_sym,
                           uv_mode, au, av,
                           y_delta, seg_symv, seg_ctx, seg_nsyms,
                           lv_y, lv_u, lv_v, scan_y, scan_c, ha, hl,
                           above_mode, left_mode, above_skip, left_skip,
                           pctx, mi_cols, mi_rows, adapt, q_nonzero, 0, -1);
        if (skip) {
            memset(dq_u, 0, sizeof(int32_t) * cw * ch);
            memset(dq_v, 0, sizeof(int32_t) * cw * ch);
        }
    }

    // decoder blockDecoded analog: mark this block's mi region coded
    for (int r = mr; r < mr + bh / 4; r++)
        for (int c2 = mc; c2 < mc + bw / 4; c2++)
            mi_coded[(int64_t)r * mi_stride + c2] = 1;

    // ---- chroma reconstruct (tx type DERIVED from the uv mode) ----
    const int uv_txt = MODE_TO_TXFM[uv_mode];
    inv_txfm(dq_u, cw, ch, uv_txt, bd, inv_t);
    for (int r = 0; r < ch; r++)
        for (int c = 0; c < cw; c++) {
            int v = pred_u[r * cw + c] + inv_t[r * cw + c];
            rec_u[(int64_t)(cy + r) * stride_c + cx + c] =
                v < 0 ? 0 : (v > maxval ? maxval : v);
        }
    inv_txfm(dq_v, cw, ch, uv_txt, bd, inv_t);
    for (int r = 0; r < ch; r++)
        for (int c = 0; c < cw; c++) {
            int v = pred_v[r * cw + c] + inv_t[r * cw + c];
            rec_v[(int64_t)(cy + r) * stride_c + cx + c] =
                v < 0 ? 0 : (v > maxval ? maxval : v);
        }

    return skip | (tt_sym << 1);
}

void *block_cache_new(void) { return new BlockCache(); }

void set_quant_bias(int b) { g_quant_bias = b; }

// Append pre-serialized block records (the device wavefront pass's output,
// already in the cache's native int32 layout: 15-int header + levels when
// not skipped).  One call per contiguous run of device superblocks.
void block_cache_push_raw(void *c, const int32_t *data, long n) {
    BlockCache *bc = (BlockCache *)c;
    bc->buf.insert(bc->buf.end(), data, data + n);
}
void block_cache_free(void *c) { delete (BlockCache *)c; }
void block_cache_reset(void *c) {
    BlockCache *bc = (BlockCache *)c;
    bc->buf.clear();
    bc->cursor = 0;
}
void block_cache_rewind(void *c) { ((BlockCache *)c)->cursor = 0; }

// 1 if the next cached record is block (x, y, bw, bh)
int cached_block_peek(void *c, int x, int y, int bw, int bh) {
    BlockCache *bc = (BlockCache *)c;
    if (bc->cursor + 15 > bc->buf.size()) return 0;
    const int32_t *h = &bc->buf[bc->cursor];
    return h[0] == x && h[1] == y && h[2] == bw && h[3] == bh;
}

namespace {

// One cached block's symbols (shared by encode_cached_block and the
// whole-SB walk).  Returns skip|(tt<<1) or -1 on cache desync.
int replay_one(BlockCache *bc, MsacEnc *enc, const Ptrs &P,
               int x, int y, int bw, int bh,
               const uint64_t *scans,  // scans[(lw-2)*4 + (lh-2)]
               int32_t *above_mode, int32_t *left_mode,
               int32_t *above_skip, int32_t *left_skip,
               const uint64_t *pctx, int mi_cols, int mi_rows, int adapt,
               int q_nonzero, int cdef_bits, int *cdef_pending, int cdef_idx) {
    if (bc->cursor + 15 > bc->buf.size()) return -1;
    const int32_t *hd = &bc->buf[bc->cursor];
    if (hd[0] != x || hd[1] != y || hd[2] != bw || hd[3] != bh) return -1;
    const int y_mode = hd[4], skip = hd[5], tt = hd[6], hal = hd[7];
    const int au = hd[8], av = hd[9], y_delta = hd[10];
    const int seg_symv = hd[11], seg_ctx = hd[12], seg_nsyms = hd[13];
    const int uv_mode = hd[14];
    bc->cursor += 15;
    const int cw = bw >> 1, ch = bh >> 1;
    // coded level counts: TX sizes above 32 store only the 32x32 corner
    const size_t ny = (size_t)(bw > 32 ? 32 : bw) * (bh > 32 ? 32 : bh);
    const size_t nc = (size_t)(cw > 32 ? 32 : cw) * (ch > 32 ? 32 : ch);
    const int32_t *lv_y = nullptr, *lv_u = nullptr, *lv_v = nullptr;
    if (!skip) {
        lv_y = &bc->buf[bc->cursor];
        lv_u = lv_y + ny;
        lv_v = lv_u + nc;
        bc->cursor += ny + 2 * nc;
    }
    // scans cover the CODED grid (clamped at 32 for TX_64X64)
    auto lg = [](int d) { return d >= 32 ? 3 : d >= 16 ? 2 : d >= 8 ? 1 : 0; };
    const int32_t *scan_y = (const int32_t *)scans[lg(bw) * 4 + lg(bh)];
    const int32_t *scan_c = (const int32_t *)scans[lg(cw) * 4 + lg(ch)];
    int clit = -1;
    if (!skip && cdef_bits > 0 && cdef_pending && *cdef_pending) {
        clit = cdef_idx;
        *cdef_pending = 0;
    }
    return code_block_symbols(enc, P, x, y, bw, bh, y_mode, skip, tt, uv_mode,
                              au, av, y_delta, seg_symv, seg_ctx, seg_nsyms,
                              lv_y, lv_u, lv_v, scan_y, scan_c,
                              (hal >> 1) != 0, (hal & 1) != 0,
                              above_mode, left_mode, above_skip, left_skip,
                              pctx, mi_cols, mi_rows, adapt, q_nonzero,
                              cdef_bits, clit);
}

// partition context bytes per (bw, bh): intra_frame._PART_CTX_RECT
struct PartCtx { int ab, lf; };
inline PartCtx part_ctx_rect(int bw, int bh) {
    auto v = [](int n) { return n == 4 ? 31 : n == 8 ? 30 : n == 16 ? 28
                                : n == 32 ? 24 : 16; };
    return {v(bw), v(bh)};  // above byte keyed by width, left by height
}

struct SbWalk {
    BlockCache *bc;
    MsacEnc *enc;
    const Ptrs *P;
    const uint64_t *scans;
    int32_t *above_part, *left_part;
    int32_t *above_mode, *left_mode, *above_skip, *left_skip;
    const uint64_t *pctx;
    uint16_t *part_cdf;  // (20, 11)
    const uint8_t *split32;
    int split_stride;
    int rdo_partition;
    const uint8_t *split16 = nullptr;
    int split16_stride = 0;
    int rdo_split8 = 0;
    const uint8_t *none64 = nullptr;  // per-SB: code PARTITION_NONE at 64
    int none64_stride = 0;
    int mi_cols, mi_rows, adapt, q_nonzero;
    int tx0, ty0, tx1, ty1;
    int cdef_bits = 0, cdef_pending = 0, cdef_idx = -1;
    int err = 0;

    void gather_bool(int bit, const uint16_t *row, const int *pset, int nset,
                     int nsyms) {
        int total = 0;
        for (int i = 0; i < nset; i++) {
            int p = pset[i];
            if (p >= nsyms) continue;
            int hi = p == 0 ? 32768 : row[p - 1];
            total += hi - row[p];
        }
        if (total < 1) total = 1;
        if (total > 32767) total = 32767;
        msac_bool(enc, bit, (unsigned)total);
    }

    void block(int x, int y, int bw, int bh) {
        if (err) return;
        int r = replay_one(bc, enc, *P, x, y, bw, bh, scans, above_mode,
                           left_mode, above_skip, left_skip, pctx, mi_cols,
                           mi_rows, adapt, q_nonzero,
                           cdef_bits, &cdef_pending, cdef_idx);
        if (r < 0) err = 1;
    }

    // intra_frame._partition, replay flavor (want_split from the split map)
    void partition(int x, int y, int size) {
        if (err) return;
        const int mc = x / 4, mr = y / 4;
        if (mc >= mi_cols || mr >= mi_rows) return;
        const int bsl = size == 8 ? 1 : size == 16 ? 2 : size == 32 ? 3 : 4;
        const int half_mi = size / 8;
        const bool has_rows = (mr + half_mi) < mi_rows;
        const bool has_cols = (mc + half_mi) < mi_cols;
        const int ctx = (((left_part[mr] >> (bsl - 1)) & 1) << 1)
                        | ((above_part[mc] >> (bsl - 1)) & 1);
        uint16_t *row = part_cdf + ((int64_t)(bsl - 1) * 4 + ctx) * 11;
        const int nsyms = size == 8 ? 4 : 10;
        bool want_split;
        if (size > 32) {
            want_split = !(none64 && has_rows && has_cols
                           && none64[(int64_t)(y / 64) * none64_stride
                                     + x / 64]);
        } else if (size == 32 && rdo_partition && has_rows && has_cols) {
            want_split = split32[(int64_t)(y / 32) * split_stride + x / 32] != 0;
        } else if (size == 16 && rdo_split8 && split16 && has_rows
                   && has_cols) {
            want_split =
                split16[(int64_t)(y / 16) * split16_stride + x / 16] != 0;
        } else {
            want_split = false;
        }
        static const int TOP_SET[] = {2, 3, 4, 6, 7, 9};
        static const int LEFT_SET[] = {1, 3, 4, 5, 6, 8};
        int part;  // P_NONE=0 HORZ=1 VERT=2 SPLIT=3
        if (has_rows && has_cols) {
            part = want_split ? 3 : 0;
            msac_symbol(enc, row, nsyms, part, adapt);
        } else if (has_cols) {
            part = want_split ? 3 : 1;
            gather_bool(part == 3 ? 1 : 0, row, TOP_SET, 6, nsyms);
        } else if (has_rows) {
            part = want_split ? 3 : 2;
            gather_bool(part == 3 ? 1 : 0, row, LEFT_SET, 6, nsyms);
        } else {
            part = 3;  // implied, nothing coded
        }
        const int half = size / 2;
        if (part == 3) {
            partition(x, y, half);
            partition(x + half, y, half);
            partition(x, y + half, half);
            partition(x + half, y + half, half);
            return;
        }
        int bw = size, bh = size;
        if (part == 1) bh = half;
        if (part == 2) bw = half;
        block(x, y, bw, bh);
        if (part == 1 && (mr + half_mi) < mi_rows) block(x, y + half, bw, bh);
        if (part == 2 && (mc + half_mi) < mi_cols) block(x + half, y, bw, bh);
        PartCtx pc = part_ctx_rect(bw, bh);
        const int n4 = size / 4;
        const int c1 = mc + n4 < mi_cols ? mc + n4 : mi_cols;
        const int r1 = mr + n4 < mi_rows ? mr + n4 : mi_rows;
        for (int i = mc; i < c1; i++) above_part[i] = pc.ab;
        for (int i = mr; i < r1; i++) left_part[i] = pc.lf;
    }
};

}  // namespace

// Replay a whole superblock from the cache: partition symbols from the
// live CDFs + cached block symbols (the pass-B hot path; the python walk
// costs ~0.5s/frame at 1080p, this runs it in C++).  Returns 0, or -1 on
// cache desync.
int encode_sb_cached(
    void *cache, MsacEnc *enc, const uint64_t *reg,
    int sb_x, int sb_y, int mi_cols, int mi_rows, int adapt, int q_nonzero,
    int tx0, int ty0, int tx1, int ty1,
    const uint64_t *scans,
    int32_t *above_part, int32_t *left_part,
    int32_t *above_mode, int32_t *left_mode,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx, uint16_t *part_cdf,
    const uint8_t *split32, int split_stride, int rdo_partition,
    const uint8_t *split16, int split16_stride, int rdo_split8,
    const uint8_t *none64, int none64_stride,
    int cdef_bits, int cdef_idx)
{
    Ptrs P;
    for (int i = 0; i < N_CDF; i++) P.c[i] = (uint16_t *)reg[i];
    P.sm = (const int32_t *)reg[R_SM_WEIGHTS];
    P.dr = (const int32_t *)reg[R_DR];
    SbWalk w;
    w.bc = (BlockCache *)cache;
    w.enc = enc;
    w.P = &P;
    w.scans = scans;
    w.above_part = above_part;
    w.left_part = left_part;
    w.above_mode = above_mode;
    w.left_mode = left_mode;
    w.above_skip = above_skip;
    w.left_skip = left_skip;
    w.pctx = pctx;
    w.part_cdf = part_cdf;
    w.split32 = split32;
    w.split_stride = split_stride;
    w.rdo_partition = rdo_partition;
    w.split16 = split16;
    w.split16_stride = split16_stride;
    w.rdo_split8 = rdo_split8;
    w.none64 = none64;
    w.none64_stride = none64_stride;
    w.mi_cols = mi_cols;
    w.mi_rows = mi_rows;
    w.adapt = adapt;
    w.q_nonzero = q_nonzero;
    w.tx0 = tx0;
    w.ty0 = ty0;
    w.tx1 = tx1;
    w.ty1 = ty1;
    w.cdef_bits = cdef_bits;
    w.cdef_pending = cdef_bits > 0 && cdef_idx >= 0 ? 1 : 0;
    w.cdef_idx = cdef_idx;
    w.partition(sb_x, sb_y, 64);
    return w.err ? -1 : 0;
}

// Replay the next cached block's symbols (pass B of the two-pass LR flow).
// Returns skip | (tt << 1), or -1 if the cursor record does not match.
int encode_cached_block(
    void *c, MsacEnc *enc, const uint64_t *reg,
    int x, int y, int bw, int bh,
    const int32_t *scan_y, const int32_t *scan_c,
    int32_t *above_mode, int32_t *left_mode,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx, int mi_cols, int mi_rows, int adapt, int q_nonzero,
    int cdef_bits, int cdef_idx)
{
    BlockCache *bc = (BlockCache *)c;
    if (bc->cursor + 15 > bc->buf.size()) return -1;
    const int32_t *h = &bc->buf[bc->cursor];
    if (h[0] != x || h[1] != y || h[2] != bw || h[3] != bh) return -1;
    const int y_mode = h[4], skip = h[5], tt = h[6], hal = h[7];
    const int au = h[8], av = h[9], y_delta = h[10];
    const int seg_symv = h[11], seg_ctx = h[12], seg_nsyms = h[13];
    const int uv_mode = h[14];
    bc->cursor += 15;
    const int cw = bw >> 1, ch = bh >> 1;
    // coded level counts: TX sizes above 32 store only the 32x32 corner
    const size_t ny = (size_t)(bw > 32 ? 32 : bw) * (bh > 32 ? 32 : bh);
    const size_t nc = (size_t)(cw > 32 ? 32 : cw) * (ch > 32 ? 32 : ch);
    const int32_t *lv_y = nullptr, *lv_u = nullptr, *lv_v = nullptr;
    if (!skip) {
        lv_y = &bc->buf[bc->cursor];
        lv_u = lv_y + ny;
        lv_v = lv_u + nc;
        bc->cursor += ny + 2 * nc;
    }
    Ptrs P;
    for (int i = 0; i < N_CDF; i++) P.c[i] = (uint16_t *)reg[i];
    P.sm = (const int32_t *)reg[R_SM_WEIGHTS];
    P.dr = (const int32_t *)reg[R_DR];
    return code_block_symbols(enc, P, x, y, bw, bh, y_mode, skip, tt, uv_mode,
                              au, av, y_delta, seg_symv, seg_ctx, seg_nsyms,
                              lv_y, lv_u, lv_v, scan_y, scan_c,
                              (hal >> 1) != 0, (hal & 1) != 0,
                              above_mode, left_mode, above_skip, left_skip,
                              pctx, mi_cols, mi_rows, adapt, q_nonzero,
                              cdef_bits, cdef_idx);
}

// Serialize a run of device-wavefront superblocks straight into the
// BlockCache in decode order (z-order quads / 16-leaves / 8-leaves),
// replacing the per-block Python loop of
// rav1e_tpu/models/intra_frame.py::_push_device_sb.  Also fills the
// deblock-info mi maps, marks mi_coded, and accumulates block stats.
//
// packed: the wavefront pass's raw int16 output, (K, 4, B, 1688) where
//   [0:152] is metadata and [152:1176]/[1176:1432]/[1432:1688] are the
//   Y/U/V quantized level buffers (see wavefront.py `run`).
// avail: (K, B, 4, 5, 4) int32 (ha, hl, n_tr, n_bl); slot 0 = the 32x32
//   quad, slots 1..4 its 16x16 leaves.  avail8: (K, B, 4, 4, 4, 4).
// stat_out: [0:13] mode counts, [13] blocks8, [14] blocks16, [15] blocks32,
//   [16] skip, [17] cfl, [18] adst, [19] total blocks, [20] blocks64.
//
// A quad-0 record with meta[0] == 2 marks the whole SB as a single
// 64x64 block (PARTITION_NONE at the SB root): its header fields are in
// quad 0's meta slots, the TX_64X64 luma levels (32x32 corner) in quad
// 0's lv_y, and the 32x32 chroma levels in quads 1/2's lv_y slots.
void wavefront_cache_push_run(
    void *cache, const int16_t *packed,
    const int32_t *avail, const int32_t *avail8,
    const int32_t *steps, const int32_t *lanes,
    const int32_t *rows, const int32_t *cols,
    int nsb, int B, int rdo_split8,
    int32_t *db_txw, int32_t *db_txh, int32_t *db_bx, int32_t *db_by,
    uint8_t *db_skip, int mi_cols_a, int mi_rows_a,
    uint8_t *mi_coded, int mic_cols, int mic_rows,
    int64_t *stat_out)
{
    BlockCache *bc = (BlockCache *)cache;
    bc->buf.reserve(bc->buf.size() + (size_t)nsb * 4 * (15 + 1536));
    static const int QOFF[4][2] = {{0, 0}, {0, 32}, {32, 0}, {32, 32}};
    static const int SOFF[4][2] = {{0, 0}, {0, 16}, {16, 0}, {16, 16}};
    static const int SOFF8[4][2] = {{0, 0}, {0, 8}, {8, 0}, {8, 8}};

    // one block: header + (when coded) int16 -> int32 level copy,
    // deblock-map fill and stats
    auto emit = [&](const int16_t *m, int fofs, const int16_t *ly,
                    const int16_t *lu, const int16_t *lvv,
                    int x, int y, int bw, int bh, int ha, int hl) {
        const int mode = m[fofs + 0], delta = m[fofs + 1], tt = m[fofs + 2];
        const int skip = m[fofs + 3] != 0, au = m[fofs + 4], av = m[fofs + 5];
        const int uv = m[fofs + 6];
        int32_t hdr[15] = {x, y, bw, bh, mode, skip, tt, (ha << 1) | hl,
                           au, av, delta, 0, 0, 0, uv};
        bc->buf.insert(bc->buf.end(), hdr, hdr + 15);
        if (!skip) {
            // coded level counts (TX above 32 keeps the 32x32 corner)
            const int ny = (bw > 32 ? 32 : bw) * (bh > 32 ? 32 : bh);
            const int nc = ((bw >> 1) > 32 ? 32 : (bw >> 1))
                           * ((bh >> 1) > 32 ? 32 : (bh >> 1));
            size_t o = bc->buf.size();
            bc->buf.resize(o + ny + 2 * nc);
            int32_t *dst = &bc->buf[o];
            for (int i = 0; i < ny; i++) dst[i] = ly[i];
            dst += ny;
            for (int i = 0; i < nc; i++) dst[i] = lu[i];
            dst += nc;
            for (int i = 0; i < nc; i++) dst[i] = lvv[i];
        }
        // deblock edge state (DeblockInfo.set_block with txw=bw, txh=bh)
        int r1 = (y + bh) >> 2, c1 = (x + bw) >> 2;
        if (r1 > mi_rows_a) r1 = mi_rows_a;
        if (c1 > mi_cols_a) c1 = mi_cols_a;
        for (int r = y >> 2; r < r1; r++) {
            int64_t base = (int64_t)r * mi_cols_a;
            for (int cdx = x >> 2; cdx < c1; cdx++) {
                db_txw[base + cdx] = bw;
                db_txh[base + cdx] = bh;
                db_bx[base + cdx] = x;
                db_by[base + cdx] = y;
                db_skip[base + cdx] = (uint8_t)skip;
            }
        }
        stat_out[mode]++;
        stat_out[bw == 8 ? 13 : (bw == 16 ? 14 : (bw == 32 ? 15 : 20))]++;
        stat_out[16] += skip;
        stat_out[17] += uv == 13;  // UV_CFL_PRED
        stat_out[18] += tt == 2;
        stat_out[19]++;
        // [21..25]: per-DTT4_IDTX-symbol counts (0 IDTX, 1 DCT_DCT,
        // 2 ADST_ADST, 3 ADST_DCT, 4 DCT_ADST)
        if (tt >= 0 && tt <= 4) stat_out[21 + tt]++;
    };

    for (int i = 0; i < nsb; i++) {
        const int k = steps[i], li = lanes[i];
        const int sy = rows[i] * 64, sx = cols[i] * 64;
        const int16_t *rec0 = packed + ((size_t)(k * 4 + 0) * B + li) * 1688;
        if (rec0[0] == 2) {  // whole SB is one 64x64 block
            const int16_t *rec1 = rec0 + (size_t)B * 1688;
            const int16_t *rec2 = rec1 + (size_t)B * 1688;
            const int32_t *avq = avail + ((((size_t)k * B + li) * 4) * 5) * 4;
            emit(rec0, 1, rec0 + 152, rec1 + 152, rec2 + 152,
                 sx, sy, 64, 64, avq[0], avq[1]);
            int r1 = (sy + 64) >> 2, c1 = (sx + 64) >> 2;
            if (r1 > mic_rows) r1 = mic_rows;
            if (c1 > mic_cols) c1 = mic_cols;
            for (int r = sy >> 2; r < r1; r++)
                memset(mi_coded + (int64_t)r * mic_cols + (sx >> 2), 1,
                       c1 - (sx >> 2));
            continue;
        }
        for (int q = 0; q < 4; q++) {
            const int16_t *rec = packed +
                ((size_t)(k * 4 + q) * B + li) * 1688;
            const int32_t *avq = avail + ((((size_t)k * B + li) * 4 + q)
                                          * 5) * 4;
            const int qx = sx + QOFF[q][1], qy = sy + QOFF[q][0];
            const int16_t *ly = rec + 152, *lu = rec + 1176,
                          *lv = rec + 1432;
            if (!rec[0]) {  // meta[0] = split32
                emit(rec, 1, ly, lu, lv, qx, qy, 32, 32, avq[0], avq[1]);
                continue;
            }
            for (int s = 0; s < 4; s++) {
                const int x16 = qx + SOFF[s][1], y16 = qy + SOFF[s][0];
                if (rdo_split8 && rec[8 + s]) {
                    const int32_t *av8 = avail8 +
                        (((((size_t)k * B + li) * 4 + q) * 4 + s) * 4) * 4;
                    for (int e = 0; e < 4; e++)
                        emit(rec, 40 + (s * 4 + e) * 7,
                             ly + s * 256 + e * 64, lu + s * 64 + e * 16,
                             lv + s * 64 + e * 16,
                             x16 + SOFF8[e][1], y16 + SOFF8[e][0], 8, 8,
                             av8[e * 4], av8[e * 4 + 1]);
                    continue;
                }
                emit(rec, 12 + s * 7, ly + s * 256, lu + s * 64,
                     lv + s * 64, x16, y16, 16, 16,
                     avq[(1 + s) * 4], avq[(1 + s) * 4 + 1]);
            }
        }
        // decoder blockDecoded analog for the whole SB
        int r1 = (sy + 64) >> 2, c1 = (sx + 64) >> 2;
        if (r1 > mic_rows) r1 = mic_rows;
        if (c1 > mic_cols) c1 = mic_cols;
        for (int r = sy >> 2; r < r1; r++)
            memset(mi_coded + (int64_t)r * mic_cols + (sx >> 2), 1,
                   c1 - (sx >> 2));
    }
}

}  // extern "C"
