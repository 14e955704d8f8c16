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
    // inter-frame tables (single-reference wavefront walk)
    R_INTRA_INTER,   // u16 [4][3]
    R_Y_MODE,        // u16 [4][14]
    R_SINGLE_REF,    // u16 [3][6][3]
    R_NEWMV,         // u16 [6][3]
    R_ZEROMV,        // u16 [2][3]
    R_REFMV,         // u16 [6][3]
    R_DRL,           // u16 [3][3]
    R_MV_JOINT,      // u16 [1][5]
    R_MV_SIGN,       // u16 [2][3]
    R_MV_CLASS,      // u16 [2][12]
    R_MV_CLASS0,     // u16 [2][3]
    R_MV_CLASS0_FP,  // u16 [2][2][5]
    R_MV_BITS,       // u16 [2][10][3]
    R_MV_FP,         // u16 [2][5]
    R_TXTYPE3,       // u16 [4][3] inter_tx_type_set3[txsqr]
    R_SM_WEIGHTS,    // i32 [68] (concatenated sizes 4,8,16,32,64)
    R_DR,            // i32 dr_intra_derivative (indexed by angle)
    R_COUNT,
};
constexpr int N_CDF = 36;  // u16 tables in the registry (before SM/DR)
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
    int nsb, int B, int rdo_split8, int nfields,
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
    // record geometry: nfields per block record (7 intra-only, 11 with
    // the inter mv nibble fields), meta then 1024+256+256 level words
    const int NF = nfields;
    const int MW = 1 + 4 + 21 * NF;
    const size_t RECW = (size_t)MW + 1536;

    // one block: header + (when coded) int16 -> int32 level copy,
    // deblock-map fill and stats
    auto emit = [&](const int16_t *m, int fofs, const int16_t *ly,
                    const int16_t *lu, const int16_t *lvv,
                    int x, int y, int bw, int bh, int ha, int hl) {
        const int mode = m[fofs + 0], delta = m[fofs + 1], tt = m[fofs + 2];
        const int skip = m[fofs + 3] != 0;
        int au = m[fofs + 4], av = m[fofs + 5];
        const int uv = m[fofs + 6];
        if (NF >= 11 && mode == 13) {
            // inter record: the au/av header slots carry the MV (1/8 pel)
            au = (m[fofs + 7] << 6) + m[fofs + 8];
            av = (m[fofs + 9] << 6) + m[fofs + 10];
        }
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
        if (mode < 13) stat_out[mode]++;
        else stat_out[26]++;  // inter blocks
        stat_out[bw == 8 ? 13 : (bw == 16 ? 14 : (bw == 32 ? 15 : 20))]++;
        stat_out[16] += skip;
        stat_out[17] += uv == 13;  // UV_CFL_PRED
        stat_out[18] += tt == 2;
        stat_out[19]++;
        // [21..25]: per-DTT4_IDTX-symbol counts (0 IDTX, 1 DCT_DCT,
        // 2 ADST_ADST, 3 ADST_DCT, 4 DCT_ADST)
        if (mode < 13 && tt >= 0 && tt <= 4) stat_out[21 + tt]++;
    };

    for (int i = 0; i < nsb; i++) {
        const int k = steps[i], li = lanes[i];
        const int sy = rows[i] * 64, sx = cols[i] * 64;
        const int16_t *rec0 = packed + ((size_t)(k * 4 + 0) * B + li) * RECW;
        if (rec0[0] == 2) {  // whole SB is one 64x64 block
            const int16_t *rec1 = rec0 + (size_t)B * RECW;
            const int16_t *rec2 = rec1 + (size_t)B * RECW;
            const int32_t *avq = avail + ((((size_t)k * B + li) * 4) * 5) * 4;
            emit(rec0, 1, rec0 + MW, rec1 + MW, rec2 + MW,
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
                ((size_t)(k * 4 + q) * B + li) * RECW;
            const int32_t *avq = avail + ((((size_t)k * B + li) * 4 + q)
                                          * 5) * 4;
            const int qx = sx + QOFF[q][1], qy = sy + QOFF[q][0];
            const int16_t *ly = rec + MW, *lu = rec + MW + 1024,
                          *lv = rec + MW + 1280;
            if (!rec[0]) {  // meta[0] = split32
                emit(rec, 1, ly, lu, lv, qx, qy, 32, 32, avq[0], avq[1]);
                continue;
            }
            for (int s = 0; s < 4; s++) {
                const int x16 = qx + SOFF[s][1], y16 = qy + SOFF[s][0];
                if (rdo_split8 && rec[1 + NF + s]) {
                    const int32_t *av8 = avail8 +
                        (((((size_t)k * B + li) * 4 + q) * 4 + s) * 4) * 4;
                    for (int e = 0; e < 4; e++)
                        emit(rec, 5 + 5 * NF + (s * 4 + e) * NF,
                             ly + s * 256 + e * 64, lu + s * 64 + e * 16,
                             lv + s * 64 + e * 16,
                             x16 + SOFF8[e][1], y16 + SOFF8[e][0], 8, 8,
                             av8[e * 4], av8[e * 4 + 1]);
                    continue;
                }
                emit(rec, 5 + NF + s * NF, ly + s * 256, lu + s * 64,
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

// ===========================================================================
// Inter-frame walk (single LAST reference): find_mv_stack + mode/MV symbol
// coding + the whole-SB replay, the C++ analog of InterFrameEncoder._block /
// _code_inter_symbols + mv_pred.find_mv_stack (rav1e analog: the inter arm
// of write_block, src/encoder.rs + the ref-MV stack of
// src/context/block_unit.rs).  Preconditions baked in: single reference
// (LAST) frames only -- the mi grid never holds a second reference, every
// inter neighbor shares the temporal side (no sign flips in the extra
// search), no temporal MVs (enable_ref_frame_mvs=0), identity global
// motion, allow_high_precision_mv=0.  Byte-parity with the python walk is
// enforced by tests/test_native_inter.py.
// ===========================================================================

namespace {

enum { M_NEARESTMV = 13, M_NEARMV = 14, M_GLOBALMV = 15, M_NEWMV = 16 };
constexpr int REF_CAT_LEVEL_C = 640;
constexpr int LAST_FRAME_C = 1;

struct InterGrid {
    int32_t *ref;       // (rows, cols)
    int32_t *mv;        // (rows, cols, 2)
    uint8_t *is_newmv;  // numpy bool_
    int32_t *bw4a, *bh4a;
    int rows, cols;

    void set_block(int mr, int mc, int bw4, int bh4, int ref_v, int mvr,
                   int mvc, int newmv) {
        const int r1 = mr + bh4 < rows ? mr + bh4 : rows;
        const int c1 = mc + bw4 < cols ? mc + bw4 : cols;
        for (int r = mr; r < r1; r++) {
            const int64_t b = (int64_t)r * cols;
            for (int c = mc; c < c1; c++) {
                ref[b + c] = ref_v;
                mv[(b + c) * 2] = mvr;
                mv[(b + c) * 2 + 1] = mvc;
                is_newmv[b + c] = (uint8_t)newmv;
                bw4a[b + c] = bw4;
                bh4a[b + c] = bh4;
            }
        }
    }
};

struct MvStack {
    int mv[8][2];
    int weight[8];
    int len;        // after the global-mv fill (>= 2)
    int num_found;  // genuine candidates before the fill
    int newmv_ctx, refmv_ctx, zeromv_ctx;
};

inline int lower_even(int v) {  // lower_mv_precision, allow_hp=0
    if (v & 1) v += v > 0 ? -1 : 1;
    return v;
}

// mv_pred.find_mv_stack, single-reference arm
void find_mv_stack_c(const InterGrid &g, int mi_row, int mi_col, int bw4,
                     int bh4, int rf, int t_r0, int t_c0, int t_r1, int t_c1,
                     MvStack &out) {
    int n = 0;
    int mvs[8][2];
    int wts[8];
    bool found = false;
    int newmv_count = 0;
    auto inside = [&](int r, int c) {
        return r >= t_r0 && r < t_r1 && c >= t_c0 && c < t_c1;
    };
    auto push = [&](int pr, int pc, int w) {
        for (int i = 0; i < n; i++)
            if (mvs[i][0] == pr && mvs[i][1] == pc) { wts[i] += w; return; }
        if (n < 8) { mvs[n][0] = pr; mvs[n][1] = pc; wts[n] = w; n++; }
    };
    auto add_cand = [&](int r, int c, int w) {
        const int64_t b = (int64_t)r * g.cols + c;
        const int cref = g.ref[b];
        if (cref <= 0 || cref != rf) return;  // NONE/INTRA or other ref
        push(lower_even(g.mv[b * 2]), lower_even(g.mv[b * 2 + 1]), w);
        if (g.is_newmv[b]) newmv_count++;
        found = true;
    };
    int processed_rows = 0, processed_cols = 0;
    auto scan_row = [&](int delta_row, int max_row_offset) {
        int delta_col = 0;
        int end4 = bw4 < g.cols - mi_col ? bw4 : g.cols - mi_col;
        if (end4 > 16) end4 = 16;
        const bool use16 = bw4 >= 16;
        if (delta_row < -1 || delta_row > 1) {
            delta_col = 1;
            if ((mi_col & 1) && bw4 < 2) delta_col -= 1;
        }
        int i = 0;
        while (i < end4) {
            const int r = mi_row + delta_row, c = mi_col + delta_col + i;
            if (!inside(r, c)) break;
            const int64_t b = (int64_t)r * g.cols + c;
            const int cand_bw4 = g.bw4a[b] > 1 ? g.bw4a[b] : 1;
            int length = bw4 < cand_bw4 ? bw4 : cand_bw4;
            if (use16) length = length > 4 ? length : 4;
            else if (delta_row < -1 || delta_row > 1)
                length = length > 2 ? length : 2;
            int weight = 2;
            if (2 <= bw4 && bw4 <= cand_bw4) {
                const int bh = g.bh4a[b] > 1 ? g.bh4a[b] : 1;
                int inc = -max_row_offset + delta_row + 1;
                if (inc > bh) inc = bh;
                if (inc > weight) weight = inc;
                processed_rows = inc - delta_row - 1;
            }
            add_cand(r, c, length * weight);
            i += length;
        }
    };
    auto scan_col = [&](int delta_col, int max_col_offset) {
        int delta_row = 0;
        int end4 = bh4 < g.rows - mi_row ? bh4 : g.rows - mi_row;
        if (end4 > 16) end4 = 16;
        const bool use16 = bh4 >= 16;
        if (delta_col < -1 || delta_col > 1) {
            delta_row = 1;
            if ((mi_row & 1) && bh4 < 2) delta_row -= 1;
        }
        int i = 0;
        while (i < end4) {
            const int r = mi_row + delta_row + i, c = mi_col + delta_col;
            if (!inside(r, c)) break;
            const int64_t b = (int64_t)r * g.cols + c;
            const int cand_bh4 = g.bh4a[b] > 1 ? g.bh4a[b] : 1;
            int length = bh4 < cand_bh4 ? bh4 : cand_bh4;
            if (use16) length = length > 4 ? length : 4;
            else if (delta_col < -1 || delta_col > 1)
                length = length > 2 ? length : 2;
            int weight = 2;
            if (2 <= bh4 && bh4 <= cand_bh4) {
                const int bw = g.bw4a[b] > 1 ? g.bw4a[b] : 1;
                int inc = -max_col_offset + delta_col + 1;
                if (inc > bw) inc = bw;
                if (inc > weight) weight = inc;
                processed_cols = inc - delta_col - 1;
            }
            add_cand(r, c, length * weight);
            i += length;
        }
    };
    bool found_above = false, found_left = false;
    auto run_found = [&](bool *acc) { *acc |= found; found = false; };

    int max_row_offset = 0;
    if (mi_row > t_r0) {
        max_row_offset = -(3 << 1);
        if (t_r0 - mi_row > max_row_offset) max_row_offset = t_r0 - mi_row;
    }
    int max_col_offset = 0;
    if (mi_col > t_c0) {
        max_col_offset = -(3 << 1);
        if (t_c0 - mi_col > max_col_offset) max_col_offset = t_c0 - mi_col;
    }

    found = false;
    if (max_row_offset <= -1 || max_row_offset >= 1)
        scan_row(-1, max_row_offset);
    run_found(&found_above);
    if (max_col_offset <= -1 || max_col_offset >= 1)
        scan_col(-1, max_col_offset);
    run_found(&found_left);
    if (bw4 <= 16) {  // top-right point
        const int r = mi_row - 1, c = mi_col + bw4;
        if (inside(r, c) && g.ref[(int64_t)r * g.cols + c] != -1)
            add_cand(r, c, 4);
    }
    run_found(&found_above);

    const int close_matches = (int)found_above + (int)found_left;
    const int num_nearest = n;
    const int num_new = newmv_count;
    for (int i = 0; i < num_nearest; i++) wts[i] += REF_CAT_LEVEL_C;

    {  // top-left point
        const int r = mi_row - 1, c = mi_col - 1;
        if (inside(r, c) && g.ref[(int64_t)r * g.cols + c] != -1)
            add_cand(r, c, 4);
    }
    run_found(&found_above);

    for (int idx = 2; idx <= 3; idx++) {
        const int delta = -(idx * 2 - 1);
        found = false;
        if (-delta <= -max_row_offset && -delta > processed_rows)
            scan_row(delta, max_row_offset);
        run_found(&found_above);
        if (-delta <= -max_col_offset && -delta > processed_cols)
            scan_col(delta, max_col_offset);
        run_found(&found_left);
    }

    const int total_matches = (int)found_above + (int)found_left;

    // stable descending sort, nearest group then outer group
    auto sort_range = [&](int lo, int hi) {
        for (int i = lo + 1; i < hi; i++) {  // insertion sort (stable)
            int w = wts[i], m0 = mvs[i][0], m1 = mvs[i][1];
            int j = i - 1;
            while (j >= lo && wts[j] < w) {
                wts[j + 1] = wts[j];
                mvs[j + 1][0] = mvs[j][0];
                mvs[j + 1][1] = mvs[j][1];
                j--;
            }
            wts[j + 1] = w;
            mvs[j + 1][0] = m0;
            mvs[j + 1][1] = m1;
        }
    };
    sort_range(0, num_nearest);
    sort_range(num_nearest, n);

    if (close_matches == 0) {
        out.newmv_ctx = total_matches < 1 ? total_matches : 1;
        out.refmv_ctx = total_matches;
    } else if (close_matches == 1) {
        out.newmv_ctx = 3 - (num_new < 1 ? num_new : 1);
        out.refmv_ctx = 2 + total_matches;
    } else {
        out.newmv_ctx = 5 - (num_new < 1 ? num_new : 1);
        out.refmv_ctx = 5;
    }
    out.zeromv_ctx = 0;

    // extra search (7.10.2.12, single-ref arm).  Every inter neighbor in a
    // single-LAST frame shares the temporal side: no sign flips.
    if (n < 2) {
        int w4 = bw4 < g.cols - mi_col ? bw4 : g.cols - mi_col;
        if (w4 > 16) w4 = 16;
        int h4 = bh4 < g.rows - mi_row ? bh4 : g.rows - mi_row;
        if (h4 > 16) h4 = 16;
        const int num4 = w4 < h4 ? w4 : h4;
        for (int pass = 0; pass < 2 && n < 2; pass++) {
            if (pass == 0 && mi_row <= t_r0) continue;
            if (pass == 1 && mi_col <= t_c0) continue;
            int i = 0;
            while (i < num4 && n < 2) {
                const int r = pass == 0 ? mi_row - 1 : mi_row + i;
                const int c = pass == 0 ? mi_col + i : mi_col - 1;
                if (!inside(r, c)) break;
                const int64_t b = (int64_t)r * g.cols + c;
                const int cref = g.ref[b];
                if (cref > 0) {
                    const int pr = lower_even(g.mv[b * 2]);
                    const int pc = lower_even(g.mv[b * 2 + 1]);
                    bool dup = false;
                    for (int k = 0; k < n; k++)
                        if (mvs[k][0] == pr && mvs[k][1] == pc) dup = true;
                    if (!dup && n < 2) {
                        mvs[n][0] = pr;
                        mvs[n][1] = pc;
                        wts[n] = 2;
                        n++;
                    }
                }
                const int step = pass == 0 ? g.bw4a[b] : g.bh4a[b];
                i += step > 1 ? step : 1;
            }
        }
    }

    out.num_found = n;
    while (n < 2) {  // global-mv (identity: zero) fill
        mvs[n][0] = 0;
        mvs[n][1] = 0;
        wts[n] = 0;
        n++;
    }

    // clamp (7.10.2.14)
    const int row_border = 128 + bh4 * 32;
    const int col_border = 128 + bw4 * 32;
    const int mb_top = -(mi_row * 32);
    const int mb_bottom = (g.rows - bh4 - mi_row) * 32;
    const int mb_left = -(mi_col * 32);
    const int mb_right = (g.cols - bw4 - mi_col) * 32;
    for (int i = 0; i < n; i++) {
        int r = mvs[i][0], c = mvs[i][1];
        if (r < mb_top - row_border) r = mb_top - row_border;
        if (r > mb_bottom + row_border) r = mb_bottom + row_border;
        if (c < mb_left - col_border) c = mb_left - col_border;
        if (c > mb_right + col_border) c = mb_right + col_border;
        out.mv[i][0] = r;
        out.mv[i][1] = c;
        out.weight[i] = wts[i];
    }
    out.len = n;
}

inline int drl_ctx_c(const MvStack &s, int idx) {
    if (s.weight[idx] >= REF_CAT_LEVEL_C
        && s.weight[idx + 1] >= REF_CAT_LEVEL_C)
        return 0;
    if (s.weight[idx] >= REF_CAT_LEVEL_C
        && s.weight[idx + 1] < REF_CAT_LEVEL_C)
        return 1;
    return 2;
}

// mv_pred.intra_inter_ctx
inline int intra_inter_ctx_c(const InterGrid &g, int mr, int mc, int t_r0,
                             int t_c0) {
    const bool ha = mr > t_r0, hl = mc > t_c0;
    const bool ai = ha && g.ref[(int64_t)(mr - 1) * g.cols + mc] == 0;
    const bool li = hl && g.ref[(int64_t)mr * g.cols + mc - 1] == 0;
    if (ha && hl) return ai && li ? 3 : ((ai || li) ? 1 : 0);
    if (ha || hl) return 2 * (int)(ai || li);
    return 0;
}

inline int balance_ctx(int c0, int c1) {
    return c0 == c1 ? 1 : (c0 < c1 ? 0 : 2);
}

// single_ref contexts p1/p3/p4 for a LAST-only frame (neighbor refs are
// LAST or intra, so fwd = counts[LAST], bwd = 0, last2 group = counts)
void last_ref_ctxs(const InterGrid &g, int mr, int mc, int t_r0, int t_c0,
                   int *c1, int *c3, int *c4) {
    int n_last = 0;
    if (mr > t_r0 && g.ref[(int64_t)(mr - 1) * g.cols + mc] == LAST_FRAME_C)
        n_last++;
    if (mc > t_c0 && g.ref[(int64_t)mr * g.cols + mc - 1] == LAST_FRAME_C)
        n_last++;
    *c1 = balance_ctx(n_last, 0);  // fwd vs bwd
    *c3 = balance_ctx(n_last, 0);  // LAST+LAST2 vs LAST3+GOLDEN
    *c4 = balance_ctx(n_last, 0);  // LAST vs LAST2
}

void encode_mv_comp_c(MsacEnc *enc, const Ptrs &P, int comp, int v,
                      int adapt) {
    const int sign = v < 0 ? 1 : 0;
    const int mag = v < 0 ? -v : v;
    msac_symbol(enc, P.c[R_MV_SIGN] + comp * 3, 2, sign, adapt);
    const int z = mag - 1;
    if (z < 16) {
        msac_symbol(enc, P.c[R_MV_CLASS] + comp * 12, 11, 0, adapt);
        const int ib = z >> 3, fr = (z >> 1) & 3;
        msac_symbol(enc, P.c[R_MV_CLASS0] + comp * 3, 2, ib, adapt);
        msac_symbol(enc, P.c[R_MV_CLASS0_FP] + ((int64_t)comp * 2 + ib) * 5,
                    4, fr, adapt);
    } else {
        int cls = 0;
        while ((2 << cls) <= (z >> 3)) cls++;  // floor(log2(z)) - 3
        msac_symbol(enc, P.c[R_MV_CLASS] + comp * 12, 11, cls, adapt);
        const int d = z - (16 << (cls - 1));
        const int ip = d >> 3;
        for (int i = 0; i < cls; i++)
            msac_symbol(enc, P.c[R_MV_BITS] + ((int64_t)comp * 10 + i) * 3,
                        2, (ip >> i) & 1, adapt);
        msac_symbol(enc, P.c[R_MV_FP] + comp * 5, 4, (d >> 1) & 3, adapt);
    }
}

// InterFrameEncoder._code_inter_symbols (single-reference frames), one
// block: mode info + residual + neighbor/grid state.
int code_inter_frame_block(
    MsacEnc *enc, const Ptrs &P, InterGrid &g,
    int x, int y, int bw, int bh, int mode, int skip, int tt,
    int mvr, int mvc,
    const int32_t *lv_y, const int32_t *lv_u, const int32_t *lv_v,
    const int32_t *scan_y, const int32_t *scan_c,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx, int mi_cols, int mi_rows, int adapt, int q_nonzero,
    int cdef_bits, int cdef_idx,
    int t_r0, int t_c0, int t_r1, int t_c1)
{
    const int cx = x >> 1, cy = y >> 1, cw = bw >> 1, ch = bh >> 1;
    const int mc = x / 4, mr = y / 4;
    const int bw4 = bw / 4, bh4 = bh / 4;
    const bool is_inter = mode == 13;

    const int skip_ctx = above_skip[mc] + left_skip[mr];
    msac_symbol(enc, P.c[R_SKIP] + skip_ctx * 3, 2, skip, adapt);
    if (cdef_bits > 0 && cdef_idx >= 0 && !skip)
        msac_literal(enc, (unsigned)cdef_idx, cdef_bits);
    const int ii = intra_inter_ctx_c(g, mr, mc, t_r0, t_c0);
    msac_symbol(enc, P.c[R_INTRA_INTER] + ii * 3, 2, is_inter ? 1 : 0,
                adapt);

    if (is_inter) {
        // single-reference LAST bits (spec read_ref_frames single path)
        int c1, c3, c4;
        last_ref_ctxs(g, mr, mc, t_r0, t_c0, &c1, &c3, &c4);
        msac_symbol(enc, P.c[R_SINGLE_REF] + ((int64_t)c1 * 6 + 0) * 3, 2,
                    0, adapt);  // p1: forward group
        msac_symbol(enc, P.c[R_SINGLE_REF] + ((int64_t)c3 * 6 + 2) * 3, 2,
                    0, adapt);  // p3: LAST/LAST2 group
        msac_symbol(enc, P.c[R_SINGLE_REF] + ((int64_t)c4 * 6 + 3) * 3, 2,
                    0, adapt);  // p4: LAST
        MvStack s;
        find_mv_stack_c(g, mr, mc, bw4, bh4, LAST_FRAME_C, t_r0, t_c0, t_r1,
                        t_c1, s);
        // cheapest codable mode for the device-chosen MV
        int ymode, ref_mv_idx = 0;
        if (mvr == 0 && mvc == 0) {
            ymode = M_GLOBALMV;
        } else if (s.num_found >= 1 && s.mv[0][0] == mvr
                   && s.mv[0][1] == mvc) {
            ymode = M_NEARESTMV;
        } else {
            ymode = M_NEWMV;
            for (int di = 1; di <= 2; di++)
                if (s.num_found > di && s.mv[di][0] == mvr
                    && s.mv[di][1] == mvc) {
                    ymode = M_NEARMV;
                    ref_mv_idx = di;
                    break;
                }
        }
        msac_symbol(enc, P.c[R_NEWMV] + s.newmv_ctx * 3, 2,
                    ymode == M_NEWMV ? 0 : 1, adapt);
        if (ymode != M_NEWMV) {
            msac_symbol(enc, P.c[R_ZEROMV] + s.zeromv_ctx * 3, 2,
                        ymode == M_GLOBALMV ? 0 : 1, adapt);
            if (ymode != M_GLOBALMV)
                msac_symbol(enc, P.c[R_REFMV] + s.refmv_ctx * 3, 2,
                            ymode == M_NEARESTMV ? 0 : 1, adapt);
        }
        if (ymode == M_NEWMV) {
            for (int idx = 0; idx <= 1; idx++) {
                if (s.num_found > idx + 1) {
                    const int bit = ref_mv_idx != idx ? 1 : 0;
                    msac_symbol(enc, P.c[R_DRL] + drl_ctx_c(s, idx) * 3, 2,
                                bit, adapt);
                    if (!bit) break;
                }
            }
        } else if (ymode == M_NEARMV) {
            for (int idx = 1; idx <= 2; idx++) {
                if (s.num_found > idx + 1) {
                    const int bit = ref_mv_idx != idx ? 1 : 0;
                    msac_symbol(enc, P.c[R_DRL] + drl_ctx_c(s, idx) * 3, 2,
                                bit, adapt);
                    if (!bit) break;
                }
            }
        }
        if (ymode == M_NEWMV) {
            const int dr = mvr - s.mv[ref_mv_idx][0];
            const int dc = mvc - s.mv[ref_mv_idx][1];
            const int joint = (dr ? 2 : 0) | (dc ? 1 : 0);
            msac_symbol(enc, P.c[R_MV_JOINT], 4, joint, adapt);
            if (dr) encode_mv_comp_c(enc, P, 0, dr, adapt);
            if (dc) encode_mv_comp_c(enc, P, 1, dc, adapt);
        }
        g.set_block(mr, mc, bw4, bh4, LAST_FRAME_C, mvr, mvc,
                    ymode == M_NEWMV ? 1 : 0);
    } else {
        // intra in inter frame: y_mode over the size-group cdf, angle
        // delta 0, DC chroma (the device pass's intra-in-inter envelope)
        int mn = bw < bh ? bw : bh;
        int sg = 0;
        while ((8 << sg) <= mn && sg < 3) sg++;  // log2(min)-2 capped [0,3]
        msac_symbol(enc, P.c[R_Y_MODE] + sg * 14, 13, mode, adapt);
        if (mn >= 8 && mode >= V_PRED && mode <= D67)
            msac_symbol(enc, P.c[R_ANGLE] + (mode - V_PRED) * 8, 7, 0 + 3,
                        adapt);
        const int cfl_allowed = (bw > bh ? bw : bh) <= 32 ? 1 : 0;
        msac_symbol(enc, P.c[R_UV] + ((int64_t)cfl_allowed * 13 + mode) * 15,
                    cfl_allowed ? 14 : 13, DC_PRED, adapt);
        g.set_block(mr, mc, bw4, bh4, 0 /* INTRA */, 0, 0, 0);
    }

    // ---- residual (shared context machinery with the intra coder) ----
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
        const int sdc = pos - neg;
        const int dctx = sdc == 0 ? 0 : (sdc > 0 ? 2 : 1);
        uint16_t *tx_row = nullptr;
        int tx_sym = 1, tx_ns = 0;
        const int mx = tw > th ? tw : th;
        const int mnd = tw < th ? tw : th;
        if (plane == 0 && q_nonzero) {
            if (is_inter && mx <= 32) {
                // inter + reduced_tx_set: EXT_TX_SET_DCT_IDTX, DCT = sym 1
                int txsqr = mnd >= 32 ? 3 : mnd >= 16 ? 2 : mnd >= 8 ? 1 : 0;
                tx_row = P.c[R_TXTYPE3] + (int64_t)txsqr * 3;
                tx_sym = 1;
                tx_ns = 2;
            } else if (!is_inter && mx <= 16) {
                int txsqr = mnd >= 16 ? 2 : (mnd >= 8 ? 1 : 0);
                tx_row = P.c[R_TXTYPE2] + ((int64_t)txsqr * 13 + mode) * 6;
                tx_sym = tt;
                tx_ns = 5;
            }
        }
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
        const int cc1 = (px + tw) / 4 < maxc ? (px + tw) / 4 : maxc;
        const int rr1 = (py + th) / 4 < maxr ? (py + th) / 4 : maxr;
        for (int i = px / 4; i < cc1; i++) { a_cul[i] = cul; a_dc[i] = dc_cat; }
        for (int i = py / 4; i < rr1; i++) { l_cul[i] = cul; l_dc[i] = dc_cat; }
    };
    auto zero_ctx = [&](int plane, int px, int py, int tw, int th) {
        const int sub = plane ? 1 : 0;
        int32_t *a_cul = (int32_t *)pctx[plane * 4 + 0];
        int32_t *l_cul = (int32_t *)pctx[plane * 4 + 1];
        int32_t *a_dc = (int32_t *)pctx[plane * 4 + 2];
        int32_t *l_dc = (int32_t *)pctx[plane * 4 + 3];
        const int maxc = ((mi_cols * 4) >> sub) / 4;
        const int maxr = ((mi_rows * 4) >> sub) / 4;
        const int cc1 = (px + tw) / 4 < maxc ? (px + tw) / 4 : maxc;
        const int rr1 = (py + th) / 4 < maxr ? (py + th) / 4 : maxr;
        for (int i = px / 4; i < cc1; i++) { a_cul[i] = 0; a_dc[i] = 0; }
        for (int i = py / 4; i < rr1; i++) { l_cul[i] = 0; l_dc[i] = 0; }
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

    const int c1 = mc + bw4 < mi_cols ? mc + bw4 : mi_cols;
    const int r1 = mr + bh4 < mi_rows ? mr + bh4 : mi_rows;
    for (int i = mc; i < c1; i++) above_skip[i] = skip;
    for (int i = mr; i < r1; i++) left_skip[i] = skip;
    return skip | (tt << 1);
}

// inter flavor of replay_one: consume one cached record (mode 13 = inter
// with the MV in the au/av slots) and code its symbols
int replay_one_inter(BlockCache *bc, MsacEnc *enc, const Ptrs &P,
                     InterGrid &g, int x, int y, int bw, int bh,
                     const uint64_t *scans,
                     int32_t *above_skip, int32_t *left_skip,
                     const uint64_t *pctx, int mi_cols, int mi_rows,
                     int adapt, int q_nonzero,
                     int cdef_bits, int *cdef_pending, int cdef_idx,
                     int t_r0, int t_c0, int t_r1, int t_c1) {
    if (bc->cursor + 15 > bc->buf.size()) return -1;
    const int32_t *hd = &bc->buf[bc->cursor];
    if (hd[0] != x || hd[1] != y || hd[2] != bw || hd[3] != bh) return -1;
    const int mode = hd[4], skip = hd[5], tt = hd[6];
    const int mvr = hd[8], mvc = hd[9];
    bc->cursor += 15;
    const int cw = bw >> 1, ch = bh >> 1;
    const size_t ny = (size_t)(bw > 32 ? 32 : bw) * (bh > 32 ? 32 : bh);
    const size_t nc = (size_t)(cw > 32 ? 32 : cw) * (ch > 32 ? 32 : ch);
    const int32_t *lv_y = nullptr, *lv_u = nullptr, *lv_v = nullptr;
    if (!skip) {
        lv_y = &bc->buf[bc->cursor];
        lv_u = lv_y + ny;
        lv_v = lv_u + nc;
        bc->cursor += ny + 2 * nc;
    }
    auto lg = [](int d) { return d >= 32 ? 3 : d >= 16 ? 2 : d >= 8 ? 1 : 0; };
    const int32_t *scan_y = (const int32_t *)scans[lg(bw) * 4 + lg(bh)];
    const int32_t *scan_c = (const int32_t *)scans[lg(cw) * 4 + lg(ch)];
    int clit = -1;
    if (!skip && cdef_bits > 0 && cdef_pending && *cdef_pending) {
        clit = cdef_idx;
        *cdef_pending = 0;
    }
    return code_inter_frame_block(enc, P, g, x, y, bw, bh, mode, skip, tt,
                                  mvr, mvc, lv_y, lv_u, lv_v, scan_y, scan_c,
                                  above_skip, left_skip, pctx, mi_cols,
                                  mi_rows, adapt, q_nonzero, cdef_bits, clit,
                                  t_r0, t_c0, t_r1, t_c1);
}

}  // namespace

extern "C" {

// Replay a whole INTER-frame superblock from the cache: partition symbols
// from the split maps + cached block symbols with MV-stack re-derivation
// against the shared mi grid.  Returns 0, or -1 on cache desync.
int encode_inter_sb_cached(
    void *cache, MsacEnc *enc, const uint64_t *reg,
    int sb_x, int sb_y, int mi_cols, int mi_rows, int adapt, int q_nonzero,
    int t_r0, int t_c0, int t_r1, int t_c1,
    const uint64_t *scans,
    int32_t *above_part, int32_t *left_part,
    int32_t *above_skip, int32_t *left_skip,
    const uint64_t *pctx, uint16_t *part_cdf,
    const uint8_t *split32, int split_stride, int rdo_partition,
    const uint8_t *none64, int none64_stride,
    int32_t *g_ref, int32_t *g_mv, uint8_t *g_newmv, int32_t *g_bw4,
    int32_t *g_bh4,
    int cdef_bits, int cdef_idx)
{
    Ptrs P;
    for (int i = 0; i < N_CDF; i++) P.c[i] = (uint16_t *)reg[i];
    P.sm = (const int32_t *)reg[R_SM_WEIGHTS];
    P.dr = (const int32_t *)reg[R_DR];
    InterGrid g{g_ref, g_mv, g_newmv, g_bw4, g_bh4, mi_rows, mi_cols};
    BlockCache *bc = (BlockCache *)cache;
    int cdef_pending = cdef_bits > 0 && cdef_idx >= 0 ? 1 : 0;
    int err = 0;

    struct Walk {
        BlockCache *bc;
        MsacEnc *enc;
        const Ptrs *P;
        InterGrid *g;
        const uint64_t *scans;
        int32_t *above_part, *left_part, *above_skip, *left_skip;
        const uint64_t *pctx;
        uint16_t *part_cdf;
        const uint8_t *split32;
        int split_stride, rdo_partition;
        const uint8_t *none64;
        int none64_stride;
        int mi_cols, mi_rows, adapt, q_nonzero;
        int t_r0, t_c0, t_r1, t_c1;
        int cdef_bits, *cdef_pending, cdef_idx;
        int *err;

        void block(int x, int y, int bw, int bh) {
            if (*err) return;
            int r = replay_one_inter(bc, enc, *P, *g, x, y, bw, bh, scans,
                                     above_skip, left_skip, pctx, mi_cols,
                                     mi_rows, adapt, q_nonzero, cdef_bits,
                                     cdef_pending, cdef_idx, t_r0, t_c0,
                                     t_r1, t_c1);
            if (r < 0) *err = 1;
        }
        void gbool(int bit, const uint16_t *row, const int *pset, int nset,
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
        void partition(int x, int y, int size) {
            if (*err) return;
            const int mc = x / 4, mr = y / 4;
            if (mc >= mi_cols || mr >= mi_rows) return;
            const int bsl = size == 8 ? 1 : size == 16 ? 2
                            : size == 32 ? 3 : 4;
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
                want_split =
                    split32[(int64_t)(y / 32) * split_stride + x / 32] != 0;
            } else {
                want_split = false;
            }
            static const int TOP_SET[] = {2, 3, 4, 6, 7, 9};
            static const int LEFT_SET[] = {1, 3, 4, 5, 6, 8};
            int part;
            if (has_rows && has_cols) {
                part = want_split ? 3 : 0;
                msac_symbol(enc, row, nsyms, part, adapt);
            } else if (has_cols) {
                part = want_split ? 3 : 1;
                gbool(part == 3 ? 1 : 0, row, TOP_SET, 6, nsyms);
            } else if (has_rows) {
                part = want_split ? 3 : 2;
                gbool(part == 3 ? 1 : 0, row, LEFT_SET, 6, nsyms);
            } else {
                part = 3;
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
            if (part == 1 && (mr + half_mi) < mi_rows)
                block(x, y + half, bw, bh);
            if (part == 2 && (mc + half_mi) < mi_cols)
                block(x + half, y, bw, bh);
            PartCtx pc = part_ctx_rect(bw, bh);
            const int n4 = size / 4;
            const int c1 = mc + n4 < mi_cols ? mc + n4 : mi_cols;
            const int r1 = mr + n4 < mi_rows ? mr + n4 : mi_rows;
            for (int i = mc; i < c1; i++) above_part[i] = pc.ab;
            for (int i = mr; i < r1; i++) left_part[i] = pc.lf;
        }
    } w{bc, enc, &P, &g, scans, above_part, left_part, above_skip,
        left_skip, pctx, part_cdf, split32, split_stride, rdo_partition,
        none64, none64_stride, mi_cols, mi_rows, adapt, q_nonzero,
        t_r0, t_c0, t_r1, t_c1, cdef_bits, &cdef_pending, cdef_idx, &err};

    w.partition(sb_x, sb_y, 64);
    return err ? -1 : 0;
}

}  // extern "C"
