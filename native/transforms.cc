// Normative inverse transforms - C++ port of the validated numpy oracle
// (rav1e_tpu/ops/transforms_np.py).  Must stay bit-identical; parity is
// enforced by tests/test_native_tx.py against the numpy implementation,
// which itself is gated by dav1d decode conformance.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

constexpr int COS_BIT = 12;
// round(cos(i*pi/128) * 4096), i = 0..63 (normative cos128 table)
static const int32_t COSPI[64] = {
    4096, 4095, 4091, 4085, 4076, 4065, 4052, 4036, 4017, 3996, 3973,
    3948, 3920, 3889, 3857, 3822, 3784, 3745, 3703, 3659, 3612, 3564,
    3513, 3461, 3406, 3349, 3290, 3229, 3166, 3102, 3035, 2967, 2896,
    2824, 2751, 2675, 2598, 2520, 2440, 2359, 2276, 2191, 2106, 2019,
    1931, 1842, 1751, 1660, 1567, 1474, 1380, 1285, 1189, 1092, 995,
    897,  799,  700,  601,  501,  401,  301,  201,  101};
static const int64_t SINPI[5] = {0, 1321, 2482, 3344, 3803};
constexpr int64_t SQRT2 = 5793;
constexpr int64_t INV_SQRT2 = 2896;

inline int64_t round2(int64_t x, int bit) { return (x + (1ll << (bit - 1))) >> bit; }
inline int64_t hb(int64_t w0, int64_t x0, int64_t w1, int64_t x1) {
    return round2(w0 * x0 + w1 * x1, COS_BIT);
}
#define C(i) ((int64_t)COSPI[i])

void idct4(const int64_t *x, int64_t *o, int stride) {
    int64_t s0 = x[0 * stride], s1 = x[2 * stride], s2 = x[1 * stride], s3 = x[3 * stride];
    int64_t b0 = hb(C(32), s0, C(32), s1);
    int64_t b1 = hb(C(32), s0, -C(32), s1);
    int64_t b2 = hb(C(48), s2, -C(16), s3);
    int64_t b3 = hb(C(16), s2, C(48), s3);
    o[0] = b0 + b3;
    o[1] = b1 + b2;
    o[2] = b1 - b2;
    o[3] = b0 - b3;
}

void idct8(const int64_t *x, int64_t *o, int stride) {
    int64_t ev[4];
    idct4(x, ev, 2 * stride);
    int64_t s4 = x[1 * stride], s5 = x[5 * stride], s6 = x[3 * stride], s7 = x[7 * stride];
    int64_t b4 = hb(C(56), s4, -C(8), s7);
    int64_t b5 = hb(C(24), s5, -C(40), s6);
    int64_t b6 = hb(C(40), s5, C(24), s6);
    int64_t b7 = hb(C(8), s4, C(56), s7);
    int64_t t4 = b4 + b5;
    int64_t t5 = b4 - b5;
    int64_t t6 = -b6 + b7;
    int64_t t7 = b6 + b7;
    b5 = hb(-C(32), t5, C(32), t6);
    b6 = hb(C(32), t5, C(32), t6);
    o[0] = ev[0] + t7;
    o[1] = ev[1] + b6;
    o[2] = ev[2] + b5;
    o[3] = ev[3] + t4;
    o[4] = ev[3] - t4;
    o[5] = ev[2] - b5;
    o[6] = ev[1] - b6;
    o[7] = ev[0] - t7;
}

void idct16(const int64_t *x, int64_t *o, int stride) {
    int64_t ev[8];
    idct8(x, ev, 2 * stride);
    int64_t s8 = x[1 * stride], s9 = x[9 * stride], s10 = x[5 * stride], s11 = x[13 * stride];
    int64_t s12 = x[3 * stride], s13 = x[11 * stride], s14 = x[7 * stride], s15 = x[15 * stride];
    int64_t b8 = hb(C(60), s8, -C(4), s15);
    int64_t b15 = hb(C(4), s8, C(60), s15);
    int64_t b9 = hb(C(28), s9, -C(36), s14);
    int64_t b14 = hb(C(36), s9, C(28), s14);
    int64_t b10 = hb(C(44), s10, -C(20), s13);
    int64_t b13 = hb(C(20), s10, C(44), s13);
    int64_t b11 = hb(C(12), s11, -C(52), s12);
    int64_t b12 = hb(C(52), s11, C(12), s12);
    int64_t t8 = b8 + b9, t9 = b8 - b9;
    int64_t t10 = -b10 + b11, t11 = b10 + b11;
    int64_t t12 = b12 + b13, t13 = b12 - b13;
    int64_t t14 = -b14 + b15, t15 = b14 + b15;
    b9 = hb(-C(16), t9, C(48), t14);
    b14 = hb(C(48), t9, C(16), t14);
    b10 = hb(-C(48), t10, -C(16), t13);
    b13 = hb(-C(16), t10, C(48), t13);
    int64_t u8 = t8 + t11, u9 = b9 + b10, u10 = b9 - b10, u11 = t8 - t11;
    int64_t u12 = -t12 + t15, u13 = -b13 + b14, u14 = b13 + b14, u15 = t12 + t15;
    int64_t v10 = hb(-C(32), u10, C(32), u13);
    int64_t v13 = hb(C(32), u10, C(32), u13);
    int64_t v11 = hb(-C(32), u11, C(32), u12);
    int64_t v12 = hb(C(32), u11, C(32), u12);
    int64_t odd[8] = {u8, u9, v10, v11, v12, v13, u14, u15};
    for (int i = 0; i < 8; i++) {
        o[i] = ev[i] + odd[7 - i];
        o[8 + i] = ev[7 - i] - odd[i];
    }
}

void idct32(const int64_t *x, int64_t *o, int stride) {
    int64_t ev[16];
    idct16(x, ev, 2 * stride);
    static const int idx[16] = {1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31};
    static const int ang[8] = {62, 30, 46, 14, 54, 22, 38, 6};
    int64_t s[16];
    for (int k = 0; k < 16; k++) s[k] = x[idx[k] * stride];
    int64_t b[16];
    for (int k = 0; k < 8; k++) {
        b[k] = hb(C(ang[k]), s[k], -C(64 - ang[k]), s[15 - k]);
        b[15 - k] = hb(C(64 - ang[k]), s[k], C(ang[k]), s[15 - k]);
    }
    int64_t t[16];
    t[0] = b[0] + b[1];
    t[1] = b[0] - b[1];
    t[2] = -b[2] + b[3];
    t[3] = b[2] + b[3];
    t[4] = b[4] + b[5];
    t[5] = b[4] - b[5];
    t[6] = -b[6] + b[7];
    t[7] = b[6] + b[7];
    t[8] = b[8] + b[9];
    t[9] = b[8] - b[9];
    t[10] = -b[10] + b[11];
    t[11] = b[10] + b[11];
    t[12] = b[12] + b[13];
    t[13] = b[12] - b[13];
    t[14] = -b[14] + b[15];
    t[15] = b[14] + b[15];
    // twiddles: indices relative to 16 (b[k] = net[16+k])
    b[1] = hb(-C(8), t[1], C(56), t[14]);
    b[14] = hb(C(56), t[1], C(8), t[14]);
    b[2] = hb(-C(56), t[2], -C(8), t[13]);
    b[13] = hb(-C(8), t[2], C(56), t[13]);
    b[5] = hb(-C(40), t[5], C(24), t[10]);
    b[10] = hb(C(24), t[5], C(40), t[10]);
    b[6] = hb(-C(24), t[6], -C(40), t[9]);
    b[9] = hb(-C(40), t[6], C(24), t[9]);
    b[0] = t[0];
    b[3] = t[3];
    b[4] = t[4];
    b[7] = t[7];
    b[8] = t[8];
    b[11] = t[11];
    b[12] = t[12];
    b[15] = t[15];
    t[0] = b[0] + b[3];
    t[1] = b[1] + b[2];
    t[2] = b[1] - b[2];
    t[3] = b[0] - b[3];
    t[4] = -b[4] + b[7];
    t[5] = -b[5] + b[6];
    t[6] = b[5] + b[6];
    t[7] = b[4] + b[7];
    t[8] = b[8] + b[11];
    t[9] = b[9] + b[10];
    t[10] = b[9] - b[10];
    t[11] = b[8] - b[11];
    t[12] = -b[12] + b[15];
    t[13] = -b[13] + b[14];
    t[14] = b[13] + b[14];
    t[15] = b[12] + b[15];
    b[2] = hb(-C(16), t[2], C(48), t[13]);
    b[13] = hb(C(48), t[2], C(16), t[13]);
    b[3] = hb(-C(16), t[3], C(48), t[12]);
    b[12] = hb(C(48), t[3], C(16), t[12]);
    b[4] = hb(-C(48), t[4], -C(16), t[11]);
    b[11] = hb(-C(16), t[4], C(48), t[11]);
    b[5] = hb(-C(48), t[5], -C(16), t[10]);
    b[10] = hb(-C(16), t[5], C(48), t[10]);
    b[0] = t[0];
    b[1] = t[1];
    b[6] = t[6];
    b[7] = t[7];
    b[8] = t[8];
    b[9] = t[9];
    b[14] = t[14];
    b[15] = t[15];
    t[0] = b[0] + b[7];
    t[1] = b[1] + b[6];
    t[2] = b[2] + b[5];
    t[3] = b[3] + b[4];
    t[4] = b[3] - b[4];
    t[5] = b[2] - b[5];
    t[6] = b[1] - b[6];
    t[7] = b[0] - b[7];
    t[8] = -b[8] + b[15];
    t[9] = -b[9] + b[14];
    t[10] = -b[10] + b[13];
    t[11] = -b[11] + b[12];
    t[12] = b[11] + b[12];
    t[13] = b[10] + b[13];
    t[14] = b[9] + b[14];
    t[15] = b[8] + b[15];
    for (int k = 4; k < 8; k++) {
        b[k] = hb(-C(32), t[k], C(32), t[15 - k + 4 - 4]);
        // explicit: pairs (20..23) with (27..24) in absolute indexing
    }
    b[4] = hb(-C(32), t[4], C(32), t[11]);
    b[11] = hb(C(32), t[4], C(32), t[11]);
    b[5] = hb(-C(32), t[5], C(32), t[10]);
    b[10] = hb(C(32), t[5], C(32), t[10]);
    b[6] = hb(-C(32), t[6], C(32), t[9]);
    b[9] = hb(C(32), t[6], C(32), t[9]);
    b[7] = hb(-C(32), t[7], C(32), t[8]);
    b[8] = hb(C(32), t[7], C(32), t[8]);
    b[0] = t[0];
    b[1] = t[1];
    b[2] = t[2];
    b[3] = t[3];
    b[12] = t[12];
    b[13] = t[13];
    b[14] = t[14];
    b[15] = t[15];
    for (int i = 0; i < 16; i++) {
        o[i] = ev[i] + b[15 - i];
        o[16 + i] = ev[15 - i] - b[i];
    }
}

void idct64(const int64_t *x, int64_t *o, int stride) {
    int64_t ev[32];
    idct32(x, ev, 2 * stride);
    static const int idx[32] = {1, 33, 17, 49, 9,  41, 25, 57, 5,  37, 21,
                                53, 13, 45, 29, 61, 3,  35, 19, 51, 11, 43,
                                27, 59, 7,  39, 23, 55, 15, 47, 31, 63};
    static const int ang[16] = {63, 31, 47, 15, 55, 23, 39, 7,
                                59, 27, 43, 11, 51, 19, 35, 3};
    int64_t s[32];
    for (int k = 0; k < 32; k++) s[k] = x[idx[k] * stride];
    int64_t b[32], t[32];
    for (int k = 0; k < 16; k++) {
        b[k] = hb(C(ang[k]), s[k], -C(64 - ang[k]), s[31 - k]);
        b[31 - k] = hb(C(64 - ang[k]), s[k], C(ang[k]), s[31 - k]);
    }
    for (int p = 0; p < 16; p++) {
        int i = 2 * p;
        if (p % 2 == 0) {
            t[i] = b[i] + b[i + 1];
            t[i + 1] = b[i] - b[i + 1];
        } else {
            t[i] = -b[i] + b[i + 1];
            t[i + 1] = b[i] + b[i + 1];
        }
    }
    auto tw = [&](int i, int j, int a, bool neg) {
        int64_t ti = t[i], tj = t[j];
        if (!neg) {
            b[i] = hb(-C(a), ti, C(64 - a), tj);
            b[j] = hb(C(64 - a), ti, C(a), tj);
        } else {
            b[i] = hb(-C(64 - a), ti, -C(a), tj);
            b[j] = hb(-C(a), ti, C(64 - a), tj);
        }
    };
    memcpy(b, t, sizeof(t));
    tw(1, 30, 4, false);
    tw(2, 29, 4, true);
    tw(5, 26, 36, false);
    tw(6, 25, 36, true);
    tw(9, 22, 20, false);
    tw(10, 21, 20, true);
    tw(13, 18, 52, false);
    tw(14, 17, 52, true);
    for (int g = 0; g < 8; g++) {
        int base = 4 * g;
        if (g % 2 == 0) {
            t[base + 0] = b[base + 0] + b[base + 3];
            t[base + 1] = b[base + 1] + b[base + 2];
            t[base + 2] = b[base + 1] - b[base + 2];
            t[base + 3] = b[base + 0] - b[base + 3];
        } else {
            t[base + 0] = -b[base + 0] + b[base + 3];
            t[base + 1] = -b[base + 1] + b[base + 2];
            t[base + 2] = b[base + 1] + b[base + 2];
            t[base + 3] = b[base + 0] + b[base + 3];
        }
    }
    memcpy(b, t, sizeof(t));
    tw(2, 29, 8, false);
    tw(3, 28, 8, false);
    tw(4, 27, 8, true);
    tw(5, 26, 8, true);
    tw(10, 21, 40, false);
    tw(11, 20, 40, false);
    tw(12, 19, 40, true);
    tw(13, 18, 40, true);
    for (int g = 0; g < 4; g++) {
        int base = 8 * g;
        for (int k = 0; k < 4; k++) {
            if (g % 2 == 0) {
                t[base + k] = b[base + k] + b[base + 7 - k];
                t[base + 7 - k] = b[base + k] - b[base + 7 - k];
            } else {
                t[base + k] = -b[base + k] + b[base + 7 - k];
                t[base + 7 - k] = b[base + k] + b[base + 7 - k];
            }
        }
    }
    memcpy(b, t, sizeof(t));
    tw(4, 27, 16, false);
    tw(5, 26, 16, false);
    tw(6, 25, 16, false);
    tw(7, 24, 16, false);
    tw(8, 23, 16, true);
    tw(9, 22, 16, true);
    tw(10, 21, 16, true);
    tw(11, 20, 16, true);
    for (int k = 0; k < 8; k++) {
        t[k] = b[k] + b[15 - k];
        t[15 - k] = b[k] - b[15 - k];
        t[16 + k] = -b[16 + k] + b[31 - k];
        t[31 - k] = b[16 + k] + b[31 - k];
    }
    memcpy(b, t, sizeof(t));
    for (int k = 8; k < 16; k++) {
        b[k] = hb(-C(32), t[k], C(32), t[31 - k + 8 + 8 - 8]);
    }
    for (int k = 8; k < 16; k++) {
        int j = 31 - k + 8 - 8 + 8;  // absolute mirror: 40..47 <-> 55..48
        (void)j;
    }
    // explicit final half-rotations: local k=8..15 pairs with 23..16
    for (int k = 8; k < 16; k++) {
        int64_t tk = t[k], tj = t[23 - k + 8];
        b[k] = hb(-C(32), tk, C(32), tj);
        b[23 - k + 8] = hb(C(32), tk, C(32), tj);
    }
    for (int i = 0; i < 32; i++) {
        o[i] = ev[i] + b[31 - i];
        o[32 + i] = ev[31 - i] - b[i];
    }
}

void iadst4(const int64_t *x, int64_t *o, int stride) {
    int64_t x0 = x[0], x1 = x[stride], x2 = x[2 * stride], x3 = x[3 * stride];
    int64_t s0 = SINPI[1] * x0;
    int64_t s1 = SINPI[2] * x0;
    int64_t s2 = SINPI[3] * x1;
    int64_t s3 = SINPI[4] * x2;
    int64_t s4 = SINPI[1] * x2;
    int64_t s5 = SINPI[2] * x3;
    int64_t s6 = SINPI[4] * x3;
    int64_t b7 = (x0 - x2) + x3;
    s0 = s0 + s3;
    s1 = s1 - s4;
    int64_t s3b = s2;
    s2 = SINPI[3] * b7;
    s0 = s0 + s5;
    s1 = s1 - s6;
    o[0] = round2(s0 + s3b, 12);
    o[1] = round2(s1 + s3b, 12);
    o[2] = round2(s2, 12);
    o[3] = round2(s0 + s1 - s3b, 12);
}

void iadst8(const int64_t *x, int64_t *o, int stride) {
    int64_t s[8] = {x[7 * stride], x[0], x[5 * stride], x[2 * stride],
                    x[3 * stride], x[4 * stride], x[1 * stride], x[6 * stride]};
    int64_t b0 = hb(C(4), s[0], C(60), s[1]);
    int64_t b1 = hb(C(60), s[0], -C(4), s[1]);
    int64_t b2 = hb(C(20), s[2], C(44), s[3]);
    int64_t b3 = hb(C(44), s[2], -C(20), s[3]);
    int64_t b4 = hb(C(36), s[4], C(28), s[5]);
    int64_t b5 = hb(C(28), s[4], -C(36), s[5]);
    int64_t b6 = hb(C(52), s[6], C(12), s[7]);
    int64_t b7 = hb(C(12), s[6], -C(52), s[7]);
    int64_t s0 = b0 + b4, s1 = b1 + b5, s2 = b2 + b6, s3 = b3 + b7;
    int64_t s4 = b0 - b4, s5 = b1 - b5, s6 = b2 - b6, s7 = b3 - b7;
    b4 = hb(C(16), s4, C(48), s5);
    b5 = hb(C(48), s4, -C(16), s5);
    b6 = hb(-C(48), s6, C(16), s7);
    b7 = hb(C(16), s6, C(48), s7);
    int64_t t0 = s0 + s2, t1 = s1 + s3, t2 = s0 - s2, t3 = s1 - s3;
    int64_t t4 = b4 + b6, t5 = b5 + b7, t6 = b4 - b6, t7 = b5 - b7;
    int64_t c2 = hb(C(32), t2, C(32), t3);
    int64_t c3 = hb(C(32), t2, -C(32), t3);
    int64_t c6 = hb(C(32), t6, C(32), t7);
    int64_t c7 = hb(C(32), t6, -C(32), t7);
    o[0] = t0;
    o[1] = -t4;
    o[2] = c6;
    o[3] = -c2;
    o[4] = c3;
    o[5] = -c7;
    o[6] = t5;
    o[7] = -t1;
}

void iadst16(const int64_t *x, int64_t *o, int stride) {
    int64_t s[16] = {x[15 * stride], x[0],          x[13 * stride], x[2 * stride],
                     x[11 * stride], x[4 * stride], x[9 * stride],  x[6 * stride],
                     x[7 * stride],  x[8 * stride], x[5 * stride],  x[10 * stride],
                     x[3 * stride],  x[12 * stride], x[1 * stride], x[14 * stride]};
    static const int ang[8] = {2, 10, 18, 26, 34, 42, 50, 58};
    int64_t b[16], t[16];
    for (int k = 0; k < 8; k++) {
        int a = ang[k];
        b[2 * k] = hb(C(a), s[2 * k], C(64 - a), s[2 * k + 1]);
        b[2 * k + 1] = hb(C(64 - a), s[2 * k], -C(a), s[2 * k + 1]);
    }
    for (int i = 0; i < 8; i++) {
        t[i] = b[i] + b[i + 8];
        t[i + 8] = b[i] - b[i + 8];
    }
    memcpy(b, t, sizeof(t));
    b[8] = hb(C(8), t[8], C(56), t[9]);
    b[9] = hb(C(56), t[8], -C(8), t[9]);
    b[10] = hb(C(40), t[10], C(24), t[11]);
    b[11] = hb(C(24), t[10], -C(40), t[11]);
    b[12] = hb(-C(56), t[12], C(8), t[13]);
    b[13] = hb(C(8), t[12], C(56), t[13]);
    b[14] = hb(-C(24), t[14], C(40), t[15]);
    b[15] = hb(C(40), t[14], C(24), t[15]);
    for (int i = 0; i < 4; i++) {
        t[i] = b[i] + b[i + 4];
        t[i + 4] = b[i] - b[i + 4];
        t[8 + i] = b[8 + i] + b[12 + i];
        t[12 + i] = b[8 + i] - b[12 + i];
    }
    memcpy(b, t, sizeof(t));
    for (int base = 4; base <= 12; base += 8) {
        b[base + 0] = hb(C(16), t[base + 0], C(48), t[base + 1]);
        b[base + 1] = hb(C(48), t[base + 0], -C(16), t[base + 1]);
        b[base + 2] = hb(-C(48), t[base + 2], C(16), t[base + 3]);
        b[base + 3] = hb(C(16), t[base + 2], C(48), t[base + 3]);
    }
    for (int g = 0; g < 4; g++) {
        int base = 4 * g;
        t[base + 0] = b[base + 0] + b[base + 2];
        t[base + 1] = b[base + 1] + b[base + 3];
        t[base + 2] = b[base + 0] - b[base + 2];
        t[base + 3] = b[base + 1] - b[base + 3];
    }
    memcpy(b, t, sizeof(t));
    for (int base = 2; base <= 14; base += 4) {
        b[base] = hb(C(32), t[base], C(32), t[base + 1]);
        b[base + 1] = hb(C(32), t[base], -C(32), t[base + 1]);
    }
    o[0] = b[0];
    o[1] = -b[8];
    o[2] = b[12];
    o[3] = -b[4];
    o[4] = b[6];
    o[5] = -b[14];
    o[6] = b[10];
    o[7] = -b[2];
    o[8] = b[3];
    o[9] = -b[11];
    o[10] = b[15];
    o[11] = -b[7];
    o[12] = b[5];
    o[13] = -b[13];
    o[14] = b[9];
    o[15] = -b[1];
}

void iidentity(const int64_t *x, int64_t *o, int stride, int n) {
    for (int i = 0; i < n; i++) {
        int64_t v = x[i * stride];
        switch (n) {
            case 4: o[i] = round2(v * SQRT2, 12); break;
            case 8: o[i] = v * 2; break;
            case 16: o[i] = round2(v * 2 * SQRT2, 12); break;
            default: o[i] = v * 4; break;
        }
    }
}

void apply_1d(int kind, const int64_t *in, int64_t *out, int stride, int n) {
    if (kind == 0) {
        switch (n) {
            case 4: idct4(in, out, stride); return;
            case 8: idct8(in, out, stride); return;
            case 16: idct16(in, out, stride); return;
            case 32: idct32(in, out, stride); return;
            default: idct64(in, out, stride); return;
        }
    }
    if (kind == 1) {
        switch (n) {
            case 4: iadst4(in, out, stride); return;
            case 8: iadst8(in, out, stride); return;
            default: iadst16(in, out, stride); return;
        }
    }
    iidentity(in, out, stride, n);
}

inline int ilog2i(int v) { return 31 - __builtin_clz(v); }

// tx_type -> vert kind, horz kind, flip_v, flip_h; kind 0=dct 1=adst 2=id
static const int TX1D[16][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {0, 1, 0, 0}, {1, 1, 0, 0},
    {1, 0, 1, 0}, {0, 1, 0, 1}, {1, 1, 1, 1}, {1, 1, 0, 1},
    {1, 1, 1, 0}, {2, 2, 0, 0}, {0, 2, 0, 0}, {2, 0, 0, 0},
    {1, 2, 0, 0}, {2, 1, 0, 0}, {1, 2, 1, 0}, {2, 1, 0, 1},
};

}  // namespace

extern "C" {

// coeffs: int32 h*w row-major; out: int32 h*w residual
void inv_txfm(const int32_t *coeffs, int w, int h, int tx_type, int bit_depth,
              int32_t *out) {
    const int vert = TX1D[tx_type][0], horz = TX1D[tx_type][1];
    const int flip_v = TX1D[tx_type][2], flip_h = TX1D[tx_type][3];
    int row_shift, col_shift = 4;
    {
        const int area = w * h;
        if (area == 16 || (w == 4 && h == 8) || (w == 8 && h == 4))
            row_shift = 0;
        else if ((w == 8 && h == 8) || (w == 8 && h == 16) || (w == 16 && h == 8) ||
                 (w == 16 && h == 32) || (w == 32 && h == 16) || (w == 32 && h == 64) ||
                 (w == 64 && h == 32) || (w == 4 && h == 16) || (w == 16 && h == 4))
            row_shift = 1;
        else
            row_shift = 2;
    }
    static thread_local int64_t buf[64 * 64], tmp[64], outc[64];
    const bool rect2 = (ilog2i(w) - ilog2i(h) == 1) || (ilog2i(h) - ilog2i(w) == 1);
    for (int r = 0; r < h; r++)
        for (int c2 = 0; c2 < w; c2++) {
            int64_t v = coeffs[r * w + c2];
            if (rect2) v = round2(v * INV_SQRT2, 12);
            buf[r * w + c2] = v;
        }
    const int64_t lim = 1ll << (bit_depth == 8 ? 15 : bit_depth + 7);
    // rows
    for (int r = 0; r < h; r++) {
        for (int c2 = 0; c2 < w; c2++) tmp[c2] = buf[r * w + c2];
        apply_1d(horz, tmp, outc, 1, w);
        for (int c2 = 0; c2 < w; c2++) {
            int64_t v = row_shift ? round2(outc[c2], row_shift) : outc[c2];
            if (v < -lim) v = -lim;
            if (v > lim - 1) v = lim - 1;
            buf[r * w + c2] = v;
        }
    }
    // cols
    for (int c2 = 0; c2 < w; c2++) {
        apply_1d(vert, buf + c2, outc, w, h);
        for (int r = 0; r < h; r++) buf[r * w + c2] = round2(outc[r], col_shift);
    }
    for (int r = 0; r < h; r++)
        for (int c2 = 0; c2 < w; c2++) {
            int rr = flip_v ? h - 1 - r : r;
            int cc = flip_h ? w - 1 - c2 : c2;
            out[r * w + c2] = (int32_t)buf[rr * w + cc];
        }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused encoder-side forward transform + quantize + dequantize.
// The forward transform is the float model (Fv @ x @ FhT * scale) matching
// rav1e_tpu.ops.transforms_np.forward_transform; quantization matches
// ops.quantize_np (deadzone bias_num/32, normative dequant).
// ---------------------------------------------------------------------------

// thr1: RD coefficient-thinning threshold in the shifted coefficient
// domain (|c|<<shift units).  AC coefficients that quantize to +-1 with
// magnitude below thr1 are zeroed: the distortion saved by coding them
// (~q*(2|x|-q) in x^2 units) is not worth the coefficient rate.  0 keeps
// every level (legacy deadzone-only behaviour).
extern "C" void fdct_quant(const int32_t *resid, int w, int h,
                           const double *Fv, const double *FhT, double scale,
                           int dc_q, int ac_q, int shift, int bias_num,
                           int bd, int32_t *levels_out, int32_t *dq_out,
                           double thr1) {
    // tmp = Fv (h x h) @ resid (h x w).  ikj loop order: the inner j loop
    // is contiguous (auto-vectorizes); per-element accumulation order over
    // k is unchanged, so results are bit-identical to the naive form.
    std::vector<double> tmp((size_t)h * w), row2((size_t)w);
    for (int i = 0; i < h; i++) {
        const double *frow = Fv + (size_t)i * h;
        double *trow = &tmp[(size_t)i * w];
        for (int j = 0; j < w; j++) trow[j] = 0.0;
        for (int k = 0; k < h; k++) {
            const double f = frow[k];
            const int32_t *rrow = resid + (size_t)k * w;
            for (int j = 0; j < w; j++) trow[j] += f * rrow[j];
        }
    }
    const int64_t lim = 1ll << (bd + 7);
    for (int i = 0; i < h; i++) {
        const double *trow = &tmp[(size_t)i * w];
        double *out = row2.data();
        for (int j = 0; j < w; j++) out[j] = 0.0;
        for (int k = 0; k < w; k++) {
            const double t = trow[k];
            const double *fr = FhT + (size_t)k * w;
            for (int j = 0; j < w; j++) out[j] += t * fr[j];
        }
        for (int j = 0; j < w; j++) {
            double cf = out[j] * scale;
            int64_t c = (int64_t)std::nearbyint(cf);  // round-half-even, matches np.round
            // beyond-32 coefficients are zeroed by the caller convention
            int64_t q = (i == 0 && j == 0) ? dc_q : ac_q;
            int64_t x = c << shift;
            int64_t mag = x < 0 ? -x : x;
            int64_t bias = (q * bias_num) >> 5;
            int64_t level = (mag + bias) / q;
            if (level > 32767) level = 32767;
            if (level == 1 && !(i == 0 && j == 0) && (double)mag < thr1)
                level = 0;
            int64_t slevel = x < 0 ? -level : level;
            levels_out[(size_t)i * w + j] = (int32_t)slevel;
            int64_t dmag = (level * q) & 0xFFFFFF;
            int64_t dq = (x < 0 ? -1 : 1) * (dmag >> shift);
            if (dq < -lim) dq = -lim;
            if (dq > lim - 1) dq = lim - 1;
            dq_out[(size_t)i * w + j] = (int32_t)dq;
        }
    }
}
