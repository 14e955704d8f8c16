"""AV1 transforms - numpy reference implementation (the correctness oracle).

Inverse transforms are NORMATIVE (spec 7.13.3): the reconstruction they
produce must match the decoder bit-exactly - this is validated end-to-end by
decoding our streams with libdav1d.  Forward transforms are an encoder
choice; we use the matching integer networks so rate/distortion estimates
operate on exactly the coefficients the decoder will see.

Structure follows the spec's butterfly networks (inverse DCT 4..64, ADST
4/8/16, identity), with Round2 after each rotation (cos_bit=12) and the
normative row/column shifts.  Saturation clamps only matter for adversarial
streams; as an encoder our intermediates stay far from the clamp bounds, and
the dav1d conformance tests gate the result.

(Reference encoder analog: src/transform/{forward,inverse}.rs.)

Layout conventions:
  - coefficient blocks are numpy int32 arrays of shape (h, w) in natural
    (row-major pixel) order;
  - 1D transforms run along the LAST axis; callers transpose for columns.
"""

from __future__ import annotations

import numpy as np

COS_BIT = 12
# cospi[i] = round(cos(i*pi/128) * 2^12) -- normative cos128 table
COSPI = np.round(np.cos(np.arange(64) * np.pi / 128) * 4096).astype(np.int64)
SINPI = np.array([0, 1321, 2482, 3344, 3803], dtype=np.int64)  # iadst4
SQRT2 = 5793  # round(sqrt(2) * 4096)
INV_SQRT2 = 2896  # round(4096 / sqrt(2))


def round2(x, bit):
    return (x + (1 << (bit - 1))) >> bit


def hb(w0, x0, w1, x1):
    """half_btf: Round2(w0*x0 + w1*x1, 12).  Inputs int64 arrays."""
    return round2(w0 * x0 + w1 * x1, COS_BIT)


c = COSPI  # brevity


# ---------------------------------------------------------------------------
# 1D inverse transforms.  x: (..., N) int64, natural frequency order.
# ---------------------------------------------------------------------------

def idct4(x):
    s0, s1, s2, s3 = x[..., 0], x[..., 2], x[..., 1], x[..., 3]
    b0 = hb(c[32], s0, c[32], s1)
    b1 = hb(c[32], s0, -c[32], s1)
    b2 = hb(c[48], s2, -c[16], s3)
    b3 = hb(c[16], s2, c[48], s3)
    return np.stack([b0 + b3, b1 + b2, b1 - b2, b0 - b3], axis=-1)


def idct8(x):
    ev = idct4(x[..., 0::2])
    s4, s5, s6, s7 = x[..., 1], x[..., 5], x[..., 3], x[..., 7]
    b4 = hb(c[56], s4, -c[8], s7)
    b5 = hb(c[24], s5, -c[40], s6)
    b6 = hb(c[40], s5, c[24], s6)
    b7 = hb(c[8], s4, c[56], s7)
    s4 = b4 + b5
    s5 = b4 - b5
    s6 = -b6 + b7
    s7 = b6 + b7
    b5 = hb(-c[32], s5, c[32], s6)
    b6 = hb(c[32], s5, c[32], s6)
    o = [
        ev[..., 0] + s7,
        ev[..., 1] + b6,
        ev[..., 2] + b5,
        ev[..., 3] + s4,
        ev[..., 3] - s4,
        ev[..., 2] - b5,
        ev[..., 1] - b6,
        ev[..., 0] - s7,
    ]
    return np.stack(o, axis=-1)


def idct16(x):
    ev = idct8(x[..., 0::2])
    # odd inputs: in1, in9, in5, in13, in3, in11, in7, in15
    s = [x[..., 1], x[..., 9], x[..., 5], x[..., 13], x[..., 3], x[..., 11], x[..., 7], x[..., 15]]
    b8 = hb(c[60], s[0], -c[4], s[7])
    b15 = hb(c[4], s[0], c[60], s[7])
    b9 = hb(c[28], s[1], -c[36], s[6])
    b14 = hb(c[36], s[1], c[28], s[6])
    b10 = hb(c[44], s[2], -c[20], s[5])
    b13 = hb(c[20], s[2], c[44], s[5])
    b11 = hb(c[12], s[3], -c[52], s[4])
    b12 = hb(c[52], s[3], c[12], s[4])
    # hadamard pairs, alternating (+,-) / (-,+)
    s8 = b8 + b9
    s9 = b8 - b9
    s10 = -b10 + b11
    s11 = b10 + b11
    s12 = b12 + b13
    s13 = b12 - b13
    s14 = -b14 + b15
    s15 = b14 + b15
    # twiddles
    b9 = hb(-c[16], s9, c[48], s14)
    b14 = hb(c[48], s9, c[16], s14)
    b10 = hb(-c[48], s10, -c[16], s13)
    b13 = hb(-c[16], s10, c[48], s13)
    b8, b11, b12, b15 = s8, s11, s12, s15
    # hadamard group of 4
    s8 = b8 + b11
    s9 = b9 + b10
    s10 = b9 - b10
    s11 = b8 - b11
    s12 = -b12 + b15
    s13 = -b13 + b14
    s14 = b13 + b14
    s15 = b12 + b15
    # final half-rotations
    b10 = hb(-c[32], s10, c[32], s13)
    b13 = hb(c[32], s10, c[32], s13)
    b11 = hb(-c[32], s11, c[32], s12)
    b12 = hb(c[32], s11, c[32], s12)
    odd = [s8, s9, b10, b11, b12, b13, s14, s15]
    o = [ev[..., i] + odd[7 - i] for i in range(8)] + [
        ev[..., 7 - i] - odd[i] for i in range(8)
    ]
    return np.stack(o, axis=-1)


def idct32(x):
    ev = idct16(x[..., 0::2])
    idx = [1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31]
    s = [x[..., i] for i in idx]
    ang = [62, 30, 46, 14, 54, 22, 38, 6]
    b = [None] * 32
    for k in range(8):
        b[16 + k] = hb(c[ang[k]], s[k], -c[64 - ang[k]], s[15 - k])
        b[31 - k] = hb(c[64 - ang[k]], s[k], c[ang[k]], s[15 - k])
    # hadamard pairs, alternating (+,-) / (-,+)
    t = [None] * 32
    t[16] = b[16] + b[17]
    t[17] = b[16] - b[17]
    t[18] = -b[18] + b[19]
    t[19] = b[18] + b[19]
    t[20] = b[20] + b[21]
    t[21] = b[20] - b[21]
    t[22] = -b[22] + b[23]
    t[23] = b[22] + b[23]
    t[24] = b[24] + b[25]
    t[25] = b[24] - b[25]
    t[26] = -b[26] + b[27]
    t[27] = b[26] + b[27]
    t[28] = b[28] + b[29]
    t[29] = b[28] - b[29]
    t[30] = -b[30] + b[31]
    t[31] = b[30] + b[31]
    b = list(t)
    b[17] = hb(-c[8], t[17], c[56], t[30])
    b[30] = hb(c[56], t[17], c[8], t[30])
    b[18] = hb(-c[56], t[18], -c[8], t[29])
    b[29] = hb(-c[8], t[18], c[56], t[29])
    b[21] = hb(-c[40], t[21], c[24], t[26])
    b[26] = hb(c[24], t[21], c[40], t[26])
    b[22] = hb(-c[24], t[22], -c[40], t[25])
    b[25] = hb(-c[40], t[22], c[24], t[25])
    # hadamard groups of 4, alternating by group
    t = [None] * 32
    t[16] = b[16] + b[19]
    t[17] = b[17] + b[18]
    t[18] = b[17] - b[18]
    t[19] = b[16] - b[19]
    t[20] = -b[20] + b[23]
    t[21] = -b[21] + b[22]
    t[22] = b[21] + b[22]
    t[23] = b[20] + b[23]
    t[24] = b[24] + b[27]
    t[25] = b[25] + b[26]
    t[26] = b[25] - b[26]
    t[27] = b[24] - b[27]
    t[28] = -b[28] + b[31]
    t[29] = -b[29] + b[30]
    t[30] = b[29] + b[30]
    t[31] = b[28] + b[31]
    b = list(t)
    b[18] = hb(-c[16], t[18], c[48], t[29])
    b[29] = hb(c[48], t[18], c[16], t[29])
    b[19] = hb(-c[16], t[19], c[48], t[28])
    b[28] = hb(c[48], t[19], c[16], t[28])
    b[20] = hb(-c[48], t[20], -c[16], t[27])
    b[27] = hb(-c[16], t[20], c[48], t[27])
    b[21] = hb(-c[48], t[21], -c[16], t[26])
    b[26] = hb(-c[16], t[21], c[48], t[26])
    t = [None] * 32
    t[16] = b[16] + b[23]
    t[17] = b[17] + b[22]
    t[18] = b[18] + b[21]
    t[19] = b[19] + b[20]
    t[20] = b[19] - b[20]
    t[21] = b[18] - b[21]
    t[22] = b[17] - b[22]
    t[23] = b[16] - b[23]
    t[24] = -b[24] + b[31]
    t[25] = -b[25] + b[30]
    t[26] = -b[26] + b[29]
    t[27] = -b[27] + b[28]
    t[28] = b[27] + b[28]
    t[29] = b[26] + b[29]
    t[30] = b[25] + b[30]
    t[31] = b[24] + b[31]
    b = list(t)
    for k in range(20, 24):
        b[k] = hb(-c[32], t[k], c[32], t[47 - k])
        b[47 - k] = hb(c[32], t[k], c[32], t[47 - k])
    odd = [b[16 + k] for k in range(16)]
    o = [ev[..., i] + odd[15 - i] for i in range(16)] + [
        ev[..., 15 - i] - odd[i] for i in range(16)
    ]
    return np.stack(o, axis=-1)


def idct64(x):
    """64-point inverse DCT.  Only the first 32 inputs may be nonzero
    (normative: high coefficients are not coded)."""
    ev = idct32(x[..., 0::2])
    idx = [1, 33, 17, 49, 9, 41, 25, 57, 5, 37, 21, 53, 13, 45, 29, 61,
           3, 35, 19, 51, 11, 43, 27, 59, 7, 39, 23, 55, 15, 47, 31, 63]
    s = [x[..., i] for i in idx]
    ang = [63, 31, 47, 15, 55, 23, 39, 7, 59, 27, 43, 11, 51, 19, 35, 3]
    b = [None] * 64
    for k in range(16):
        b[32 + k] = hb(c[ang[k]], s[k], -c[64 - ang[k]], s[31 - k])
        b[63 - k] = hb(c[64 - ang[k]], s[k], c[ang[k]], s[31 - k])

    def twiddle(cur, pairs):
        nxt = list(cur)
        for (i, j, a, neg) in pairs:
            ti, tj = cur[i], cur[j]
            if not neg:
                nxt[i] = hb(-c[a], ti, c[64 - a], tj)
                nxt[j] = hb(c[64 - a], ti, c[a], tj)
            else:
                nxt[i] = hb(-c[64 - a], ti, -c[a], tj)
                nxt[j] = hb(-c[a], ti, c[64 - a], tj)
        return nxt

    # hadamard pairs, alternating (+,-) / (-,+) per pair
    t = [None] * 64
    for p in range(16):
        i = 32 + 2 * p
        if p % 2 == 0:
            t[i] = b[i] + b[i + 1]
            t[i + 1] = b[i] - b[i + 1]
        else:
            t[i] = -b[i] + b[i + 1]
            t[i + 1] = b[i] + b[i + 1]
    # twiddles (groups of 4 with angles 4, 36, 20, 52)
    b = twiddle(t, [
        (33, 62, 4, False), (34, 61, 4, True),
        (37, 58, 36, False), (38, 57, 36, True),
        (41, 54, 20, False), (42, 53, 20, True),
        (45, 50, 52, False), (46, 49, 52, True),
    ])
    # hadamard groups of 4, alternating by group
    t = list(b)
    for g in range(8):
        base = 32 + 4 * g
        if g % 2 == 0:
            t[base + 0] = b[base + 0] + b[base + 3]
            t[base + 1] = b[base + 1] + b[base + 2]
            t[base + 2] = b[base + 1] - b[base + 2]
            t[base + 3] = b[base + 0] - b[base + 3]
        else:
            t[base + 0] = -b[base + 0] + b[base + 3]
            t[base + 1] = -b[base + 1] + b[base + 2]
            t[base + 2] = b[base + 1] + b[base + 2]
            t[base + 3] = b[base + 0] + b[base + 3]
    # twiddles (groups of 8 with angles 8, 40)
    b = twiddle(t, [
        (34, 61, 8, False), (35, 60, 8, False),
        (36, 59, 8, True), (37, 58, 8, True),
        (42, 53, 40, False), (43, 52, 40, False),
        (44, 51, 40, True), (45, 50, 40, True),
    ])
    # hadamard groups of 8, alternating by group
    t = list(b)
    for g in range(4):
        base = 32 + 8 * g
        for k in range(4):
            if g % 2 == 0:
                t[base + k] = b[base + k] + b[base + 7 - k]
                t[base + 7 - k] = b[base + k] - b[base + 7 - k]
            else:
                t[base + k] = -b[base + k] + b[base + 7 - k]
                t[base + 7 - k] = b[base + k] + b[base + 7 - k]
    # twiddles (group of 16 with angle 16)
    b = twiddle(t, [
        (36, 59, 16, False), (37, 58, 16, False),
        (38, 57, 16, False), (39, 56, 16, False),
        (40, 55, 16, True), (41, 54, 16, True),
        (42, 53, 16, True), (43, 52, 16, True),
    ])
    # hadamard group of 16
    t = list(b)
    for k in range(8):
        t[32 + k] = b[32 + k] + b[47 - k]
        t[47 - k] = b[32 + k] - b[47 - k]
        t[48 + k] = -b[48 + k] + b[63 - k]
        t[63 - k] = b[48 + k] + b[63 - k]
    # final half-rotations
    b = list(t)
    for k in range(40, 48):
        b[k] = hb(-c[32], t[k], c[32], t[95 - k])
        b[95 - k] = hb(c[32], t[k], c[32], t[95 - k])
    odd = [b[32 + k] for k in range(32)]
    o = [ev[..., i] + odd[31 - i] for i in range(32)] + [
        ev[..., 31 - i] - odd[i] for i in range(32)
    ]
    return np.stack(o, axis=-1)


def iadst4(x):
    x0, x1, x2, x3 = (x[..., i].astype(np.int64) for i in range(4))
    s0 = SINPI[1] * x0
    s1 = SINPI[2] * x0
    s2 = SINPI[3] * x1
    s3 = SINPI[4] * x2
    s4 = SINPI[1] * x2
    s5 = SINPI[2] * x3
    s6 = SINPI[4] * x3
    a7 = x0 - x2
    b7 = a7 + x3
    s0 = s0 + s3
    s1 = s1 - s4
    s3 = s2
    s2 = SINPI[3] * b7
    s0 = s0 + s5
    s1 = s1 - s6
    o0 = s0 + s3
    o1 = s1 + s3
    o2 = s2
    o3 = s0 + s1 - s3
    return np.stack([round2(o0, 12), round2(o1, 12), round2(o2, 12), round2(o3, 12)], axis=-1)


def iadst8(x):
    s = [x[..., 7], x[..., 0], x[..., 5], x[..., 2], x[..., 3], x[..., 4], x[..., 1], x[..., 6]]
    b0 = hb(c[4], s[0], c[60], s[1])
    b1 = hb(c[60], s[0], -c[4], s[1])
    b2 = hb(c[20], s[2], c[44], s[3])
    b3 = hb(c[44], s[2], -c[20], s[3])
    b4 = hb(c[36], s[4], c[28], s[5])
    b5 = hb(c[28], s[4], -c[36], s[5])
    b6 = hb(c[52], s[6], c[12], s[7])
    b7 = hb(c[12], s[6], -c[52], s[7])
    s0 = b0 + b4
    s1 = b1 + b5
    s2 = b2 + b6
    s3 = b3 + b7
    s4 = b0 - b4
    s5 = b1 - b5
    s6 = b2 - b6
    s7 = b3 - b7
    b4 = hb(c[16], s4, c[48], s5)
    b5 = hb(c[48], s4, -c[16], s5)
    b6 = hb(-c[48], s6, c[16], s7)
    b7 = hb(c[16], s6, c[48], s7)
    t0 = s0 + s2
    t1 = s1 + s3
    t2 = s0 - s2
    t3 = s1 - s3
    t4 = b4 + b6
    t5 = b5 + b7
    t6 = b4 - b6
    t7 = b5 - b7
    b2 = hb(c[32], t2, c[32], t3)
    b3 = hb(c[32], t2, -c[32], t3)
    b6 = hb(c[32], t6, c[32], t7)
    b7 = hb(c[32], t6, -c[32], t7)
    return np.stack([t0, -t4, b6, -b2, b3, -b7, t5, -t1], axis=-1)


def iadst16(x):
    s = [
        x[..., 15], x[..., 0], x[..., 13], x[..., 2], x[..., 11], x[..., 4],
        x[..., 9], x[..., 6], x[..., 7], x[..., 8], x[..., 5], x[..., 10],
        x[..., 3], x[..., 12], x[..., 1], x[..., 14],
    ]
    ang = [2, 10, 18, 26, 34, 42, 50, 58]
    b = []
    for k in range(8):
        a = ang[k]
        b.append(hb(c[a], s[2 * k], c[64 - a], s[2 * k + 1]))
        b.append(hb(c[64 - a], s[2 * k], -c[a], s[2 * k + 1]))
    t = [b[i] + b[i + 8] for i in range(8)] + [b[i] - b[i + 8] for i in range(8)]
    b = list(t)
    b[8] = hb(c[8], t[8], c[56], t[9])
    b[9] = hb(c[56], t[8], -c[8], t[9])
    b[10] = hb(c[40], t[10], c[24], t[11])
    b[11] = hb(c[24], t[10], -c[40], t[11])
    b[12] = hb(-c[56], t[12], c[8], t[13])
    b[13] = hb(c[8], t[12], c[56], t[13])
    b[14] = hb(-c[24], t[14], c[40], t[15])
    b[15] = hb(c[40], t[14], c[24], t[15])
    t = [b[i] + b[i + 4] for i in range(4)] + [b[i] - b[i + 4] for i in range(4)]
    t += [b[8 + i] + b[12 + i] for i in range(4)] + [b[8 + i] - b[12 + i] for i in range(4)]
    b = list(t)
    for base in (4, 12):
        b[base + 0] = hb(c[16], t[base + 0], c[48], t[base + 1])
        b[base + 1] = hb(c[48], t[base + 0], -c[16], t[base + 1])
        b[base + 2] = hb(-c[48], t[base + 2], c[16], t[base + 3])
        b[base + 3] = hb(c[16], t[base + 2], c[48], t[base + 3])
    t = [b[i] + b[i + 2] for i in (0, 1)] + [b[i] - b[i + 2] for i in (0, 1)]
    t += [b[i] + b[i + 2] for i in (4, 5)] + [b[i] - b[i + 2] for i in (4, 5)]
    t += [b[i] + b[i + 2] for i in (8, 9)] + [b[i] - b[i + 2] for i in (8, 9)]
    t += [b[i] + b[i + 2] for i in (12, 13)] + [b[i] - b[i + 2] for i in (12, 13)]
    b = list(t)
    for base in (2, 6, 10, 14):
        b[base] = hb(c[32], t[base], c[32], t[base + 1])
        b[base + 1] = hb(c[32], t[base], -c[32], t[base + 1])
    out = [
        b[0], -b[8], b[12], -b[4], b[6], -b[14], b[10], -b[2],
        b[3], -b[11], b[15], -b[7], b[5], -b[13], b[9], -b[1],
    ]
    return np.stack(out, axis=-1)


def iidentity(x, n):
    if n == 4:
        return round2(x * SQRT2, 12)
    if n == 8:
        return x * 2
    if n == 16:
        return round2(x * 2 * SQRT2, 12)
    if n == 32:
        return x * 4
    raise ValueError(n)


IDCT = {4: idct4, 8: idct8, 16: idct16, 32: idct32, 64: idct64}
IADST = {4: iadst4, 8: iadst8, 16: iadst16}

# tx_type enum (spec order)
DCT_DCT = 0
ADST_DCT = 1
DCT_ADST = 2
ADST_ADST = 3
FLIPADST_DCT = 4
DCT_FLIPADST = 5
FLIPADST_FLIPADST = 6
ADST_FLIPADST = 7
FLIPADST_ADST = 8
IDTX = 9
V_DCT = 10
H_DCT = 11
V_ADST = 12
H_ADST = 13
V_FLIPADST = 14
H_FLIPADST = 15

# tx_type -> (vert kind, horz kind, flip_v, flip_h); kind in {dct, adst, id}
_TX1D = {
    DCT_DCT: ("dct", "dct", 0, 0),
    ADST_DCT: ("adst", "dct", 0, 0),
    DCT_ADST: ("dct", "adst", 0, 0),
    ADST_ADST: ("adst", "adst", 0, 0),
    FLIPADST_DCT: ("adst", "dct", 1, 0),
    DCT_FLIPADST: ("dct", "adst", 0, 1),
    FLIPADST_FLIPADST: ("adst", "adst", 1, 1),
    ADST_FLIPADST: ("adst", "adst", 0, 1),
    FLIPADST_ADST: ("adst", "adst", 1, 0),
    IDTX: ("id", "id", 0, 0),
    V_DCT: ("dct", "id", 0, 0),
    H_DCT: ("id", "dct", 0, 0),
    V_ADST: ("adst", "id", 0, 0),
    H_ADST: ("id", "adst", 0, 0),
    V_FLIPADST: ("adst", "id", 1, 0),
    H_FLIPADST: ("id", "adst", 0, 1),
}


def _apply_1d(kind: str, x: np.ndarray, n: int) -> np.ndarray:
    if kind == "dct":
        return IDCT[n](x)
    if kind == "adst":
        return IADST[n](x)
    return iidentity(x, n)


# normative inverse shifts {row, col} per (w, h)
def _inv_shifts(w: int, h: int) -> tuple:
    area = w * h
    if area == 16 or (w, h) in ((4, 8), (8, 4)):
        return (0, 4)
    if (w, h) in ((8, 8), (8, 16), (16, 8), (16, 32), (32, 16), (32, 64), (64, 32), (4, 16), (16, 4)):
        return (1, 4)
    return (2, 4)


_FWD_CACHE: dict = {}


def _inv_basis_1d(kind: str, n: int) -> np.ndarray:
    """Float model of the integer 1D inverse: out = B @ x (exact up to
    per-stage rounding).  B[n_out, k_in]."""
    key = (kind, n)
    if key in _FWD_CACHE:
        return _FWD_CACHE[key]
    if kind == "dct":
        nn = np.arange(n)
        k = np.arange(n)
        B = np.cos((2 * nn[:, None] + 1) * k[None, :] * np.pi / (2 * n))
        scale = np.where(k == 0, np.sqrt(1 / n), np.sqrt(2 / n)) * np.sqrt(n / 2)
        B = B * scale
    elif kind == "adst":
        if n == 4:
            s = SINPI / 4096.0
            B = np.array(
                [
                    [s[1], s[3], s[4], s[2]],
                    [s[2], s[3], -s[1], -s[4]],
                    [s[3], 0.0, -s[3], s[3]],
                    [s[4], -s[3], s[2], -s[1]],
                ]
            )
        else:
            nn = np.arange(n)
            k = np.arange(n)
            B = np.sin((2 * nn[:, None] + 1) * (2 * k[None, :] + 1) * np.pi / (4 * n))
    else:  # identity
        gain = {4: SQRT2 / 4096.0, 8: 2.0, 16: 2 * SQRT2 / 4096.0, 32: 4.0}[n]
        B = np.eye(n) * gain
    _FWD_CACHE[key] = B
    return B


_FWD_MAT_CACHE: dict = {}


def _fwd_mats(tx_type: int, w: int, h: int):
    """Cached (Fv, FhT, scale) such that C = Fv @ r @ FhT * scale."""
    key = (tx_type, w, h)
    m = _FWD_MAT_CACHE.get(key)
    if m is None:
        vert, horz, _, _ = _TX1D[tx_type]
        Bh = _inv_basis_1d(horz, w)
        Bv = _inv_basis_1d(vert, h)
        row_shift, col_shift = _inv_shifts(w, h)
        scale = float(1 << (row_shift + col_shift))
        if abs(int(np.log2(w)) - int(np.log2(h))) == 1:
            scale *= 4096.0 / INV_SQRT2  # undo the InvSqrt2 pre-scale
        m = (np.linalg.inv(Bv), np.linalg.inv(Bh).T, scale)
        _FWD_MAT_CACHE[key] = m
    return m


def forward_transform(residual: np.ndarray, tx_type: int, bit_depth: int = 8) -> np.ndarray:
    """Encoder-side forward transform: the float inverse of the normative
    integer inverse mapping, so inverse_transform(forward_transform(r)) ~ r.
    Output coefficients are on the exact scale the decoder dequantizes.
    Supports batched input (..., h, w)."""
    h, w = residual.shape[-2:]
    _, _, flip_v, flip_h = _TX1D[tx_type]
    x = residual.astype(np.float64)
    if flip_v:
        x = x[..., ::-1, :]
    if flip_h:
        x = x[..., :, ::-1]
    Fv, FhT, scale = _fwd_mats(tx_type, w, h)
    coeffs = Fv @ x @ FhT * scale
    return np.round(coeffs).astype(np.int32)


_FQ_CACHE: dict = {}


_TX_ALPHA_CACHE: dict = {}


def tx_alpha(w: int, h: int, bit_depth: int = 8) -> float:
    """Pixel-SSE per unit of squared shifted-coefficient error for a (w, h)
    transform: pixel_sse ~= alpha * sum((dx)^2) where dx is measured in the
    |c|<<tx_scale domain the quantizer compares against.  Calibrated once
    per size by random probing of the normative inverse transform."""
    key = (w, h)
    a = _TX_ALPHA_CACHE.get(key)
    if a is None:
        from rav1e_tpu.ops.quantize_np import tx_scale

        rng = np.random.default_rng(1234)
        num = 0.0
        den = 0.0
        for _ in range(4):
            c = rng.integers(-64, 65, size=(h, w)).astype(np.int32)
            px = inverse_transform_native(c, DCT_DCT, bit_depth).astype(np.float64)
            num += float((px * px).sum())
            den += float((c.astype(np.float64) ** 2).sum())
        a = (num / den) / float(4 ** tx_scale(w, h))
        _TX_ALPHA_CACHE[key] = a
    return a


def fdct_quant_native(resid: np.ndarray, tx_type: int, dc_q: int, ac_q: int,
                      bit_depth: int = 8, bias_num: int | None = None,
                      thr1: float = 0.0):
    """Fused forward transform + quantize + dequantize via native/transforms.cc.
    Returns (levels, dq) int32 (h, w); exact match of forward_transform +
    quantize_np.quantize/dequantize for tx dims <= 32.

    thr1 > 0 enables RD coefficient thinning: AC levels of +-1 whose
    shifted coefficient magnitude is below thr1 are zeroed (noise not
    worth its rate; reference analog: deadzone tuning in src/quantize.rs
    and libaom's optimize_txb)."""
    import ctypes

    if bias_num is None:
        # track the live deadzone setting — the C++ block coder reads the
        # same value through set_quant_bias, so python/native paths stay
        # byte-identical (a hardcoded 13 here vs 16 there desynced them)
        from rav1e_tpu.ops.quantize_np import QUANT_BIAS_NUM

        bias_num = QUANT_BIAS_NUM
    h, w = resid.shape
    nat = _native_inv()
    if not nat:
        from rav1e_tpu.ops import quantize_np as qz

        coeffs = forward_transform(resid, tx_type, bit_depth)
        levels = qz.quantize(coeffs, dc_q, ac_q, w, h)
        if thr1 > 0.0:
            shift = qz.tx_scale(w, h)
            mag = np.abs(coeffs.astype(np.int64)) << shift
            drop = (np.abs(levels) == 1) & (mag < thr1)
            drop.flat[0] = False
            levels = np.where(drop, 0, levels)
        return levels, qz.dequantize(levels, dc_q, ac_q, w, h, bit_depth)
    lib = nat[0]
    key = (tx_type, w, h)
    m = _FQ_CACHE.get(key)
    if m is None:
        Fv, FhT, scale = _fwd_mats(tx_type, w, h)
        m = (np.ascontiguousarray(Fv, np.float64),
             np.ascontiguousarray(FhT, np.float64), float(scale))
        _FQ_CACHE[key] = m
    Fv, FhT, scale = m
    _, _, flip_v, flip_h = _TX1D[tx_type]
    x = resid
    if flip_v:
        x = x[::-1, :]
    if flip_h:
        x = x[:, ::-1]
    x = np.ascontiguousarray(x, np.int32)
    shift = (1 if w * h > 256 else 0) + (1 if w * h > 1024 else 0)
    levels = np.empty((h, w), np.int32)
    dq = np.empty((h, w), np.int32)
    lib.fdct_quant(
        ctypes.c_void_p(x.ctypes.data), w, h,
        ctypes.c_void_p(Fv.ctypes.data), ctypes.c_void_p(FhT.ctypes.data),
        ctypes.c_double(scale), dc_q, ac_q, shift, bias_num, bit_depth,
        ctypes.c_void_p(levels.ctypes.data), ctypes.c_void_p(dq.ctypes.data),
        ctypes.c_double(thr1),
    )
    return levels, dq


_NATIVE_INV = None


def _native_inv():
    global _NATIVE_INV
    if _NATIVE_INV is None:
        import ctypes
        from pathlib import Path

        so = Path(__file__).resolve().parent.parent.parent / "native" / "libmsac.so"
        try:
            if not so.exists():
                import subprocess

                subprocess.run(["make", "-C", str(so.parent)], check=True, capture_output=True)
            lib = ctypes.CDLL(str(so))
            p32 = ctypes.POINTER(ctypes.c_int32)
            lib.inv_txfm.argtypes = [p32, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, p32]
            vp = ctypes.c_void_p
            lib.fdct_quant.argtypes = [
                vp, ctypes.c_int, ctypes.c_int, vp, vp, ctypes.c_double,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, vp, vp, ctypes.c_double,
            ]
            _NATIVE_INV = (lib, p32)
        except Exception:
            _NATIVE_INV = False
    return _NATIVE_INV


def inverse_transform_native(coeffs: np.ndarray, tx_type: int, bit_depth: int = 8) -> np.ndarray:
    """C++ inverse (bit-identical; parity-tested).  Falls back to numpy."""
    nat = _native_inv()
    if not nat:
        return inverse_transform(coeffs, tx_type, bit_depth)
    import ctypes

    lib, p32 = nat
    h, w = coeffs.shape
    cin = np.ascontiguousarray(coeffs, np.int32)
    out = np.empty((h, w), np.int32)
    lib.inv_txfm(cin.ctypes.data_as(p32), w, h, tx_type, bit_depth, out.ctypes.data_as(p32))
    return out


def inverse_transform(coeffs: np.ndarray, tx_type: int, bit_depth: int = 8) -> np.ndarray:
    """coeffs: (h, w) int32 dequantized.  Returns (h, w) int32 residual."""
    h, w = coeffs.shape
    vert, horz, flip_v, flip_h = _TX1D[tx_type]
    row_shift, col_shift = _inv_shifts(w, h)
    x = coeffs.astype(np.int64)

    # rectangular 2:1 scale on row-transform input
    if abs(int(np.log2(w)) - int(np.log2(h))) == 1:
        x = round2(x * INV_SQRT2, 12)

    # row transforms (along w); 64-point uses only 32 coeffs (already zero)
    rw = min(w, 64)
    x = _apply_1d(horz, x, w)
    x = round2(x, row_shift) if row_shift else x
    # intermediate clamp (16-bit range for 8-bit content)
    lim = 1 << (15 if bit_depth == 8 else bit_depth + 7)
    x = np.clip(x, -lim, lim - 1)
    # column transforms (along h)
    x = _apply_1d(vert, x.swapaxes(-1, -2), h).swapaxes(-1, -2)
    x = round2(x, col_shift)
    if flip_v:
        x = x[::-1, :]
    if flip_h:
        x = x[:, ::-1]
    return x.astype(np.int32)
