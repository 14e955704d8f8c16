"""AV1 transforms on device (JAX) — bit-exact integer inverse transforms,
float forward transforms, and the exact quantize/dequantize pair.

The inverse path is NORMATIVE (spec 7.13.3) and must match
ops/transforms_np.py (the numpy oracle, itself dav1d-conformance-tested)
bit for bit: the device wavefront encoder reconstructs with these, and the
decoder must land on identical samples.  All integer math is int32 — safe
for 8-bit content because dequantized inputs are clamped to +-2^15 and the
butterfly growth stays under 2^31 (the spec's own int32 guarantee for
conformant streams).  Reference encoder analog: src/transform/inverse.rs
(their asm tier); here the batch axis replaces SIMD lanes.

1D transforms run along the LAST axis of (..., N) int32 arrays, so whole
wavefronts of blocks batch through one network on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.ops import transforms_np as tn

COS_BIT = 12
_C = [int(v) for v in tn.COSPI]  # cospi as python ints (broadcast scalars)
_SINPI = [int(v) for v in tn.SINPI]
SQRT2 = 5793
INV_SQRT2 = 2896


def _r2(x, bit):
    return (x + (1 << (bit - 1))) >> bit


def _hb(w0, x0, w1, x1):
    """half_btf: Round2(w0*x0 + w1*x1, 12); int32 throughout."""
    return _r2(w0 * x0 + w1 * x1, COS_BIT)


c = _C


def idct4(x):
    s0, s1, s2, s3 = x[..., 0], x[..., 2], x[..., 1], x[..., 3]
    b0 = _hb(c[32], s0, c[32], s1)
    b1 = _hb(c[32], s0, -c[32], s1)
    b2 = _hb(c[48], s2, -c[16], s3)
    b3 = _hb(c[16], s2, c[48], s3)
    return jnp.stack([b0 + b3, b1 + b2, b1 - b2, b0 - b3], axis=-1)


def idct8(x):
    ev = idct4(x[..., 0::2])
    s4, s5, s6, s7 = x[..., 1], x[..., 5], x[..., 3], x[..., 7]
    b4 = _hb(c[56], s4, -c[8], s7)
    b5 = _hb(c[24], s5, -c[40], s6)
    b6 = _hb(c[40], s5, c[24], s6)
    b7 = _hb(c[8], s4, c[56], s7)
    s4 = b4 + b5
    s5 = b4 - b5
    s6 = -b6 + b7
    s7 = b6 + b7
    b5 = _hb(-c[32], s5, c[32], s6)
    b6 = _hb(c[32], s5, c[32], s6)
    o = [
        ev[..., 0] + s7, ev[..., 1] + b6, ev[..., 2] + b5, ev[..., 3] + s4,
        ev[..., 3] - s4, ev[..., 2] - b5, ev[..., 1] - b6, ev[..., 0] - s7,
    ]
    return jnp.stack(o, axis=-1)


def idct16(x):
    ev = idct8(x[..., 0::2])
    s = [x[..., 1], x[..., 9], x[..., 5], x[..., 13], x[..., 3], x[..., 11],
         x[..., 7], x[..., 15]]
    b8 = _hb(c[60], s[0], -c[4], s[7])
    b15 = _hb(c[4], s[0], c[60], s[7])
    b9 = _hb(c[28], s[1], -c[36], s[6])
    b14 = _hb(c[36], s[1], c[28], s[6])
    b10 = _hb(c[44], s[2], -c[20], s[5])
    b13 = _hb(c[20], s[2], c[44], s[5])
    b11 = _hb(c[12], s[3], -c[52], s[4])
    b12 = _hb(c[52], s[3], c[12], s[4])
    s8 = b8 + b9
    s9 = b8 - b9
    s10 = -b10 + b11
    s11 = b10 + b11
    s12 = b12 + b13
    s13 = b12 - b13
    s14 = -b14 + b15
    s15 = b14 + b15
    b9 = _hb(-c[16], s9, c[48], s14)
    b14 = _hb(c[48], s9, c[16], s14)
    b10 = _hb(-c[48], s10, -c[16], s13)
    b13 = _hb(-c[16], s10, c[48], s13)
    b8, b11, b12, b15 = s8, s11, s12, s15
    s8 = b8 + b11
    s9 = b9 + b10
    s10 = b9 - b10
    s11 = b8 - b11
    s12 = -b12 + b15
    s13 = -b13 + b14
    s14 = b13 + b14
    s15 = b12 + b15
    b10 = _hb(-c[32], s10, c[32], s13)
    b13 = _hb(c[32], s10, c[32], s13)
    b11 = _hb(-c[32], s11, c[32], s12)
    b12 = _hb(c[32], s11, c[32], s12)
    odd = [s8, s9, b10, b11, b12, b13, s14, s15]
    o = [ev[..., i] + odd[7 - i] for i in range(8)] + [
        ev[..., 7 - i] - odd[i] for i in range(8)
    ]
    return jnp.stack(o, axis=-1)


def idct32(x):
    ev = idct16(x[..., 0::2])
    idx = [1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31]
    s = [x[..., i] for i in idx]
    ang = [62, 30, 46, 14, 54, 22, 38, 6]
    b = [None] * 32
    for k in range(8):
        b[16 + k] = _hb(c[ang[k]], s[k], -c[64 - ang[k]], s[15 - k])
        b[31 - k] = _hb(c[64 - ang[k]], s[k], c[ang[k]], s[15 - k])
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
    b[17] = _hb(-c[8], t[17], c[56], t[30])
    b[30] = _hb(c[56], t[17], c[8], t[30])
    b[18] = _hb(-c[56], t[18], -c[8], t[29])
    b[29] = _hb(-c[8], t[18], c[56], t[29])
    b[21] = _hb(-c[40], t[21], c[24], t[26])
    b[26] = _hb(c[24], t[21], c[40], t[26])
    b[22] = _hb(-c[24], t[22], -c[40], t[25])
    b[25] = _hb(-c[40], t[22], c[24], t[25])
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
    b[18] = _hb(-c[16], t[18], c[48], t[29])
    b[29] = _hb(c[48], t[18], c[16], t[29])
    b[19] = _hb(-c[16], t[19], c[48], t[28])
    b[28] = _hb(c[48], t[19], c[16], t[28])
    b[20] = _hb(-c[48], t[20], -c[16], t[27])
    b[27] = _hb(-c[16], t[20], c[48], t[27])
    b[21] = _hb(-c[48], t[21], -c[16], t[26])
    b[26] = _hb(-c[16], t[21], c[48], t[26])
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
        b[k] = _hb(-c[32], t[k], c[32], t[47 - k])
        b[47 - k] = _hb(c[32], t[k], c[32], t[47 - k])
    odd = [b[16 + k] for k in range(16)]
    o = [ev[..., i] + odd[15 - i] for i in range(16)] + [
        ev[..., 15 - i] - odd[i] for i in range(16)
    ]
    return jnp.stack(o, axis=-1)


def idct64(x):
    """64-point inverse DCT (only the first 32 inputs may be nonzero)."""
    ev = idct32(x[..., 0::2])
    idx = [1, 33, 17, 49, 9, 41, 25, 57, 5, 37, 21, 53, 13, 45, 29, 61,
           3, 35, 19, 51, 11, 43, 27, 59, 7, 39, 23, 55, 15, 47, 31, 63]
    s = [x[..., i] for i in idx]
    ang = [63, 31, 47, 15, 55, 23, 39, 7, 59, 27, 43, 11, 51, 19, 35, 3]
    b = [None] * 64
    for k in range(16):
        b[32 + k] = _hb(c[ang[k]], s[k], -c[64 - ang[k]], s[31 - k])
        b[63 - k] = _hb(c[64 - ang[k]], s[k], c[ang[k]], s[31 - k])

    def twiddle(cur, pairs):
        nxt = list(cur)
        for (i, j, a, neg) in pairs:
            ti, tj = cur[i], cur[j]
            if not neg:
                nxt[i] = _hb(-c[a], ti, c[64 - a], tj)
                nxt[j] = _hb(c[64 - a], ti, c[a], tj)
            else:
                nxt[i] = _hb(-c[64 - a], ti, -c[a], tj)
                nxt[j] = _hb(-c[a], ti, c[64 - a], tj)
        return nxt

    t = [None] * 64
    for p in range(16):
        i = 32 + 2 * p
        if p % 2 == 0:
            t[i] = b[i] + b[i + 1]
            t[i + 1] = b[i] - b[i + 1]
        else:
            t[i] = -b[i] + b[i + 1]
            t[i + 1] = b[i] + b[i + 1]
    b = twiddle(t, [
        (33, 62, 4, False), (34, 61, 4, True),
        (37, 58, 36, False), (38, 57, 36, True),
        (41, 54, 20, False), (42, 53, 20, True),
        (45, 50, 52, False), (46, 49, 52, True),
    ])
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
    b = twiddle(t, [
        (34, 61, 8, False), (35, 60, 8, False),
        (36, 59, 8, True), (37, 58, 8, True),
        (42, 53, 40, False), (43, 52, 40, False),
        (44, 51, 40, True), (45, 50, 40, True),
    ])
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
    b = twiddle(t, [
        (36, 59, 16, False), (37, 58, 16, False),
        (38, 57, 16, False), (39, 56, 16, False),
        (40, 55, 16, True), (41, 54, 16, True),
        (42, 53, 16, True), (43, 52, 16, True),
    ])
    t = list(b)
    for k in range(8):
        t[32 + k] = b[32 + k] + b[47 - k]
        t[47 - k] = b[32 + k] - b[47 - k]
        t[48 + k] = -b[48 + k] + b[63 - k]
        t[63 - k] = b[48 + k] + b[63 - k]
    b = list(t)
    for k in range(40, 48):
        b[k] = _hb(-c[32], t[k], c[32], t[95 - k])
        b[95 - k] = _hb(c[32], t[k], c[32], t[95 - k])
    odd = [b[32 + k] for k in range(32)]
    o = [ev[..., i] + odd[31 - i] for i in range(32)] + [
        ev[..., 31 - i] - odd[i] for i in range(32)
    ]
    return jnp.stack(o, axis=-1)


def iadst4(x):
    x0, x1, x2, x3 = (x[..., i] for i in range(4))
    sp = _SINPI
    s0 = sp[1] * x0
    s1 = sp[2] * x0
    s2 = sp[3] * x1
    s3 = sp[4] * x2
    s4 = sp[1] * x2
    s5 = sp[2] * x3
    s6 = sp[4] * x3
    a7 = x0 - x2
    b7 = a7 + x3
    s0 = s0 + s3
    s1 = s1 - s4
    s3 = s2
    s2 = sp[3] * b7
    s0 = s0 + s5
    s1 = s1 - s6
    o0 = s0 + s3
    o1 = s1 + s3
    o2 = s2
    o3 = s0 + s1 - s3
    return jnp.stack([_r2(o0, 12), _r2(o1, 12), _r2(o2, 12), _r2(o3, 12)],
                     axis=-1)


def iadst8(x):
    s = [x[..., 7], x[..., 0], x[..., 5], x[..., 2], x[..., 3], x[..., 4],
         x[..., 1], x[..., 6]]
    b0 = _hb(c[4], s[0], c[60], s[1])
    b1 = _hb(c[60], s[0], -c[4], s[1])
    b2 = _hb(c[20], s[2], c[44], s[3])
    b3 = _hb(c[44], s[2], -c[20], s[3])
    b4 = _hb(c[36], s[4], c[28], s[5])
    b5 = _hb(c[28], s[4], -c[36], s[5])
    b6 = _hb(c[52], s[6], c[12], s[7])
    b7 = _hb(c[12], s[6], -c[52], s[7])
    s0 = b0 + b4
    s1 = b1 + b5
    s2 = b2 + b6
    s3 = b3 + b7
    s4 = b0 - b4
    s5 = b1 - b5
    s6 = b2 - b6
    s7 = b3 - b7
    b4 = _hb(c[16], s4, c[48], s5)
    b5 = _hb(c[48], s4, -c[16], s5)
    b6 = _hb(-c[48], s6, c[16], s7)
    b7 = _hb(c[16], s6, c[48], s7)
    t0 = s0 + s2
    t1 = s1 + s3
    t2 = s0 - s2
    t3 = s1 - s3
    t4 = b4 + b6
    t5 = b5 + b7
    t6 = b4 - b6
    t7 = b5 - b7
    b2 = _hb(c[32], t2, c[32], t3)
    b3 = _hb(c[32], t2, -c[32], t3)
    b6 = _hb(c[32], t6, c[32], t7)
    b7 = _hb(c[32], t6, -c[32], t7)
    return jnp.stack([t0, -t4, b6, -b2, b3, -b7, t5, -t1], axis=-1)


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
        b.append(_hb(c[a], s[2 * k], c[64 - a], s[2 * k + 1]))
        b.append(_hb(c[64 - a], s[2 * k], -c[a], s[2 * k + 1]))
    t = [b[i] + b[i + 8] for i in range(8)] + [b[i] - b[i + 8] for i in range(8)]
    b = list(t)
    b[8] = _hb(c[8], t[8], c[56], t[9])
    b[9] = _hb(c[56], t[8], -c[8], t[9])
    b[10] = _hb(c[40], t[10], c[24], t[11])
    b[11] = _hb(c[24], t[10], -c[40], t[11])
    b[12] = _hb(-c[56], t[12], c[8], t[13])
    b[13] = _hb(c[8], t[12], c[56], t[13])
    b[14] = _hb(-c[24], t[14], c[40], t[15])
    b[15] = _hb(c[40], t[14], c[24], t[15])
    t = [b[i] + b[i + 4] for i in range(4)] + [b[i] - b[i + 4] for i in range(4)]
    t += [b[8 + i] + b[12 + i] for i in range(4)] + [b[8 + i] - b[12 + i] for i in range(4)]
    b = list(t)
    for base in (4, 12):
        b[base + 0] = _hb(c[16], t[base + 0], c[48], t[base + 1])
        b[base + 1] = _hb(c[48], t[base + 0], -c[16], t[base + 1])
        b[base + 2] = _hb(-c[48], t[base + 2], c[16], t[base + 3])
        b[base + 3] = _hb(c[16], t[base + 2], c[48], t[base + 3])
    t = [b[i] + b[i + 2] for i in (0, 1)] + [b[i] - b[i + 2] for i in (0, 1)]
    t += [b[i] + b[i + 2] for i in (4, 5)] + [b[i] - b[i + 2] for i in (4, 5)]
    t += [b[i] + b[i + 2] for i in (8, 9)] + [b[i] - b[i + 2] for i in (8, 9)]
    t += [b[i] + b[i + 2] for i in (12, 13)] + [b[i] - b[i + 2] for i in (12, 13)]
    b = list(t)
    for base in (2, 6, 10, 14):
        b[base] = _hb(c[32], t[base], c[32], t[base + 1])
        b[base + 1] = _hb(c[32], t[base], -c[32], t[base + 1])
    out = [
        b[0], -b[8], b[12], -b[4], b[6], -b[14], b[10], -b[2],
        b[3], -b[11], b[15], -b[7], b[5], -b[13], b[9], -b[1],
    ]
    return jnp.stack(out, axis=-1)


def iidentity(x, n):
    if n == 4:
        return _r2(x * SQRT2, 12)
    if n == 8:
        return x * 2
    if n == 16:
        return _r2(x * 2 * SQRT2, 12)
    if n == 32:
        return x * 4
    raise ValueError(n)


_IDCT = {4: idct4, 8: idct8, 16: idct16, 32: idct32, 64: idct64}
_IADST = {4: iadst4, 8: iadst8, 16: iadst16}


def _apply_1d(kind: str, x, n: int):
    if kind == "dct":
        return _IDCT[n](x)
    if kind == "adst":
        return _IADST[n](x)
    return iidentity(x, n)


def inv_txfm(coeffs: jax.Array, tx_type: int, bit_depth: int = 8) -> jax.Array:
    """Batched normative inverse transform: (..., h, w) int32 dequantized
    coefficients -> (..., h, w) int32 residual.  tx_type/bit_depth static.
    Bit-exact vs transforms_np.inverse_transform (tests/test_transforms_jax)."""
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    vert, horz, flip_v, flip_h = tn._TX1D[tx_type]
    row_shift, col_shift = tn._inv_shifts(w, h)
    x = coeffs.astype(jnp.int32)
    if abs(int(np.log2(w)) - int(np.log2(h))) == 1:
        x = _r2(x * INV_SQRT2, 12)
    x = _apply_1d(horz, x, w)
    if row_shift:
        x = _r2(x, row_shift)
    lim = 1 << (15 if bit_depth == 8 else bit_depth + 7)
    x = jnp.clip(x, -lim, lim - 1)
    x = _apply_1d(vert, jnp.swapaxes(x, -1, -2), h)
    x = jnp.swapaxes(x, -1, -2)
    x = _r2(x, col_shift)
    if flip_v:
        x = x[..., ::-1, :]
    if flip_h:
        x = x[..., :, ::-1]
    return x


def fwd_mats(tx_type: int, w: int, h: int):
    """(Fv, FhT, scale) float32 forward-transform matrices (host numpy);
    same basis the C++ path uses (transforms_np._fwd_mats)."""
    Fv, FhT, scale = tn._fwd_mats(tx_type, w, h)
    return (np.asarray(Fv * np.sqrt(scale), np.float32),
            np.asarray(FhT * np.sqrt(scale), np.float32))


def fdct_batch(resid: jax.Array, Fv: jax.Array, FhT: jax.Array) -> jax.Array:
    """(..., h, w) int32 residual -> int32 coefficients via fp32 matmuls
    (MXU).  Forward transforms are an encoder choice: fp32 rounding fuzz
    only perturbs the quantizer input, never conformance (the levels chosen
    here are also the levels coded and reconstructed)."""
    x = resid.astype(jnp.float32)
    y = jnp.einsum("ij,...jk,kl->...il", Fv, x, FhT,
                   preferred_element_type=jnp.float32)
    return jnp.round(y).astype(jnp.int32)


def _q_grid(shape2, dc_q, ac_q):
    """Quantizer grid broadcast over (..., h, w): ac everywhere, dc at
    position (0, 0).  dc_q/ac_q may be scalars or (batch,) arrays."""
    h, w = shape2
    dc = jnp.asarray(dc_q, jnp.int32)
    ac = jnp.asarray(ac_q, jnp.int32)
    if dc.ndim:
        dc = dc[..., None, None]
        ac = ac[..., None, None]
    pos00 = ((jnp.arange(h)[:, None] == 0) & (jnp.arange(w)[None, :] == 0))
    return jnp.where(pos00, dc, ac)


def quantize(coeffs: jax.Array, dc_q, ac_q, shift: int) -> jax.Array:
    """Deadzone quantizer (bias 13/32), exact vs quantize_np.quantize.
    dc_q/ac_q: int32 scalars or (batch,) arrays.  shift: static tx_scale."""
    from rav1e_tpu.ops.quantize_np import QUANT_BIAS_NUM

    q = _q_grid(coeffs.shape[-2:], dc_q, ac_q)
    x = coeffs << shift
    sign = jnp.sign(x)
    mag = jnp.abs(x)
    bias = (q * QUANT_BIAS_NUM) >> 5
    m = mag + bias
    # exact integer division via fp32 reciprocal + one-step correction
    # (integer divide lowers poorly on TPU; fp32 error is << 1 level here
    # and the corrections make the result exact regardless)
    level = (m.astype(jnp.float32) *
             (1.0 / q.astype(jnp.float32))).astype(jnp.int32)
    level = jnp.where((level + 1) * q <= m, level + 1, level)
    level = jnp.where(level * q > m, level - 1, level)
    level = jnp.minimum(level, (1 << 15) - 1)
    return sign * level


def dequantize(levels: jax.Array, dc_q, ac_q, shift: int,
               bit_depth: int = 8) -> jax.Array:
    """Normative dequant, exact vs quantize_np.dequantize (int32: the
    masked product |level|*q fits 24 bits by construction)."""
    q = _q_grid(levels.shape[-2:], dc_q, ac_q)
    sign = jnp.sign(levels)
    mag = (jnp.abs(levels) * q) & 0xFFFFFF
    dq = sign * (mag >> shift)
    lim = 1 << (bit_depth + 7)
    return jnp.clip(dq, -lim, lim - 1)
