"""Intra prediction on device (JAX) — batched, bit-exact vs ops/intra_np.py.

NORMATIVE (spec 7.11.2): the wavefront encoder reconstructs with these
predictions, and dav1d must land on identical samples.  Every function is
batched over a leading block axis B (a wavefront of blocks) with static
block size, so whole anti-diagonals predict in one VPU pass; per-block
dynamic state (edge availability, angles) rides in (B,) arrays instead of
Python control flow.  Reference encoder analog: src/predict.rs +
src/recon_intra.rs (their per-block asm; here the batch axis replaces SIMD
lanes and the mode axis is evaluated in data parallel).

This build signals enable_intra_edge_filter=0 / enable_filter_intra=0 (like
the host path), so no edge filtering or upsampling applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.ops import intra_np as ip

# mode ids re-exported (spec order, same as intra_np)
DC, V, H = ip.DC_PRED, ip.V_PRED, ip.H_PRED
D45, D135, D113, D157, D203, D67 = (ip.D45_PRED, ip.D135_PRED, ip.D113_PRED,
                                    ip.D157_PRED, ip.D203_PRED, ip.D67_PRED)
SMOOTH, SMOOTH_V, SMOOTH_H, PAETH = (ip.SMOOTH_PRED, ip.SMOOTH_V_PRED,
                                     ip.SMOOTH_H_PRED, ip.PAETH_PRED)

# dr_intra_derivative padded to a dense [0..273] table (invalid angles 0;
# indices are always masked before use)
_DR_FULL = np.zeros(274, np.int32)
_DR_FULL[: len(ip._DR)] = ip._DR
MODE_ANGLE_ARR = np.zeros(13, np.int32)
for _m, _a in ip.MODE_ANGLE.items():
    MODE_ANGLE_ARR[_m] = _a


def _sm_w(n: int) -> np.ndarray:
    return np.asarray(ip.sm_weights(n), np.int32)


def build_edges_batch(rec: jax.Array, y: jax.Array, x: jax.Array,
                      w: int, h: int, ha: jax.Array, hl: jax.Array,
                      n_tr: jax.Array, n_bl: jax.Array,
                      max_x: int, max_y: int, bd: int = 8):
    """Batched spec 7.11.2 edge build.  rec: (H, W) int32 plane; y/x: (B,)
    block origins; ha/hl: (B,) bool availability; n_tr/n_bl: (B,) int32
    valid pixels past the block edge.  Returns (above, left), each
    (B, 1+w+h) int32 with index 0 = top-left corner (mirrors
    intra_np.build_edges exactly)."""
    base = 1 << (bd - 1)
    n = w + h
    i = jnp.arange(n, dtype=jnp.int32)[None, :]

    avail_a = w + jnp.minimum(n_tr, h)
    col = x[:, None] + jnp.minimum(i, avail_a[:, None] - 1)
    col = jnp.minimum(col, max_x)
    row_above = jnp.maximum(y - 1, 0)
    above_px = rec[row_above[:, None], col]
    left_top = rec[y, jnp.maximum(x - 1, 0)]
    above_v = jnp.where(ha[:, None], above_px,
                        jnp.where(hl[:, None], left_top[:, None], base - 1))

    avail_l = h + jnp.minimum(n_bl, w)
    rr = y[:, None] + jnp.minimum(i, avail_l[:, None] - 1)
    rr = jnp.minimum(rr, max_y)
    left_px = rec[rr, jnp.maximum(x - 1, 0)[:, None]]
    top_row = rec[row_above, x]
    left_v = jnp.where(hl[:, None], left_px,
                       jnp.where(ha[:, None], top_row[:, None], base + 1))

    tl = jnp.where(ha & hl, rec[row_above, jnp.maximum(x - 1, 0)],
                   jnp.where(ha, top_row,
                             jnp.where(hl, left_top, base)))
    above = jnp.concatenate([tl[:, None], above_v], axis=1)
    left = jnp.concatenate([tl[:, None], left_v], axis=1)
    return above, left


def dc_predict(above, left, w: int, h: int, ha, hl, bd: int = 8):
    """(B, h, w) DC prediction.  Square blocks only (the division by w+h
    reduces to a shift; the wavefront path codes squares)."""
    assert w == h, "device DC path is square-only"
    base = 1 << (bd - 1)
    A = above[:, 1 : 1 + w]
    L = left[:, 1 : 1 + h]
    sA = A.sum(-1)
    sL = L.sum(-1)
    lg = int(np.log2(w))
    avg_both = (sA + sL + ((w + h) >> 1)) >> (lg + 1)
    avg_a = (sA + (w >> 1)) >> lg
    avg_l = (sL + (h >> 1)) >> lg
    avg = jnp.where(ha & hl, avg_both,
                    jnp.where(ha, avg_a, jnp.where(hl, avg_l, base)))
    return jnp.broadcast_to(avg[:, None, None], (above.shape[0], h, w))


def predict_stack(above, left, w: int, h: int, ha, hl, bd: int = 8):
    """All 13 intra modes at angle delta 0: (B, 13, h, w) int32.
    Directional entries come from dr_predict_batch with the base angles."""
    B = above.shape[0]
    A = above[:, 1 : 1 + w]
    L = left[:, 1 : 1 + h]
    tl = above[:, 0]
    shape = (B, h, w)

    out = [None] * 13
    out[DC] = dc_predict(above, left, w, h, ha, hl, bd)
    out[V] = jnp.broadcast_to(A[:, None, :], shape)
    out[H] = jnp.broadcast_to(L[:, :, None], shape)

    # PAETH
    b = A[:, None, :] + L[:, :, None] - tl[:, None, None]
    pa = jnp.abs(b - A[:, None, :])
    pl = jnp.abs(b - L[:, :, None])
    ptl = jnp.abs(b - tl[:, None, None])
    out[PAETH] = jnp.where(
        (pl <= pa) & (pl <= ptl), jnp.broadcast_to(L[:, :, None], shape),
        jnp.where(pa <= ptl, jnp.broadcast_to(A[:, None, :], shape),
                  jnp.broadcast_to(tl[:, None, None], shape)))

    # SMOOTH family
    wx = jnp.asarray(_sm_w(w))[None, None, :]
    wy = jnp.asarray(_sm_w(h))[None, :, None]
    below = L[:, h - 1][:, None, None]
    right = A[:, w - 1][:, None, None]
    Ab = A[:, None, :]
    Lb = L[:, :, None]
    out[SMOOTH] = (wy * Ab + (256 - wy) * below + wx * Lb
                   + (256 - wx) * right + 256) >> 9
    out[SMOOTH_V] = (wy * Ab + (256 - wy) * below + 128) >> 8
    out[SMOOTH_H] = (wx * Lb + (256 - wx) * right + 128) >> 8

    # directional base angles (one batched call per mode)
    for m in (D45, D135, D113, D157, D203, D67):
        ang = jnp.full((B,), int(MODE_ANGLE_ARR[m]), jnp.int32)
        out[m] = dr_predict_batch(above, left, ang, w, h)

    return jnp.stack(out, axis=1)


def dr_predict_batch(above, left, p_angle, w: int, h: int):
    """Directional prediction for arbitrary per-block angles.
    above/left: (B, 1+w+h) from build_edges_batch; p_angle: (B,) int32
    (multiples of 3 in [36, 87+..212]).  Bit-exact port of
    intra_np._dr_predict; computes all three zones and selects."""
    B = above.shape[0]
    dr = jnp.asarray(_DR_FULL)
    rr = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    cc = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    n_edge = w + h
    pa = p_angle[:, None, None]

    def gat(edge, idx):
        # edge: (B, 1+n); idx int32 (B, h, w) into the 1+n axis (clamped)
        idx = jnp.clip(idx, 0, n_edge)
        return jnp.take_along_axis(edge.reshape(B, 1, n_edge + 1), idx.reshape(B, 1, h * w),
                                   axis=2).reshape(B, h, w)

    # zone 1 (angle < 90): above ray only
    dx1 = dr[jnp.clip(p_angle, 0, 273)][:, None, None]
    xpos1 = (rr + 1) * dx1
    base_x1 = (xpos1 >> 6) + cc
    sh1 = (xpos1 >> 1) & 0x1F
    max_base_x = w + h - 1
    v1 = (gat(above, 1 + base_x1) * (32 - sh1)
          + gat(above, 2 + base_x1) * sh1 + 16) >> 5
    a_last = above[:, 1 + max_base_x][:, None, None]
    z1 = jnp.where(base_x1 >= max_base_x, a_last, v1)

    # zone 2 (90 < angle < 180): above/left mix
    dx2 = dr[jnp.clip(180 - p_angle, 0, 273)][:, None, None]
    dy2 = dr[jnp.clip(p_angle - 90, 0, 273)][:, None, None]
    xpos2 = (cc << 6) - (rr + 1) * dx2
    base_x2 = xpos2 >> 6
    shx2 = (xpos2 >> 1) & 0x1F
    av2 = (gat(above, 1 + base_x2) * (32 - shx2)
           + gat(above, 2 + base_x2) * shx2 + 16) >> 5
    ypos2 = (rr << 6) - (cc + 1) * dy2
    base_y2 = ypos2 >> 6
    shy2 = (ypos2 >> 1) & 0x1F
    lv2 = (gat(left, 1 + base_y2) * (32 - shy2)
           + gat(left, 2 + base_y2) * shy2 + 16) >> 5
    z2 = jnp.where(base_x2 >= -1, av2, lv2)

    # zone 3 (angle > 180): left ray only
    dy3 = dr[jnp.clip(270 - p_angle, 0, 273)][:, None, None]
    ypos3 = (cc + 1) * dy3
    base_y3 = (ypos3 >> 6) + rr
    sh3 = (ypos3 >> 1) & 0x1F
    v3 = (gat(left, 1 + base_y3) * (32 - sh3)
          + gat(left, 2 + base_y3) * sh3 + 16) >> 5
    l_last = left[:, 1 + max_base_x][:, None, None]
    z3 = jnp.where(base_y3 >= max_base_x, l_last, v3)

    # exact 90 / 180
    vert = jnp.broadcast_to(above[:, None, 1 : 1 + w], (B, h, w))
    horz = jnp.broadcast_to(left[:, 1 : 1 + h, None], (B, h, w))

    return jnp.where(pa < 90, z1,
                     jnp.where(pa == 90, vert,
                               jnp.where(pa < 180, z2,
                                         jnp.where(pa == 180, horz, z3))))


_DIR_MAT_CACHE: dict = {}

# directional modes in enum order 1..8 (V, H, D45, D135, D113, D157, D203,
# D67) — contiguous, so dirs[:, mode-1] indexes by PredictionMode directly
DIR_MODE_IDS = (V, H, D45, D135, D113, D157, D203, D67)
DIR_ANGLES = np.array([[ip.MODE_ANGLE[m] + 3 * d for d in range(-3, 4)]
                       for m in DIR_MODE_IDS], np.int32)  # (8, 7)


def dir_matrices(n: int) -> np.ndarray:
    """Interpolation-weight matrices for ALL 56 directional variants
    (8 modes x 7 angle deltas) of an n x n block, as one (E, 56*n*n)
    float32 operand.  E = 4n+1 indexes the edge vector
    concat(above[0..2n], left[1..2n]) (index 0 = top-left).

    Every directional prediction is (e[i0]*w0 + e[i1]*w1 + 16) >> 5 with
    static (i0, w0, i1, w1) per (angle, r, c) — so a whole wavefront's
    directional search collapses to one MXU matmul.  Weights and 8-bit
    edge samples are exactly representable in bf16 and products fit the
    fp32 accumulator, so the matmul result is exact integer arithmetic."""
    M = _DIR_MAT_CACHE.get(n)
    if M is not None:
        return M
    E = 4 * n + 1
    n_e = 2 * n  # edge length per side (w + h)
    M = np.zeros((E, 56, n, n), np.float32)

    def e_above(i):  # above[1 + i] (i = -1 -> top-left)
        return 0 if i < 0 else 1 + i

    def e_left(i):  # left[1 + i] (i = -1 -> top-left)
        return 0 if i < 0 else 1 + n_e + i

    for mi, mode in enumerate(DIR_MODE_IDS):
        for dd in range(7):
            p = int(DIR_ANGLES[mi, dd])
            col = mi * 7 + dd
            if p == 90:
                for r in range(n):
                    for c in range(n):
                        M[e_above(c), col, r, c] = 32
                continue
            if p == 180:
                for r in range(n):
                    for c in range(n):
                        M[e_left(r), col, r, c] = 32
                continue
            if p < 90:
                dx = int(ip._DR[p])
                mx = n_e - 1
                for r in range(n):
                    xpos = (r + 1) * dx
                    bx = xpos >> 6
                    s = (xpos >> 1) & 0x1F
                    for c in range(n):
                        b = bx + c
                        if b >= mx:
                            M[e_above(mx), col, r, c] = 32
                        else:
                            M[e_above(b), col, r, c] += 32 - s
                            M[e_above(b + 1), col, r, c] += s
            elif p < 180:
                dx = int(ip._DR[180 - p])
                dy = int(ip._DR[p - 90])
                for r in range(n):
                    for c in range(n):
                        xpos = (c << 6) - (r + 1) * dx
                        bx = xpos >> 6
                        if bx >= -1:
                            s = (xpos >> 1) & 0x1F
                            M[e_above(bx), col, r, c] += 32 - s
                            M[e_above(bx + 1), col, r, c] += s
                        else:
                            ypos = (r << 6) - (c + 1) * dy
                            by = ypos >> 6
                            s = (ypos >> 1) & 0x1F
                            M[e_left(by), col, r, c] += 32 - s
                            M[e_left(by + 1), col, r, c] += s
            else:
                dy = int(ip._DR[270 - p])
                mx = n_e - 1
                for c in range(n):
                    ypos = (c + 1) * dy
                    by = ypos >> 6
                    s = (ypos >> 1) & 0x1F
                    for r in range(n):
                        b = by + r
                        if b >= mx:
                            M[e_left(mx), col, r, c] = 32
                        else:
                            M[e_left(b), col, r, c] += 32 - s
                            M[e_left(b + 1), col, r, c] += s
    M = M.reshape(E, 56 * n * n)
    _DIR_MAT_CACHE[n] = M
    return M


def predict_dirs(above: jax.Array, left: jax.Array, n: int,
                 mat: jax.Array | None = None) -> jax.Array:
    """All 56 directional predictions: (B, 8, 7, n, n) int32, bit-exact
    vs dr_predict_batch / intra_np.predict, via one matmul."""
    B = above.shape[0]
    if mat is None:
        mat = jnp.asarray(dir_matrices(n))
    e = jnp.concatenate([above, left[:, 1:]], axis=1).astype(jnp.float32)
    mm = jnp.dot(e, mat, preferred_element_type=jnp.float32)
    return ((mm.astype(jnp.int32) + 16) >> 5).reshape(B, 8, 7, n, n)


def cfl_ac_420_batch(luma: jax.Array):
    """Batched CflAcValues for 4:2:0 (spec 7.11.5.2).  luma: (B, h, w)
    reconstructed samples -> (B, h/2, w/2) int32 AC values."""
    s = (luma[:, 0::2, 0::2] + luma[:, 0::2, 1::2]
         + luma[:, 1::2, 0::2] + luma[:, 1::2, 1::2])
    L = s << 1
    n = L.shape[1] * L.shape[2]
    log2sz = n.bit_length() - 1
    avg = (L.sum((-1, -2)) + (1 << (log2sz - 1))) >> log2sz
    return L - avg[:, None, None]


def cfl_predict_batch(dc_pred: jax.Array, ac: jax.Array, alpha: jax.Array,
                      bd: int = 8):
    """Batched CFL (spec 7.11.5): chroma = dc + Round2Signed(alpha*ac, 6).
    alpha: (B,) int32."""
    prod = alpha[:, None, None] * ac
    scaled = jnp.sign(prod) * ((jnp.abs(prod) + 32) >> 6)
    return jnp.clip(dc_pred + scaled, 0, (1 << bd) - 1)
