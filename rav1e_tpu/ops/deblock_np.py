"""AV1 deblocking loop filter (spec 7.14), NumPy oracle implementation.

Reference analog: src/deblock.rs.  Operates in-place on reconstruction
planes given uniform frame filter levels (loop_filter_delta_enabled=0) and
the per-mi tx-size / skip maps the encoder records.  Vertical edges over the
whole frame first, then horizontal (spec pass order).  Bit-exactness vs the
decoder's filter output is asserted by tests/test_deblock_conformance.py.

Vectorization: for each edge line (a tx-boundary column/row) all samples
along the edge are filtered at once; masks are per-sample boolean vectors.
"""

from __future__ import annotations

import numpy as np


def _rpot(x, n):
    return (x + (1 << (n - 1))) >> n


def thresholds(level: int, sharpness: int, bd: int):
    """spec 7.14.4: limit / blimit / thresh for a filter level."""
    shift = 2 if sharpness > 4 else (1 if sharpness > 0 else 0)
    if sharpness > 0:
        limit = np.clip(level >> shift, 1, 9 - sharpness)
    else:
        limit = max(1, level)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    scale = 1 << (bd - 8)
    return limit * scale, blimit * scale, thresh * scale


def _filter_line(p, q, limit, blimit, thresh, size, bd):
    """Filter across one edge.  p: [...,7] samples left/above of the edge
    (p[...,-1] = p0), q: [...,7] (q[...,0] = q0), int32.  size: per-sample
    filter size (0 = none, 4/6/8/14).  Returns new (p, q)."""
    F = 1 << (bd - 8)
    p = p.astype(np.int64)
    q = q.astype(np.int64)
    p0, p1, p2, p3 = p[..., -1], p[..., -2], p[..., -3], p[..., -4]
    p4, p5, p6 = p[..., -5], p[..., -6], p[..., -7]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    q4, q5, q6 = q[..., 4], q[..., 5], q[..., 6]

    # filter masks (spec 7.14.6.2)
    fm4 = (
        (np.abs(p1 - p0) <= limit)
        & (np.abs(q1 - q0) <= limit)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= blimit)
    )
    fm6 = fm4 & (np.abs(p2 - p1) <= limit) & (np.abs(q2 - q1) <= limit)
    fm8 = fm6 & (np.abs(p3 - p2) <= limit) & (np.abs(q3 - q2) <= limit)
    flat = (
        (np.abs(p1 - p0) <= F)
        & (np.abs(q1 - q0) <= F)
        & (np.abs(p2 - p0) <= F)
        & (np.abs(q2 - q0) <= F)
    )
    flat8 = flat & (np.abs(p3 - p0) <= F) & (np.abs(q3 - q0) <= F)
    flat2 = (
        (np.abs(p4 - p0) <= F)
        & (np.abs(q4 - q0) <= F)
        & (np.abs(p5 - p0) <= F)
        & (np.abs(q5 - q0) <= F)
        & (np.abs(p6 - p0) <= F)
        & (np.abs(q6 - q0) <= F)
    )

    mask = np.where(size >= 8, fm8, np.where(size == 6, fm6, fm4)) & (size > 0)

    # --- filter4 (narrow, with hev) --------------------------------------
    lo, hi = -128 * F, 128 * F - 1

    def clamp(x):
        return np.clip(x, lo, hi)

    ps1, ps0 = p1 - 128 * F, p0 - 128 * F
    qs0, qs1 = q0 - 128 * F, q1 - 128 * F
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)
    f = np.where(hev, clamp(ps1 - qs1), 0)
    f = clamp(f + 3 * (qs0 - ps0))
    f1 = clamp(f + 4) >> 3
    f2 = clamp(f + 3) >> 3
    n_q0 = clamp(qs0 - f1) + 128 * F
    n_p0 = clamp(ps0 + f2) + 128 * F
    f3 = (f1 + 1) >> 1
    n_q1 = np.where(hev, q1, clamp(qs1 - f3) + 128 * F)
    n_p1 = np.where(hev, p1, clamp(ps1 + f3) + 128 * F)

    out_p = p.copy()
    out_q = q.copy()
    use4 = mask & ~((size >= 8) & flat8) & ~((size == 6) & flat)
    out_p[..., -1] = np.where(use4, n_p0, p0)
    out_p[..., -2] = np.where(use4, n_p1, p1)
    out_q[..., 0] = np.where(use4, n_q0, q0)
    out_q[..., 1] = np.where(use4, n_q1, q1)

    # --- filter6 (chroma wide) --------------------------------------------
    m6 = mask & (size == 6) & flat
    if m6.any():
        o_p1 = _rpot(p2 * 3 + p1 * 2 + p0 * 2 + q0, 3)
        o_p0 = _rpot(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1, 3)
        o_q0 = _rpot(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2, 3)
        o_q1 = _rpot(p0 + q0 * 2 + q1 * 2 + q2 * 3, 3)
        out_p[..., -2] = np.where(m6, o_p1, out_p[..., -2])
        out_p[..., -1] = np.where(m6, o_p0, out_p[..., -1])
        out_q[..., 0] = np.where(m6, o_q0, out_q[..., 0])
        out_q[..., 1] = np.where(m6, o_q1, out_q[..., 1])

    # --- filter8 (luma medium) ---------------------------------------------
    m8 = mask & (size >= 8) & flat8 & ~((size == 14) & flat2)
    if m8.any():
        o_p2 = _rpot(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0, 3)
        o_p1 = _rpot(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1, 3)
        o_p0 = _rpot(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2, 3)
        o_q0 = _rpot(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3, 3)
        o_q1 = _rpot(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3, 3)
        o_q2 = _rpot(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3, 3)
        for idx, val in ((-3, o_p2), (-2, o_p1), (-1, o_p0)):
            out_p[..., idx] = np.where(m8, val, out_p[..., idx])
        for idx, val in ((0, o_q0), (1, o_q1), (2, o_q2)):
            out_q[..., idx] = np.where(m8, val, out_q[..., idx])

    # --- filter14 (luma wide) -----------------------------------------------
    # taps solved from libdav1d responses: sliding window [i-6, i+6] with
    # border clamp plus the {i-1, i, i+1} triple doubled; rows sum to 16
    m14 = mask & (size == 14) & flat8 & flat2
    if m14.any():
        o_p5 = _rpot(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0, 4)
        o_p4 = _rpot(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1, 4)
        o_p3 = _rpot(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2, 4)
        o_p2 = _rpot(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3, 4)
        o_p1 = _rpot(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4, 4)
        o_p0 = _rpot(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5, 4)
        o_q0 = _rpot(p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6, 4)
        o_q1 = _rpot(p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2, 4)
        o_q2 = _rpot(p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3, 4)
        o_q3 = _rpot(p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4, 4)
        o_q4 = _rpot(p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5, 4)
        o_q5 = _rpot(p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7, 4)
        for idx, val in ((-6, o_p5), (-5, o_p4), (-4, o_p3), (-3, o_p2), (-2, o_p1), (-1, o_p0)):
            out_p[..., idx] = np.where(m14, val, out_p[..., idx])
        for idx, val in ((0, o_q0), (1, o_q1), (2, o_q2), (3, o_q3), (4, o_q4), (5, o_q5)):
            out_q[..., idx] = np.where(m14, val, out_q[..., idx])

    return out_p, out_q


class DeblockInfo:
    """Per-4x4 (luma mi) maps the filter decisions need."""

    def __init__(self, mi_rows: int, mi_cols: int):
        self.txw = np.zeros((mi_rows, mi_cols), np.int32)  # luma tx width px
        self.txh = np.zeros((mi_rows, mi_cols), np.int32)
        self.bx = np.zeros((mi_rows, mi_cols), np.int32)  # block origin px
        self.by = np.zeros((mi_rows, mi_cols), np.int32)
        self.skip = np.zeros((mi_rows, mi_cols), np.bool_)

    def set_block(self, x, y, bw, bh, skip, txw=None, txh=None):
        r0, c0 = y // 4, x // 4
        r1 = min(r0 + bh // 4, self.txw.shape[0])
        c1 = min(c0 + bw // 4, self.txw.shape[1])
        self.txw[r0:r1, c0:c1] = txw or bw
        self.txh[r0:r1, c0:c1] = txh or bh
        self.bx[r0:r1, c0:c1] = x
        self.by[r0:r1, c0:c1] = y
        self.skip[r0:r1, c0:c1] = skip


def deblock_plane(plane, info: DeblockInfo, plane_idx: int, levels, sharpness,
                  sub_x, sub_y, bd, width, height) -> None:
    """Filter one plane in place.  levels: frame filter levels [4].
    width/height: the plane's CODED (mi-aligned) dimensions in px - the
    decoder filters its full reconstruction buffer before output cropping."""
    for vertical in (True, False):  # spec: all vertical edges, then horizontal
        level = levels[0 if vertical else 1] if plane_idx == 0 else levels[1 + plane_idx]
        if level == 0:
            continue
        limit, blimit, thresh = thresholds(level, sharpness, bd)
        if vertical:
            _deblock_pass(plane, limit, blimit, thresh, bd, plane_idx,
                          width, height,
                          info.txw >> sub_x, info.bx >> sub_x, info.skip,
                          s_along=sub_y, s_across=sub_x)
        else:
            _deblock_pass(plane.T, limit, blimit, thresh, bd, plane_idx,
                          height, width,
                          (info.txh >> sub_y).T, (info.by >> sub_y).T, info.skip.T,
                          s_along=sub_x, s_across=sub_y)


def _deblock_pass(img, limit, blimit, thresh, bd, plane_idx, w, h,
                  tx_across, bpos, skip, s_along, s_across) -> None:
    """One edge direction.  img: plane view with the edge running along
    axis 0 and samples across it along axis 1 (transposed for horizontal).
    tx_across/bpos: per-mi tx dim and block origin across the edge, already
    in plane px and oriented like img.  skip: per-mi skip flags."""
    rows = np.arange(0, h, 4)  # 4px sample groups along the edge
    mi_along = (rows << s_along) >> 2  # mi row index of each group
    for x in range(4, w, 4):
        mi_cur = (x << s_across) >> 2
        mi_prev = ((x - 1) << s_across) >> 2
        cur_tx = tx_across[mi_along, mi_cur]
        prev_tx = tx_across[mi_along, mi_prev]
        is_tx_edge = (x % np.maximum(cur_tx, 1)) == 0
        if not is_tx_edge.any():
            continue
        is_block_edge = bpos[mi_along, mi_cur] == x
        cur_skip = skip[mi_along, mi_cur]
        prev_skip = skip[mi_along, mi_prev]
        apply = is_tx_edge & (is_block_edge | ~cur_skip | ~prev_skip)
        if not apply.any():
            continue
        size_across = np.minimum(cur_tx, prev_tx)
        if plane_idx == 0:
            fsize = np.where(size_across >= 16, 14, np.where(size_across >= 8, 8, 4))
        else:
            fsize = np.where(size_across >= 8, 6, 4)
        fsize = np.where(apply, fsize, 0)
        sizes = np.repeat(fsize, 4)[:h]
        xs_p = np.clip(np.arange(x - 7, x), 0, img.shape[1] - 1)
        xs_q = np.clip(np.arange(x, x + 7), 0, img.shape[1] - 1)
        p = img[:h, xs_p]
        q = img[:h, xs_q]
        new_p, new_q = _filter_line(p, q, limit, blimit, thresh, sizes, bd)
        for j in range(7):
            col = x - 7 + j
            if 0 <= col:
                img[:h, col] = new_p[:, j]
            col = x + j
            if col < w:
                img[:h, col] = new_q[:, j]


def deblock_frame(rec, info: DeblockInfo, levels, sharpness, bd,
                  coded_w, coded_h, luma_only: bool = False,
                  sub_x: int = 1, sub_y: int = 1) -> None:
    """Filter all planes of the reconstruction in place."""
    if not any(levels):
        return
    deblock_plane(rec[0], info, 0, levels, sharpness, 0, 0, bd, coded_w, coded_h)
    if luma_only:
        return
    cw, ch = coded_w >> sub_x, coded_h >> sub_y
    deblock_plane(rec[1], info, 1, levels, sharpness, sub_x, sub_y, bd, cw, ch)
    deblock_plane(rec[2], info, 2, levels, sharpness, sub_x, sub_y, bd, cw, ch)
