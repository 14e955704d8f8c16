"""AV1 deblocking on device (JAX) — bit-exact vs ops/deblock_np.py.

NORMATIVE (spec 7.14).  The numpy oracle walks edge columns serially; here
every edge of a direction filters in one dense pass.  That is valid
because the spec's filter-size rule (taps never extend past the adjacent
transform blocks) makes every edge's *used* reads disjoint from every
other edge's writes — the serial loop and the parallel evaluation see
identical samples (dav1d itself SIMDs whole rows on the same property).

Formulation is shift-and-select, never gather/scatter: the plane is
viewed as (h, w/4, 4) lanes; each edge's 14-sample window is built from
static ±k lane shifts, the filter classes evaluate vectorized, and each
output column selects its (unique) writing tap by static shifts back.
Everything is int32 (8-bit: values < 2^15 after the spec's +-128F
clamps).

Reference analog: src/deblock.rs (their SIMD tier).
"""

from __future__ import annotations

import numpy as np

from rav1e_tpu.ops.deblock_np import thresholds


def _r3(x):
    return (x + 4) >> 3


def _r4(x):
    return (x + 8) >> 4


def _filter_taps(jnp, p, q, limit, blimit, thresh, size, bd):
    """Vectorized port of deblock_np._filter_line.  p/q: tap arrays
    (..., 7) int32; size: (...,) int32 in {0,4,6,8,14}.  Returns
    (new_taps dict t -> array for t in -6..5, write_mask dict)."""
    F = 1 << (bd - 8)
    p0, p1, p2, p3 = p[..., 6], p[..., 5], p[..., 4], p[..., 3]
    p4, p5, p6 = p[..., 2], p[..., 1], p[..., 0]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    q4, q5, q6 = q[..., 4], q[..., 5], q[..., 6]
    ab = jnp.abs

    fm4 = ((ab(p1 - p0) <= limit) & (ab(q1 - q0) <= limit)
           & (ab(p0 - q0) * 2 + (ab(p1 - q1) >> 1) <= blimit))
    fm6 = fm4 & (ab(p2 - p1) <= limit) & (ab(q2 - q1) <= limit)
    fm8 = fm6 & (ab(p3 - p2) <= limit) & (ab(q3 - q2) <= limit)
    flat = ((ab(p1 - p0) <= F) & (ab(q1 - q0) <= F)
            & (ab(p2 - p0) <= F) & (ab(q2 - q0) <= F))
    flat8 = flat & (ab(p3 - p0) <= F) & (ab(q3 - q0) <= F)
    flat2 = ((ab(p4 - p0) <= F) & (ab(q4 - q0) <= F)
             & (ab(p5 - p0) <= F) & (ab(q5 - q0) <= F)
             & (ab(p6 - p0) <= F) & (ab(q6 - q0) <= F))

    mask = jnp.where(size >= 8, fm8,
                     jnp.where(size == 6, fm6, fm4)) & (size > 0)

    lo, hi = -128 * F, 128 * F - 1
    cl = lambda x: jnp.clip(x, lo, hi)
    ps1, ps0 = p1 - 128 * F, p0 - 128 * F
    qs0, qs1 = q0 - 128 * F, q1 - 128 * F
    hev = (ab(p1 - p0) > thresh) | (ab(q1 - q0) > thresh)
    f = jnp.where(hev, cl(ps1 - qs1), 0)
    f = cl(f + 3 * (qs0 - ps0))
    f1 = cl(f + 4) >> 3
    f2 = cl(f + 3) >> 3
    n_q0 = cl(qs0 - f1) + 128 * F
    n_p0 = cl(ps0 + f2) + 128 * F
    f3 = (f1 + 1) >> 1
    n_q1 = jnp.where(hev, q1, cl(qs1 - f3) + 128 * F)
    n_p1 = jnp.where(hev, p1, cl(ps1 + f3) + 128 * F)
    use4 = mask & ~((size >= 8) & flat8) & ~((size == 6) & flat)

    m6 = mask & (size == 6) & flat
    m8 = mask & (size >= 8) & flat8 & ~((size == 14) & flat2)
    m14 = mask & (size == 14) & flat8 & flat2

    # per-tap value/mask maps, keyed by offset t: col = x + t (p0 at t=-1)
    val = {}
    wm = {}

    def put(t, m, v):
        if t in val:
            val[t] = jnp.where(m, v, val[t])
            wm[t] = wm[t] | m
        else:
            orig = (p[..., 7 + t] if t < 0 else q[..., t])
            val[t] = jnp.where(m, v, orig)
            wm[t] = m

    put(-1, use4, n_p0)
    put(-2, use4, n_p1)
    put(0, use4, n_q0)
    put(1, use4, n_q1)

    put(-2, m6, _r3(p2 * 3 + p1 * 2 + p0 * 2 + q0))
    put(-1, m6, _r3(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1))
    put(0, m6, _r3(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2))
    put(1, m6, _r3(p0 + q0 * 2 + q1 * 2 + q2 * 3))

    put(-3, m8, _r3(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0))
    put(-2, m8, _r3(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1))
    put(-1, m8, _r3(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2))
    put(0, m8, _r3(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3))
    put(1, m8, _r3(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3))
    put(2, m8, _r3(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3))

    put(-6, m14, _r4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0))
    put(-5, m14, _r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1))
    put(-4, m14, _r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2))
    put(-3, m14, _r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3))
    put(-2, m14, _r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4))
    put(-1, m14, _r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5))
    put(0, m14, _r4(p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6))
    put(1, m14, _r4(p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2))
    put(2, m14, _r4(p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3))
    put(3, m14, _r4(p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4))
    put(4, m14, _r4(p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5))
    put(5, m14, _r4(p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7))
    return val, wm


def _pass_dir(jnp, img, limit, blimit, thresh, bd, plane_idx, w, h,
              tx_across, bpos, skip, s_along, s_across, edge_valid=None):
    """One direction over a (h, w) plane view (edges along axis 0).
    tx_across/bpos/skip: per-mi maps oriented like img.  Pure shifts.
    edge_valid: optional (E,) bool — sharded slabs mask the positions that
    are not edges of the real plane (its boundary halo columns)."""
    E = w // 4 - 1  # edges at x = 4, 8, ..., 4E
    if E <= 0:
        return img
    # per-(group, edge) decision inputs; groups are 4 rows along the edge
    g = jnp.arange(0, h, 4)
    mi_along = (g << s_along) >> 2
    ex = (jnp.arange(E) + 1) * 4
    mi_cur = (ex << s_across) >> 2
    mi_prev = ((ex - 1) << s_across) >> 2
    cur_tx = tx_across[mi_along[:, None], mi_cur[None, :]]
    prev_tx = tx_across[mi_along[:, None], mi_prev[None, :]]
    is_tx_edge = (ex[None, :] % jnp.maximum(cur_tx, 1)) == 0
    is_blk = bpos[mi_along[:, None], mi_cur[None, :]] == ex[None, :]
    cur_sk = skip[mi_along[:, None], mi_cur[None, :]]
    prev_sk = skip[mi_along[:, None], mi_prev[None, :]]
    apply_ = is_tx_edge & (is_blk | ~cur_sk | ~prev_sk)
    size_across = jnp.minimum(cur_tx, prev_tx)
    if plane_idx == 0:
        fsize = jnp.where(size_across >= 16, 14,
                          jnp.where(size_across >= 8, 8, 4))
    else:
        fsize = jnp.where(size_across >= 8, 6, 4)
    fsize = jnp.where(apply_, fsize, 0)
    if edge_valid is not None:
        fsize = jnp.where(edge_valid[None, :], fsize, 0)
    # expand to per-row: (h, E)
    size_r = jnp.repeat(fsize, 4, axis=0)[:h]

    # tap windows by static shifts: lanes (h, w/4, 4); edge e sits at col
    # 4(e+1), so tap col 4(e+1)+t decomposes as lane e+lane0, sub r with
    # lane0 = (4+t)//4, r = (4+t)%4 (floor semantics for negative t)
    nl = w // 4
    L = img.reshape(h, nl, 4).astype(jnp.int32)

    def col(t):
        c0 = 4 + t
        lane0, sub = c0 // 4, c0 % 4
        arr = L[:, :, sub]
        if lane0 < 0:  # left plane clamp (only edge 0): sample col 0
            left = jnp.broadcast_to(L[:, 0, 0][:, None], (h, -lane0))
            return jnp.concatenate([left, arr], axis=1)[:, :E]
        take = min(nl - lane0, E)
        a = arr[:, lane0 : lane0 + take]
        if take < E:  # right plane clamp: sample col w-1
            right = jnp.broadcast_to(L[:, nl - 1, 3][:, None], (h, E - take))
            a = jnp.concatenate([a, right], axis=1)
        return a

    p = jnp.stack([col(t) for t in range(-7, 0)], axis=-1)  # (h, E, 7)
    q = jnp.stack([col(t) for t in range(0, 7)], axis=-1)
    val, wm = _filter_taps(jnp, p, q, limit, blimit, thresh, size_r, bd)

    # place taps back: lane k sub r gets tap t of edge e = k - lane0(t);
    # write masks are disjoint across edges (spec tap-length rule), so
    # chained selects compose correctly
    res = [L[:, :, r] for r in range(4)]
    for t in range(-6, 6):
        c0 = 4 + t
        lane0, r = c0 // 4, c0 % 4
        k_lo = max(0, lane0)
        k_hi = min(nl, lane0 + E)
        if k_hi <= k_lo:
            continue
        e_lo = k_lo - lane0
        n = k_hi - k_lo
        v = val[t][:, e_lo : e_lo + n]
        m = wm[t][:, e_lo : e_lo + n]
        res[r] = res[r].at[:, k_lo:k_hi].set(
            jnp.where(m, v, res[r][:, k_lo:k_hi]))
    return jnp.stack(res, axis=-1).reshape(h, w)


def deblock_plane_jnp(jnp, plane, txw, txh, bx, by, skip, levels, sharpness,
                      plane_idx, sub_x, sub_y, bd, width, height):
    """Bit-exact jnp port of deblock_np.deblock_plane (one plane)."""
    img = plane
    for vertical in (True, False):
        level = (levels[0 if vertical else 1] if plane_idx == 0
                 else levels[1 + plane_idx])
        if level == 0:
            continue
        limit, blimit, thresh = thresholds(level, sharpness, bd)
        if vertical:
            img = _pass_dir(jnp, img, limit, blimit, thresh, bd, plane_idx,
                            width, height, txw >> sub_x, bx >> sub_x, skip,
                            sub_y, sub_x)
        else:
            img = _pass_dir(jnp, img.T, limit, blimit, thresh, bd, plane_idx,
                            height, width, (txh >> sub_y).T, (by >> sub_y).T,
                            skip.T, sub_x, sub_y).T
    return img
