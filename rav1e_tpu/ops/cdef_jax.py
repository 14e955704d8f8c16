"""Device (TPU) CDEF: whole-frame direction estimation + filtering in one
jitted XLA graph.

Mirrors cdef_np.cdef_frame_batched bit-exactly (asserted by
tests/test_cdef_conformance.py::test_device_equals_host).  The direction
costs are 64->15 matmuls over all 8x8 blocks (MXU-friendly); the filter is
96 statically-shifted tap adds fused by XLA.  Strength parameters are traced
so one compile per resolution serves every frame.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from rav1e_tpu.ops.cdef_np import (
    CDEF_DIRECTIONS,
    CDEF_VERY_LARGE,
    DIV_TABLE,
    PRI_TAPS,
    SEC_TAPS,
    _bin_mats,
    _D0_DIV,
    _ODD_LENS,
)

_jax = None


def _get_jax():
    global _jax
    if _jax is None:
        from rav1e_tpu.utils.jaxsetup import configure

        configure()
        import jax

        _jax = jax
    return _jax


def _find_dir_all_jnp(jnp, plane, bd, h, w):
    nby, nbx = h // 8, w // 8
    x = (plane[:h, :w].astype(jnp.int32) >> (bd - 8)) - 128
    blocks = x.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    mats = _bin_mats()
    costs = []
    for d in range(8):
        partial_ = blocks @ jnp.asarray(mats[d].T, jnp.int32)  # [nb, nbins]
        p64 = partial_.astype(jnp.int64)
        if d in (0, 4):
            c = (p64**2 * jnp.asarray(_D0_DIV)[None, :]).sum(axis=1)
        elif d in (2, 6):
            c = (p64**2).sum(axis=1) * 105
        else:
            c = (p64**2 * jnp.asarray(DIV_TABLE[_ODD_LENS])[None, :]).sum(axis=1)
        costs.append(c)
    costs = jnp.stack(costs)  # [8, nb]
    best = costs.argmax(axis=0)
    nb = costs.shape[1]
    idx = jnp.arange(nb)
    var = (costs[best, idx] - costs[(best + 4) & 7, idx]) >> 10
    return best.reshape(nby, nbx).astype(jnp.int32), var.reshape(nby, nbx)


def _adjust_vec_jnp(jnp, strength, var):
    """strength: traced scalar; var: array."""
    v6 = var >> 6
    i = jnp.minimum(jnp.where(v6 > 0, jnp.log2(jnp.maximum(v6, 1).astype(jnp.float32)).astype(jnp.int32), 0), 12)
    out = (strength * (4 + i) + 8) >> 4
    return jnp.where((var > 0) & (strength > 0), out, 0)


def _constrain_jnp(jnp, diff, strength, damping):
    a = jnp.abs(diff)
    bl = jnp.where(strength > 0,
                   jnp.log2(jnp.maximum(strength, 1).astype(jnp.float32)).astype(jnp.int32), 0)
    shift = jnp.maximum(0, damping - bl)
    v = jnp.minimum(a, jnp.maximum(0, strength - (a >> shift)))
    return jnp.where(strength > 0, jnp.sign(diff) * v, 0)


def _filter_plane_jnp(jnp, plane, dirs, pri_map, sec, damping, bd, w, h, active, sub):
    bs = 8 >> sub
    pad = 3
    src = jnp.full((h + 2 * pad, w + 2 * pad), CDEF_VERY_LARGE, jnp.int32)
    src = src.at[pad : pad + h, pad : pad + w].set(plane[:h, :w].astype(jnp.int32))
    x = src[pad : pad + h, pad : pad + w]

    rep = lambda m: jnp.repeat(jnp.repeat(m, bs, 0), bs, 1)[:h, :w]
    pri_px = rep(pri_map)
    act_px = rep(active)
    dir_px = rep(dirs)

    summ = jnp.zeros((h, w), jnp.int32)
    mx = x
    mn = x

    def tap(dy, dx):
        return src[pad + dy : pad + dy + h, pad + dx : pad + dx + w]

    tap_parity = (pri_px >> (bd - 8)) & 1
    for d in range(8):
        dmask = dir_px == d
        for k in range(2):
            dy, dx = int(CDEF_DIRECTIONS[d][k][0]), int(CDEF_DIRECTIONS[d][k][1])
            for s in (1, -1):
                p = tap(s * dy, s * dx)
                tap_w = jnp.where(tap_parity == 1, PRI_TAPS[1][k], PRI_TAPS[0][k])
                contrib = tap_w * _constrain_jnp(jnp, p - x, pri_px, damping)
                summ = summ + jnp.where(dmask, contrib, 0)
                valid = dmask & (p != CDEF_VERY_LARGE) & (pri_px > 0)
                mx = jnp.where(valid, jnp.maximum(mx, p), mx)
                mn = jnp.where(valid, jnp.minimum(mn, p), mn)
        for d2 in ((d + 2) & 7, (d + 6) & 7):
            for k in range(2):
                dy, dx = int(CDEF_DIRECTIONS[d2][k][0]), int(CDEF_DIRECTIONS[d2][k][1])
                for s in (1, -1):
                    p = tap(s * dy, s * dx)
                    contrib = SEC_TAPS[k] * _constrain_jnp(jnp, p - x, sec, damping)
                    summ = summ + jnp.where(dmask, contrib, 0)
                    valid = dmask & (p != CDEF_VERY_LARGE) & (sec > 0)
                    mx = jnp.where(valid, jnp.maximum(mx, p), mx)
                    mn = jnp.where(valid, jnp.minimum(mn, p), mn)

    out = x + ((8 + summ - (summ < 0)) >> 4)
    out = jnp.clip(out, mn, mx)
    write = act_px & ((pri_px > 0) | (sec > 0))
    return jnp.where(write, out, plane[:h, :w])


def _make_kernel(bd: int, coded_w: int, coded_h: int):
    jax = _get_jax()
    jnp = jax.numpy

    @partial(jax.jit, static_argnames=("damping",))
    def kernel(y, u, v, skip, y_pri, y_sec, uv_pri, uv_sec, damping):
        damping = damping + bd - 8  # spec: damping scales with bit depth
        nby, nbx = coded_h // 8, coded_w // 8
        dirs, var = _find_dir_all_jnp(jnp, y, bd, coded_h, coded_w)
        s4 = skip[: nby * 2, : nbx * 2].reshape(nby, 2, nbx, 2).transpose(0, 2, 1, 3)
        active = ~s4.reshape(nby, nbx, 4).all(axis=2)
        scale = bd - 8
        # spec 7.15.3: secondary-only filtering uses direction 0 (per plane)
        y_dirs = jnp.where(y_pri > 0, dirs, 0)
        uv_dirs = jnp.where(uv_pri > 0, dirs, 0)
        pri_map = _adjust_vec_jnp(jnp, y_pri << scale, var)
        y_out = _filter_plane_jnp(jnp, y, y_dirs, pri_map, y_sec << scale,
                                  damping, bd, coded_w, coded_h, active, 0)
        uv_map = jnp.full(dirs.shape, uv_pri << scale, jnp.int32)
        u_out = _filter_plane_jnp(jnp, u, uv_dirs, uv_map, uv_sec << scale,
                                  damping - 1, bd, coded_w >> 1, coded_h >> 1,
                                  active, 1)
        v_out = _filter_plane_jnp(jnp, v, uv_dirs, uv_map, uv_sec << scale,
                                  damping - 1, bd, coded_w >> 1, coded_h >> 1,
                                  active, 1)
        # uint16 return (4x less tunnel traffic; values are clipped to bd)
        return (y_out.astype(jnp.uint16), u_out.astype(jnp.uint16),
                v_out.astype(jnp.uint16))

    return kernel


_KERNELS: dict = {}


def cdef_frame_device(rec, skip, y_pri, y_sec, uv_pri, uv_sec, damping, bd,
                      coded_w, coded_h) -> None:
    """Device CDEF, in-place on the host arrays.  Falls back to the NumPy
    batched path if no device backend is usable."""
    if (y_pri | y_sec | uv_pri | uv_sec) == 0:
        return
    try:
        key = (bd, coded_w, coded_h)
        k = _KERNELS.get(key)
        if k is None:
            k = _make_kernel(*key)
            _KERNELS[key] = k
        y, u, v = k(
            rec[0][:coded_h, :coded_w].astype(np.uint16),
            rec[1][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            rec[2][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            np.asarray(skip, bool),
            y_pri, y_sec, uv_pri, uv_sec, damping=damping,
        )
    except Exception as e:
        import logging

        logging.getLogger("rav1e_tpu").warning(
            "device CDEF unavailable (%s); host fallback", e
        )
        from rav1e_tpu.ops.cdef_np import cdef_frame_batched

        cdef_frame_batched(rec, skip, y_pri, y_sec, uv_pri, uv_sec, damping,
                           bd, coded_w, coded_h)
        return
    rec[0][:coded_h, :coded_w] = np.asarray(y)
    rec[1][: coded_h >> 1, : coded_w >> 1] = np.asarray(u)
    rec[2][: coded_h >> 1, : coded_w >> 1] = np.asarray(v)


# -- fused search + apply ----------------------------------------------------
#
# Reference analog: rdo_loop_decision's CDEF strength search (src/rdo.rs) —
# there a sampled host loop; here every candidate strength filters the WHOLE
# frame on device in one graph and the frame SSE vs source picks the winner.
# Skip blocks are unfiltered for every candidate (constant SSE offset), so
# the argmin is unaffected by including them.

Y_CANDIDATES = tuple((pri, sec) for pri in (0, 1, 2, 4) for sec in (0, 2))
UV_CANDIDATES = ((0, 0), (1, 0), (2, 0))

# Per-superblock mode (cdef_bits = 3): the 8 header strength pairs are the
# 8 Y_CANDIDATES in order; each pairs with the UV candidate below (the
# cdef_idx selects BOTH the luma and chroma strengths — spec 5.9.19).
PAIR_UV_IDX = (0, 0, 1, 1, 2, 2, 2, 2)

# extra header bits of per-SB mode vs one pair: 7 more (y,uv) pairs x 12 bits
_SB_HDR_BITS = 84.0


def strength_codes(sb: bool, frame_best: int):
    """Header (y, uv) strength code lists for a search result: the fixed
    8-pair table in per-SB mode, or the single winning pair."""
    y_codes = [(pri << 2) | (3 if sec == 4 else sec) for pri, sec in Y_CANDIDATES]
    uv_codes = [(UV_CANDIDATES[i][0] << 2) | UV_CANDIDATES[i][1]
                for i in PAIR_UV_IDX]
    if sb:
        return 3, tuple(y_codes), tuple(uv_codes)
    return 0, (y_codes[frame_best],), (uv_codes[frame_best],)


def _make_search_kernel(bd: int, coded_w: int, coded_h: int):
    jax = _get_jax()
    jnp = jax.numpy

    @partial(jax.jit, static_argnames=("damping",))
    def kernel(y, u, v, sy, su, sv, skip, sb_lam, damping):
        damping = damping + bd - 8  # spec: damping scales with bit depth
        h, w = coded_h, coded_w
        ch, cw = h >> 1, w >> 1
        nby, nbx = h // 8, w // 8
        nsby, nsbx = -(-h // 64), -(-w // 64)
        dirs, var = _find_dir_all_jnp(jnp, y, bd, h, w)
        s4 = skip[: nby * 2, : nbx * 2].reshape(nby, 2, nbx, 2).transpose(0, 2, 1, 3)
        active = ~s4.reshape(nby, nbx, 4).all(axis=2)
        scale = bd - 8

        def sse_sb(out, src, sub):
            """Per-64x64-superblock SSE map (edge SBs zero-padded)."""
            d = out.astype(jnp.float32) - src.astype(jnp.float32)
            sq = d * d
            bs = 64 >> sub
            hh, ww = sq.shape
            sq = jnp.pad(sq, ((0, nsby * bs - hh), (0, nsbx * bs - ww)))
            return sq.reshape(nsby, bs, nsbx, bs).sum(axis=(1, 3))

        y_outs, y_sses = [], []
        for pri, sec in Y_CANDIDATES:
            pri_map = _adjust_vec_jnp(jnp, pri << scale, var)
            cdirs = dirs if pri else jnp.zeros_like(dirs)
            out = _filter_plane_jnp(jnp, y, cdirs, pri_map, sec << scale,
                                    damping, bd, w, h, active, 0)
            y_outs.append(out.astype(jnp.uint16))
            y_sses.append(sse_sb(out, sy, 0))

        uv_outs, uv_sses = [], []
        for pri, sec in UV_CANDIDATES:
            uv_map = jnp.full(dirs.shape, pri << scale, jnp.int32)
            cdirs = dirs if pri else jnp.zeros_like(dirs)
            uo = _filter_plane_jnp(jnp, u, cdirs, uv_map, sec << scale,
                                   damping - 1, bd, cw, ch, active, 1)
            vo = _filter_plane_jnp(jnp, v, cdirs, uv_map, sec << scale,
                                   damping - 1, bd, cw, ch, active, 1)
            uv_outs.append((uo.astype(jnp.uint16), vo.astype(jnp.uint16)))
            uv_sses.append(sse_sb(uo, su, 1) + sse_sb(vo, sv, 1))

        # joint per-SB cost over the 8 fixed (y, uv) pairs
        ysse = jnp.stack(y_sses)                      # [8, nsby, nsbx]
        uvsse = jnp.stack(uv_sses)                    # [3, nsby, nsbx]
        cost = ysse + uvsse[jnp.asarray(PAIR_UV_IDX)]  # [8, nsby, nsbx]
        sb_idx = jnp.argmin(cost, axis=0).astype(jnp.int32)

        # cdef_idx is only coded for SBs with a non-skip block (spec
        # read_cdef); count them for the per-SB rate term
        mi = skip[: nby * 2, : nbx * 2]
        mi = jnp.pad(mi, ((0, nsby * 16 - mi.shape[0]),
                          (0, nsbx * 16 - mi.shape[1])), constant_values=True)
        sb_coded = ~mi.reshape(nsby, 16, nsbx, 16).transpose(0, 2, 1, 3) \
            .reshape(nsby, nsbx, 256).all(axis=2)
        n_coded = sb_coded.sum().astype(jnp.float32)

        frame_cost = cost.sum(axis=(1, 2))            # [8]
        frame_best = jnp.argmin(frame_cost).astype(jnp.int32)
        persb_total = cost.min(axis=0).sum()
        use_sb = (persb_total + sb_lam * (_SB_HDR_BITS + 3.0 * n_coded)
                  < frame_cost[frame_best])
        idx_map = jnp.where(use_sb, sb_idx, frame_best)

        # gather the chosen candidate per SB (CDEF reads only pre-CDEF
        # pixels, so per-8x8 outputs are independent of neighbors'
        # strengths — per-SB gather == per-SB decode)
        ypix = jnp.repeat(jnp.repeat(idx_map, 64, 0), 64, 1)[:h, :w]
        y_out = jnp.take_along_axis(jnp.stack(y_outs), ypix[None], axis=0)[0]
        uv_map_sb = jnp.asarray(PAIR_UV_IDX, jnp.int32)[idx_map]
        cpix = jnp.repeat(jnp.repeat(uv_map_sb, 32, 0), 32, 1)[:ch, :cw]
        u_out = jnp.take_along_axis(
            jnp.stack([o[0] for o in uv_outs]), cpix[None], axis=0)[0]
        v_out = jnp.take_along_axis(
            jnp.stack([o[1] for o in uv_outs]), cpix[None], axis=0)[0]
        return use_sb, frame_best, idx_map, y_out, u_out, v_out

    return kernel


_SEARCH_KERNELS: dict = {}
_SEARCH_KERNELS_PACKED: dict = {}


def _make_search_kernel_packed(bd: int, coded_w: int, coded_h: int,
                               skip_h: int, skip_w: int):
    """8-bit variant with single-array I/O: the tunnel to the chip has
    ~50-80 ms per-transfer latency, so the six planes ride one uint8
    upload and the three filtered planes + strength choices ride one
    uint8 download.  The device-resident deblocked/filtered luma come
    back as extra (untransferred) outputs for the Wiener chain."""
    jax = _get_jax()
    jnp = jax.numpy
    inner = _make_search_kernel(bd, coded_w, coded_h)

    @partial(jax.jit, static_argnames=("damping",))
    def kernel(upload, sb_lam, damping):
        h, w = coded_h, coded_w
        nY, nC = h * w, (h >> 1) * (w >> 1)
        o = 0

        def take(n, hh, ww):
            nonlocal o
            a = upload[o : o + n].reshape(hh, ww).astype(jnp.uint16)
            o += n
            return a

        y = take(nY, h, w)
        u = take(nC, h >> 1, w >> 1)
        v = take(nC, h >> 1, w >> 1)
        sy = take(nY, h, w)
        su = take(nC, h >> 1, w >> 1)
        sv = take(nC, h >> 1, w >> 1)
        skip = upload[o : o + skip_h * skip_w].reshape(skip_h, skip_w) != 0
        use_sb, frame_best, idx_map, y_out, u_out, v_out = inner(
            y, u, v, sy, su, sv, skip, sb_lam, damping=damping)
        packed = jnp.concatenate([
            y_out.astype(jnp.uint8).ravel(), u_out.astype(jnp.uint8).ravel(),
            v_out.astype(jnp.uint8).ravel(),
            use_sb.astype(jnp.uint8)[None], frame_best.astype(jnp.uint8)[None],
            idx_map.astype(jnp.uint8).ravel()])
        return packed, y, y_out

    return kernel


def _sb_result(use_sb: bool, frame_best: int, idx_map):
    """(strengths, sb_info) from a search kernel's selection outputs.
    strengths is the frame-level (y, uv) code pair (for cdef_bits = 0
    emission); sb_info is (bits, y_codes, uv_codes, idx_map) when the
    per-SB mode won, else None."""
    bits, y_codes, uv_codes = strength_codes(use_sb, frame_best)
    if use_sb:
        return (y_codes[0], uv_codes[0]), (bits, y_codes, uv_codes, idx_map)
    return (y_codes[0], uv_codes[0]), None


def cdef_search_apply_device(rec, src, skip, damping, bd, coded_w, coded_h,
                             sb_lam=None):
    """Search strengths over the whole frame and apply the winner, in one
    device call.  Mutates rec in place; returns (strengths,
    (dev_db_y, dev_cdef_y), sb_info) — the device-resident deblocked and
    filtered luma planes for chaining into the Wiener device pass, and the
    per-SB selection (see _sb_result) when sb_lam enables it.  With
    sb_lam=None the frame-level single pair is forced (cdef_bits = 0).
    Returns None on device failure (caller falls back to the host search)."""
    lam = np.float32(np.inf if sb_lam is None else sb_lam)
    try:
        if bd == 8:
            ch, cw = coded_h >> 1, coded_w >> 1
            key = (bd, coded_w, coded_h, skip.shape[0], skip.shape[1])
            k = _SEARCH_KERNELS_PACKED.get(key)
            if k is None:
                k = _make_search_kernel_packed(*key)
                _SEARCH_KERNELS_PACKED[key] = k
            import jax.numpy as jnp

            upload = np.concatenate([
                rec[0][:coded_h, :coded_w].astype(np.uint8).ravel(),
                rec[1][:ch, :cw].astype(np.uint8).ravel(),
                rec[2][:ch, :cw].astype(np.uint8).ravel(),
                src[0][:coded_h, :coded_w].astype(np.uint8).ravel(),
                src[1][:ch, :cw].astype(np.uint8).ravel(),
                src[2][:ch, :cw].astype(np.uint8).ravel(),
                np.asarray(skip, np.uint8).ravel()])
            packed, db_y, y_dev = k(jnp.asarray(upload), lam, damping=damping)
            out = np.asarray(packed)
            nY, nC = coded_h * coded_w, ch * cw
            nsby, nsbx = -(-coded_h // 64), -(-coded_w // 64)
            rec[0][:coded_h, :coded_w] = out[:nY].reshape(coded_h, coded_w)
            rec[1][:ch, :cw] = out[nY : nY + nC].reshape(ch, cw)
            rec[2][:ch, :cw] = out[nY + nC : nY + 2 * nC].reshape(ch, cw)
            o = nY + 2 * nC
            use_sb, frame_best = bool(out[o]), int(out[o + 1])
            idx_map = out[o + 2 : o + 2 + nsby * nsbx].reshape(nsby, nsbx)
            strengths, sb_info = _sb_result(use_sb, frame_best,
                                            idx_map.astype(np.int32))
            return strengths, (db_y, y_dev), sb_info
        key = (bd, coded_w, coded_h)
        k = _SEARCH_KERNELS.get(key)
        if k is None:
            k = _make_search_kernel(*key)
            _SEARCH_KERNELS[key] = k
        import jax.numpy as jnp

        db_y = jnp.asarray(rec[0][:coded_h, :coded_w].astype(np.uint16))
        use_sb, frame_best, idx_map, y, u, v = k(
            db_y,
            rec[1][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            rec[2][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            src[0][:coded_h, :coded_w].astype(np.uint16),
            src[1][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            src[2][: coded_h >> 1, : coded_w >> 1].astype(np.uint16),
            np.asarray(skip, bool),
            lam,
            damping=damping,
        )
    except Exception as e:
        import logging

        logging.getLogger("rav1e_tpu").warning(
            "device CDEF search unavailable (%s); host fallback", e
        )
        return None
    rec[0][:coded_h, :coded_w] = np.asarray(y)
    rec[1][: coded_h >> 1, : coded_w >> 1] = np.asarray(u)
    rec[2][: coded_h >> 1, : coded_w >> 1] = np.asarray(v)
    strengths, sb_info = _sb_result(bool(use_sb), int(frame_best),
                                    np.asarray(idx_map, np.int32))
    return strengths, (db_y, y), sb_info
