"""Fused in-loop filter chain on device: deblock -> CDEF search+apply in
ONE jit call with one upload (recon + per-mi maps) and one download
(filtered planes + strength codes).  The source planes are reused from
the wavefront pass's device-resident upload (no re-upload), and the
deblocked/CDEF'd luma stay on device for the Wiener (LRF) trial chain.

Reference analog: the deblock/CDEF stages of encode_frame (src/encoder.rs)
+ rdo_loop_decision's CDEF search (src/rdo.rs) — serial and sampled there;
whole-frame dense passes here.
"""

from __future__ import annotations

import logging

import numpy as np

from rav1e_tpu.ops.deblock_np import thresholds

_log = logging.getLogger("rav1e_tpu")

_KERNELS: dict = {}


def _wiener_solve_dev(jnp, d, s, h, w):
    """Device Wiener tap solve (one direction pair): least-squares fit of
    the symmetric 7-tap residual model, the jnp analog of
    lrf_np.solve_wiener's normal equations.  d/s: (h, w) int32.  Returns
    (vtaps3, htaps3) float32 (UNquantized; caller rounds/clips).
    Sums are accumulated per 64-row band in f32 then reduced, keeping
    relative error ~1e-7 on 1080p planes."""
    from rav1e_tpu.ops.lrf_np import WIENER_TAPS_MIN, WIENER_TAPS_MAX

    def solve_dir(axis):
        if axis == 0:
            pad = jnp.pad(d, ((3, 3), (0, 0)), mode="edge")
            cols = [pad[3 - k : h + 3 - k, :] + pad[3 + k : h + 3 + k, :]
                    for k in (3, 2, 1)]
        else:
            pad = jnp.pad(d, ((0, 0), (3, 3)), mode="edge")
            cols = [pad[:, 3 - k : w + 3 - k] + pad[:, 3 + k : w + 3 + k]
                    for k in (3, 2, 1)]
        f = [(c - 2 * d).astype(jnp.float32) for c in cols]
        b = (s - d).astype(jnp.float32)

        def acc(x, y):
            # band-partial sums: f32 keeps ~7 digits; whole-plane sums of
            # ~1e6-magnitude products need the two-stage reduction
            prod = x * y
            nb = (h + 63) // 64
            pads = nb * 64 - h
            p2 = jnp.pad(prod, ((0, pads), (0, 0)))
            return p2.reshape(nb, 64 * w).sum(axis=1).sum()

        M = jnp.stack([jnp.stack([acc(f[i], f[j]) for j in range(3)])
                       for i in range(3)])
        r = jnp.stack([acc(f[i], b) for i in range(3)])
        ridge = 1e-6 * (M[0, 0] + M[1, 1] + M[2, 2]) + 1e-3
        coef = jnp.linalg.solve(M + ridge * jnp.eye(3, dtype=jnp.float32), r)
        taps = jnp.round(coef * 128.0)
        lo = jnp.asarray(WIENER_TAPS_MIN, jnp.float32)
        hi = jnp.asarray(WIENER_TAPS_MAX, jnp.float32)
        return jnp.clip(taps, lo, hi).astype(jnp.int32)

    return solve_dir(0), solve_dir(1)


def _taps7_dev(jnp, t3):
    """wiener_7tap in jnp: [c0, c1, c2, 128 - 2*(c0+c1+c2), c2, c1, c0]."""
    mid = 128 - 2 * (t3[0] + t3[1] + t3[2])
    return jnp.stack([t3[0], t3[1], t3[2], mid, t3[2], t3[1], t3[0]])


def _make_kernel(Hp, Wp, coded_w, coded_h, bd, damping, skip_h, skip_w,
                 want_db_host=True, resident=None, lr_fuse=None):
    import jax
    import jax.numpy as jnp

    from rav1e_tpu.ops import deblock_jax as dj
    from rav1e_tpu.ops import cdef_jax as cj

    h, w = coded_h, coded_w
    ch, cw = h >> 1, w >> 1
    nY_src = Hp * Wp
    nC_src = (Hp >> 1) * (Wp >> 1)
    nY, nC = h * w, ch * cw
    n_mi = skip_h * skip_w

    cdef_kernel = (cj._make_search_kernel(bd, w, h) if damping else None)

    nsby, nsbx = -(-h // 64), -(-w // 64)
    # resident-recon variant: the pre-filter recon is read from the
    # wavefront pass's device-resident output (offset rec_bytes) and only
    # the host-encoded edge superblocks (bottom stripe below dev_h, right
    # stripe beyond dev_w) ride the upload
    rec_bytes = dev_h = dev_w = 0
    if resident is not None:
        rec_bytes, dev_h, dev_w = resident

    lr_tabs = None
    if lr_fuse is not None:
        # restoration-unit geometry + stripe gather tables (host consts)
        from rav1e_tpu.ops import lrf_np as lrn
        from rav1e_tpu.ops.lrf_jax import _gather_tables

        out_w, out_h = lr_fuse
        cwo, cho = (out_w + 1) >> 1, (out_h + 1) >> 1

        def unit_tabs(hh, ww, unit):
            rows = lrn.unit_ranges(unit, hh, shifted=True)
            cols = lrn.unit_ranges(unit, ww)
            ru = np.zeros(hh, np.int32)
            for i, (s0, e0) in enumerate(rows):
                ru[s0:e0] = i
            cu = np.zeros(ww, np.int32)
            for i, (s0, e0) in enumerate(cols):
                cu[s0:e0] = i
            return rows, cols, ru, cu

        lr_tabs = (unit_tabs(out_h, out_w, 64), unit_tabs(cho, cwo, 32),
                   _gather_tables(out_h, 64), _gather_tables(cho, 32))

    def run(src_pack, up, lims, sb_lam, lr_lam, wf_out=None):
        # src planes from the wavefront's packed upload (padded dims)
        sY = src_pack[:nY_src].reshape(Hp, Wp)[:h, :w].astype(jnp.uint16)
        sU = src_pack[nY_src : nY_src + nC_src].reshape(
            Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.uint16)
        sV = src_pack[nY_src + nC_src : nY_src + 2 * nC_src].reshape(
            Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.uint16)
        o = 0

        def take(n):
            nonlocal o
            a = up[o : o + n]
            o += n
            return a

        if resident is not None:
            oo = rec_bytes
            recY = wf_out[oo : oo + nY_src].reshape(Hp, Wp)[:h, :w] \
                .astype(jnp.int32)
            oo += nY_src
            recU = wf_out[oo : oo + nC_src].reshape(
                Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.int32)
            oo += nC_src
            recV = wf_out[oo : oo + nC_src].reshape(
                Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.int32)
            if dev_h < h:
                recY = recY.at[dev_h:h, :].set(
                    take((h - dev_h) * w).reshape(h - dev_h, w)
                    .astype(jnp.int32))
                recU = recU.at[dev_h >> 1 : ch, :].set(
                    take((ch - (dev_h >> 1)) * cw)
                    .reshape(ch - (dev_h >> 1), cw).astype(jnp.int32))
                recV = recV.at[dev_h >> 1 : ch, :].set(
                    take((ch - (dev_h >> 1)) * cw)
                    .reshape(ch - (dev_h >> 1), cw).astype(jnp.int32))
            if dev_w < w:
                recY = recY.at[:dev_h, dev_w:w].set(
                    take(dev_h * (w - dev_w)).reshape(dev_h, w - dev_w)
                    .astype(jnp.int32))
                recU = recU.at[: dev_h >> 1, dev_w >> 1 : cw].set(
                    take((dev_h >> 1) * (cw - (dev_w >> 1)))
                    .reshape(dev_h >> 1, cw - (dev_w >> 1))
                    .astype(jnp.int32))
                recV = recV.at[: dev_h >> 1, dev_w >> 1 : cw].set(
                    take((dev_h >> 1) * (cw - (dev_w >> 1)))
                    .reshape(dev_h >> 1, cw - (dev_w >> 1))
                    .astype(jnp.int32))
        else:
            recY = take(nY).reshape(h, w).astype(jnp.int32)
            recU = take(nC).reshape(ch, cw).astype(jnp.int32)
            recV = take(nC).reshape(ch, cw).astype(jnp.int32)
        txw = take(n_mi).reshape(skip_h, skip_w).astype(jnp.int32)
        txh = take(n_mi).reshape(skip_h, skip_w).astype(jnp.int32)
        bx = jax.lax.bitcast_convert_type(
            take(2 * n_mi).reshape(n_mi, 2), jnp.int16
        ).reshape(skip_h, skip_w).astype(jnp.int32)
        by = jax.lax.bitcast_convert_type(
            take(2 * n_mi).reshape(n_mi, 2), jnp.int16
        ).reshape(skip_h, skip_w).astype(jnp.int32)
        skip = take(n_mi).reshape(skip_h, skip_w) != 0

        # ---- deblock (bit-exact jnp port; lims: (4, 4) limit/blimit/
        # thresh/enabled per level slot, traced so q changes don't
        # recompile) ----
        def pass_dir(img, tx, bp, sk, slot, pi, s_along, s_across, ww, hh):
            lim, bl, th, on = lims[slot, 0], lims[slot, 1], lims[slot, 2], \
                lims[slot, 3]
            out = dj._pass_dir(jnp, img, lim, bl, th, bd, pi, ww, hh,
                               tx, bp, sk, s_along, s_across)
            return jnp.where(on > 0, out, img)

        def db_plane(img, pi, sx, sy, ww, hh, slot_v, slot_h):
            img = pass_dir(img, txw >> sx, bx >> sx, skip, slot_v, pi,
                           sy, sx, ww, hh)
            img = pass_dir(img.T, (txh >> sy).T, (by >> sy).T, skip.T,
                           slot_h, pi, sx, sy, hh, ww).T
            return img

        dbY = db_plane(recY, 0, 0, 0, w, h, 0, 1)
        dbU = db_plane(recU, 1, 1, 1, cw, ch, 2, 2)
        dbV = db_plane(recV, 2, 1, 1, cw, ch, 3, 3)

        dbY16 = dbY.astype(jnp.uint16)
        if cdef_kernel is None:
            y_out = dbY16
            u_out = dbU.astype(jnp.uint16)
            v_out = dbV.astype(jnp.uint16)
            use_sb = frame_best = jnp.zeros((), jnp.int32)
            idx_map = jnp.zeros((nsby, nsbx), jnp.int32)
        else:
            use_sb, frame_best, idx_map, y_out, u_out, v_out = cdef_kernel(
                dbY16, dbU.astype(jnp.uint16), dbV.astype(jnp.uint16),
                sY, sU, sV, skip, sb_lam, damping=damping)
        parts = [
            y_out.astype(jnp.uint8).ravel(), u_out.astype(jnp.uint8).ravel(),
            v_out.astype(jnp.uint8).ravel()]
        if want_db_host:
            # deblocked planes for the host (SGR / per-unit host trials
            # read LR stripe boundaries; not needed when those are off)
            parts += [dbY.astype(jnp.uint8).ravel(),
                      dbU.astype(jnp.uint8).ravel(),
                      dbV.astype(jnp.uint8).ravel()]
        parts += [
            use_sb.astype(jnp.uint8).reshape(1),
            frame_best.astype(jnp.uint8).reshape(1),
            idx_map.astype(jnp.uint8).ravel()]

        if lr_fuse is not None:
            # ---- fused loop restoration: Wiener tap solve (normal
            # equations, device) + none-vs-Wiener per-unit decision +
            # composed planes — no extra device round trips.  Reference
            # analog: the Wiener arm of rdo_loop_decision (src/rdo.rs) +
            # the per-unit loops of src/lrf.rs, run as one fused stage
            # after CDEF in the same jit program. ----
            from rav1e_tpu.ops.lrf_jax import (LR_RATE_C, LR_RATE_Y,
                                               _wiener_body)

            tabY, tabC, gY, gC = lr_tabs

            def unit_sse(d, rows, cols):
                a = jnp.stack([d[s0:e0].sum(axis=0, dtype=jnp.int32)
                               for (s0, e0) in rows])
                return jnp.stack([a[:, s0:e0].sum(axis=1, dtype=jnp.int32)
                                  for (s0, e0) in cols], axis=1)

            def lr_plane(cd16, db16, src, tab, gt, rate, hh, ww,
                         chroma):
                cdi = cd16[:hh, :ww].astype(jnp.int32)
                si = src[:hh, :ww].astype(jnp.int32)
                v3, h3 = _wiener_solve_dev(jnp, cdi, si, hh, ww)
                if chroma:
                    v3 = v3.at[0].set(0)  # chroma outer tap is 0 (spec)
                    h3 = h3.at[0].set(0)
                en = (jnp.abs(v3).sum() + jnp.abs(h3).sum()) > 0
                rows, cols, ru, cu = tab
                ridx, use_db = gt
                rest = _wiener_body(jax, jnp, cd16, db16,
                                    jnp.asarray(ridx), jnp.asarray(use_db),
                                    _taps7_dev(jnp, v3), _taps7_dev(jnp, h3),
                                    bd, ww, hh)
                d0 = (cdi - si) ** 2
                d1 = (rest - si) ** 2
                s0 = unit_sse(d0, rows, cols)
                s1 = unit_sse(d1, rows, cols)
                take = (s1.astype(jnp.float32) + lr_lam * rate
                        < s0.astype(jnp.float32)) & en
                tpx = jnp.take(jnp.take(take, jnp.asarray(ru), axis=0),
                               jnp.asarray(cu), axis=1)
                comp = jnp.where(tpx, rest, cdi)
                return comp, take, v3, h3, en

            cY, tY, vY, hY, eY = lr_plane(y_out, dbY16, sY, tabY, gY,
                                          LR_RATE_Y, out_h, out_w, False)
            cU, tU, vU, hU, eU = lr_plane(u_out, dbU.astype(jnp.uint16),
                                          sU, tabC, gC, LR_RATE_C,
                                          cho, cwo, True)
            cV, tV, vV, hV, eV = lr_plane(v_out, dbV.astype(jnp.uint16),
                                          sV, tabC, gC, LR_RATE_C,
                                          cho, cwo, True)
            taps = jnp.stack([vY, hY, vU, hU, vV, hV])  # (6, 3) int32
            en3 = jnp.stack([eY, eU, eV]).astype(jnp.uint8)
            parts += [
                cY.astype(jnp.uint8).ravel(), cU.astype(jnp.uint8).ravel(),
                cV.astype(jnp.uint8).ravel(),
                tY.astype(jnp.uint8).ravel(), tU.astype(jnp.uint8).ravel(),
                tV.astype(jnp.uint8).ravel(),
                jax.lax.bitcast_convert_type(
                    taps.astype(jnp.int32), jnp.uint8).ravel(),
                en3]
        return (jnp.concatenate(parts), dbY16, y_out,
                dbU.astype(jnp.uint16), dbV.astype(jnp.uint16),
                u_out.astype(jnp.uint16), v_out.astype(jnp.uint16))

    return jax.jit(run)


def filter_chain_device(fe):
    """Launch + collect in one call (the non-pipelined path)."""
    h = launch_filter_chain(fe)
    if h is None:
        return False
    return collect_filter_chain(fe, h)


def launch_filter_chain(fe):
    """Enqueue deblock (+ CDEF search/apply when damping > 0) on device
    for an IntraFrameEncoder with a device-resident source (fe._src_dev
    from the wavefront launch).  Returns an opaque handle for
    collect_filter_chain (which fills fe.rec and the CDEF fields), or
    None when ineligible (caller keeps the host path).  Split so the
    orchestration can enqueue every batched frame's chain back-to-back
    before any host entropy work (SURVEY 2.6 pipelining)."""
    src_dev = getattr(fe, "_src_dev", None)
    if src_dev is None or fe.bd != 8 or not fe._is420:
        return None
    import jax.numpy as jnp

    h, w = fe.coded_h, fe.coded_w
    ch, cw = h >> 1, w >> 1
    info = fe.db_info
    skip_h, skip_w = info.skip.shape
    # host copies of the deblocked planes are only read by the host-side
    # per-unit trials (SGR search / per-unit Wiener taps); the plain
    # speed-6 LR flow runs its trials from the device-resident planes
    want_db_host = bool(fe.lrf and getattr(fe, "sgr_search", False))
    wf_dev = getattr(fe, "_wf_dev_out", None)
    import os

    if os.environ.get("RAV1E_TPU_CHAIN_RESIDENT", "1") == "0":
        wf_dev = None
    resident = None
    parts = []
    if wf_dev is not None:
        out_dev, rec_bytes = wf_dev
        dev_h, dev_w = (h // 64) * 64, (w // 64) * 64
        resident = (rec_bytes, dev_h, dev_w)
        # host-encoded edge stripes only (the device region rides the
        # wavefront pass's resident output, no re-upload)
        if dev_h < h:
            parts += [fe.rec[0][dev_h:h, :w].astype(np.uint8).ravel(),
                      fe.rec[1][dev_h >> 1 : ch, :cw].astype(np.uint8).ravel(),
                      fe.rec[2][dev_h >> 1 : ch, :cw].astype(np.uint8).ravel()]
        if dev_w < w:
            parts += [
                fe.rec[0][:dev_h, dev_w:w].astype(np.uint8).ravel(),
                fe.rec[1][: dev_h >> 1, dev_w >> 1 : cw].astype(np.uint8).ravel(),
                fe.rec[2][: dev_h >> 1, dev_w >> 1 : cw].astype(np.uint8).ravel()]
    else:
        parts += [fe.rec[0][:h, :w].astype(np.uint8).ravel(),
                  fe.rec[1][:ch, :cw].astype(np.uint8).ravel(),
                  fe.rec[2][:ch, :cw].astype(np.uint8).ravel()]
    # fused LR decision (tap solve + trials + composition) rides the same
    # jit program when the frame is in the plain speed-6 LR envelope.
    # RAV1E_TPU_LR_FUSE=0 keeps the host tap solve (parity tests compare
    # the device flow byte-for-byte against the pure-python oracle, and
    # the device normal-equation solve picks slightly different taps)
    lr_fuse = None
    if (fe.lrf and not getattr(fe, "sgr_search", False) and fe.bd == 8
            and fe._is420 and fe.q > 0
            and os.environ.get("RAV1E_TPU_LR_FUSE", "1") != "0"):
        lr_fuse = (fe.out_w, fe.out_h)
    key = (fe.h, fe.w, w, h, fe.bd, fe.cdef_damping, skip_h, skip_w,
           want_db_host, resident, lr_fuse)
    k = _KERNELS.get(key)
    if k is None:
        k = _make_kernel(*key[:-2], resident=resident, lr_fuse=lr_fuse)
        _KERNELS[key] = k

    lims = np.zeros((4, 4), np.float32)
    for slot in range(4):
        lv = fe.lf_levels[slot]
        lim, bl, th = thresholds(lv, fe.lf_sharpness, fe.bd)
        lims[slot] = (lim, bl, th, 1.0 if lv else 0.0)

    upload = np.concatenate(parts + [
        info.txw.astype(np.uint8).ravel(), info.txh.astype(np.uint8).ravel(),
        info.bx.astype(np.int16).ravel().view(np.uint8),
        info.by.astype(np.int16).ravel().view(np.uint8),
        info.skip.astype(np.uint8).ravel()])

    # per-SB CDEF needs the deferred entropy pass (pass B) to interleave
    # cdef_idx literals; only the LRF two-pass flow provides that
    sb_lam = np.float32(fe.lam if (fe.lrf and fe.cdef_damping) else np.inf)
    lr_lam = np.float32(fe.lam)
    try:
        if resident is not None:
            (packed, db_y16, cdef_y16, db_u16, db_v16,
             cdef_u16, cdef_v16) = k(src_dev, jnp.asarray(upload),
                                     jnp.asarray(lims), sb_lam, lr_lam,
                                     wf_out=out_dev)
        else:
            (packed, db_y16, cdef_y16, db_u16, db_v16,
             cdef_u16, cdef_v16) = k(src_dev, jnp.asarray(upload),
                                     jnp.asarray(lims), sb_lam, lr_lam)
        # schedule the D2H copy NOW; the prefetch of the next frames'
        # wavefront fires later, in _finish_lr AFTER the batch's LAST
        # device use (the LR trial) — enqueueing it here would make the
        # LR device calls queue behind that big batched compute
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
    except Exception as e:
        _log.warning("device filter chain unavailable (%s); host path", e)
        return None
    return (packed, db_y16, cdef_y16, db_u16, db_v16, cdef_u16, cdef_v16,
            want_db_host, lr_fuse)


def collect_filter_chain(fe, handle) -> bool:
    """Wait on a launch_filter_chain handle and fill fe.rec /
    fe._dev_db / fe._dev_cdef / CDEF strengths (+ the fused LR decision
    when the kernel ran it).  Returns False if the device run failed
    (caller keeps the host path)."""
    (packed, db_y16, cdef_y16, db_u16, db_v16, cdef_u16, cdef_v16,
     want_db_host, lr_fuse) = handle
    h, w = fe.coded_h, fe.coded_w
    ch, cw = h >> 1, w >> 1
    try:
        with fe.stats.stage("chain_wait"):
            out = np.asarray(packed)
    except Exception as e:
        _log.warning("device filter chain unavailable (%s); host path", e)
        return False
    nY, nC = h * w, ch * cw
    fe.rec[0][:h, :w] = out[:nY].reshape(h, w)
    fe.rec[1][:ch, :cw] = out[nY : nY + nC].reshape(ch, cw)
    fe.rec[2][:ch, :cw] = out[nY + nC : nY + 2 * nC].reshape(ch, cw)
    fe._dev_db = db_y16
    fe._dev_cdef = cdef_y16
    fe._dev_db_c = (db_u16, db_v16)
    fe._dev_cdef_c = (cdef_u16, cdef_v16)
    o = nY + 2 * nC
    fe._chain_restored = None
    fe._chain_taps = None
    if fe.lrf:
        if want_db_host:
            db_y = out[o : o + nY].reshape(h, w)
            o += nY
            db_u = out[o : o + nC].reshape(ch, cw)
            o += nC
            db_v = out[o : o + nC].reshape(ch, cw)
            o += nC
            # LR stripe boundaries read the pre-CDEF (deblocked) rows; the
            # Wiener trial itself stays a separate device call overlapped
            # with host work (measured faster than folding it in here)
            copies = []
            for plane, db in ((0, db_y), (1, db_u), (2, db_v)):
                full = np.array(fe.rec[plane])
                full[: db.shape[0], : db.shape[1]] = db
                copies.append(full)
            fe._deblock_copy = copies
        else:
            # device-resident trials only (_lr_decide reads the _dev_db/
            # _dev_cdef refs); None makes any stray host read fail safe
            fe._deblock_copy = None
    nsby, nsbx = -(-h // 64), -(-w // 64)
    if fe.cdef_damping:
        from rav1e_tpu.ops.cdef_jax import _sb_result

        use_sb, frame_best = bool(out[o]), int(out[o + 1])
        idx_map = out[o + 2 : o + 2 + nsby * nsbx].reshape(nsby, nsbx)
        fe.cdef_strengths, fe.cdef_sb = _sb_result(
            use_sb, frame_best, idx_map.astype(np.int32))
    else:
        fe.cdef_strengths = None
        fe.cdef_sb = None
    o += 2 + nsby * nsbx
    fe._chain_lr = None
    if lr_fuse is not None:
        from rav1e_tpu.ops import lrf_np as lrn

        out_w, out_h = lr_fuse
        cwo, cho = (out_w + 1) >> 1, (out_h + 1) >> 1
        nYo, nCo = out_h * out_w, cho * cwo
        comp = []
        for n, (hh, ww) in ((nYo, (out_h, out_w)), (nCo, (cho, cwo)),
                            (nCo, (cho, cwo))):
            comp.append(out[o : o + n].reshape(hh, ww).astype(np.int32))
            o += n
        nuY = (lrn.count_units(64, out_h), lrn.count_units(64, out_w))
        nuC = (lrn.count_units(32, cho), lrn.count_units(32, cwo))
        choice = {}
        for p, (nr, nc) in ((0, nuY), (1, nuC), (2, nuC)):
            choice[p] = out[o : o + nr * nc].reshape(nr, nc).astype(bool)
            o += nr * nc
        taps = out[o : o + 6 * 3 * 4].copy().view(np.int32).reshape(6, 3)
        o += 6 * 3 * 4
        en = out[o : o + 3] != 0
        fe._chain_lr = (comp, choice, taps, en)
    return True
