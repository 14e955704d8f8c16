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


def _make_kernel(Hp, Wp, coded_w, coded_h, bd, damping, skip_h, skip_w,
                 want_db_host=True, resident=None):
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

    def run(src_pack, up, lims, sb_lam, wf_out=None):
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
        return (jnp.concatenate(parts), dbY16, y_out,
                dbU.astype(jnp.uint16), dbV.astype(jnp.uint16),
                u_out.astype(jnp.uint16), v_out.astype(jnp.uint16))

    return jax.jit(run)


def filter_chain_device(fe):
    """Run deblock (+ CDEF search/apply when damping > 0) on device for an
    IntraFrameEncoder with a device-resident source (fe._src_dev from the
    wavefront launch).  Mutates fe.rec in place, sets fe._deblock_copy and
    fe._dev_db/_dev_cdef, and returns the CDEF strength codes (or None
    when CDEF is off).  Returns False if ineligible (caller keeps the host
    path)."""
    src_dev = getattr(fe, "_src_dev", None)
    if src_dev is None or fe.bd != 8 or not fe._is420:
        return False
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
    key = (fe.h, fe.w, w, h, fe.bd, fe.cdef_damping, skip_h, skip_w,
           want_db_host, resident)
    k = _KERNELS.get(key)
    if k is None:
        k = _make_kernel(*key[:-1], resident=resident)
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
    try:
        if resident is not None:
            (packed, db_y16, cdef_y16, db_u16, db_v16,
             cdef_u16, cdef_v16) = k(src_dev, jnp.asarray(upload),
                                     jnp.asarray(lims), sb_lam,
                                     wf_out=out_dev)
        else:
            (packed, db_y16, cdef_y16, db_u16, db_v16,
             cdef_u16, cdef_v16) = k(src_dev, jnp.asarray(upload),
                                     jnp.asarray(lims), sb_lam)
        # schedule the D2H copy NOW; the prefetch of the next frames'
        # wavefront fires later, in _finish_lr AFTER this frame's LAST
        # device use (the LR trial) — enqueueing it here would make the
        # LR device calls queue behind that big batched compute
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
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
    if fe.cdef_damping:
        from rav1e_tpu.ops.cdef_jax import _sb_result

        nsby, nsbx = -(-h // 64), -(-w // 64)
        use_sb, frame_best = bool(out[o]), int(out[o + 1])
        idx_map = out[o + 2 : o + 2 + nsby * nsbx].reshape(nsby, nsbx)
        fe.cdef_strengths, fe.cdef_sb = _sb_result(
            use_sb, frame_best, idx_map.astype(np.int32))
    else:
        fe.cdef_strengths = None
        fe.cdef_sb = None
    return True
