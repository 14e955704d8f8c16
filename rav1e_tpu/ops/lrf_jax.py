"""Device (TPU) whole-frame Wiener restoration.

Bit-exact jitted equivalent of lrf_np.wiener_filter_frame: the stripe-rule
source-row gather tables are precomputed host-side per (h, stripe) and the
separable 7-tap integer filter runs as one XLA graph (int32 throughout —
all intermediates fit).  Taps are traced inputs, so changing them does not
recompile.  Falls back to numpy with a logged warning.

Reference analog: rav1e src/lrf.rs wiener filtering (SIMD there; whole
frame in one device pass here).
"""

from __future__ import annotations

import logging

import numpy as np

from rav1e_tpu.ops import lrf_np as lr

_log = logging.getLogger("rav1e_tpu")

_GATHER_CACHE: dict = {}
_JIT_CACHE: dict = {}


def _gather_tables(h: int, stripe: int):
    key = (h, stripe)
    t = _GATHER_CACHE.get(key)
    if t is None:
        ridx = np.zeros((h, 7), np.int32)
        use_db = np.zeros((h, 7), np.bool_)
        for tap in range(-3, 4):
            for y in range(h):
                rr, db = lr._stripe_source(None, None, y, tap, stripe, h)
                ridx[y, tap + 3] = rr
                use_db[y, tap + 3] = db
        t = (ridx, use_db)
        _GATHER_CACHE[key] = t
    return t


def _jitted(bd: int, w: int, h: int):
    key = (bd, w, h)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    round0 = 3 if bd < 12 else 5
    round1 = 11 if bd < 12 else 9
    off_h = 1 << (bd + 6)
    limit = (1 << (bd + 1 + 7 - round0)) - 1
    off_v = 1 << (bd + round1 - 1)
    mx = (1 << bd) - 1
    xs = np.clip(np.arange(-3, w + 3), 0, w - 1).astype(np.int32)

    def f(cd, db, ridx, use_db, vf, hf):
        cdx = cd[:, xs].astype(jnp.int32)
        dbx = db[:, xs].astype(jnp.int32)
        rows = jnp.where(use_db[:, :, None], dbx[ridx], cdx[ridx])  # (h,7,w+6)
        hor = jnp.zeros((h, 7, w), jnp.int32)
        for t in range(7):
            hor = hor + hf[t] * jax.lax.dynamic_slice_in_dim(rows, t, w, axis=2)
        hor = (hor + (off_h + (1 << (round0 - 1)))) >> round0
        hor = jnp.clip(hor, 0, limit)
        s = (vf[None, :, None] * hor).sum(axis=1, dtype=jnp.int32) - off_v
        v = (s + (1 << (round1 - 1))) >> round1
        return jnp.clip(v, 0, mx).astype(jnp.uint16)

    fn = jax.jit(f)
    _JIT_CACHE[key] = fn
    return fn


def _wiener_body(jax, jnp, cd, db, ridx, use_db, vf, hf, bd, w, h):
    """Shared Wiener 7-tap separable filter body (int32, bit-exact with
    lrf_np.wiener_filter_frame).  cd/db: (>=h, >=w) planes."""
    round0 = 3 if bd < 12 else 5
    round1 = 11 if bd < 12 else 9
    off_h = 1 << (bd + 6)
    limit = (1 << (bd + 1 + 7 - round0)) - 1
    off_v = 1 << (bd + round1 - 1)
    mx = (1 << bd) - 1
    xs = np.clip(np.arange(-3, w + 3), 0, w - 1).astype(np.int32)
    cdx = cd[:h, xs].astype(jnp.int32)
    dbx = db[:h, xs].astype(jnp.int32)
    rows = jnp.where(use_db[:, :, None], dbx[ridx], cdx[ridx])  # (h,7,w+6)
    hor = jnp.zeros((h, 7, w), jnp.int32)
    for t in range(7):
        hor = hor + hf[t] * jax.lax.dynamic_slice_in_dim(rows, t, w, axis=2)
    hor = (hor + (off_h + (1 << (round0 - 1)))) >> round0
    hor = jnp.clip(hor, 0, limit)
    s = (vf[None, :, None] * hor).sum(axis=1, dtype=jnp.int32) - off_v
    v = (s + (1 << (round1 - 1))) >> round1
    return jnp.clip(v, 0, mx)


# fused whole-frame LR decision: Wiener trials for all three planes, exact
# per-unit SSE sums, the none-vs-wiener choice, and the composed restored
# planes — ONE device call, one small download.  Replaces three device
# trial round-trips plus the host d2 maps / per-unit python loop.
# Reference analog: the Wiener arm of rdo_loop_decision (src/rdo.rs) +
# per-plane unit loops in src/lrf.rs, reformulated as whole-frame batch.

_DECIDE_CACHE: dict = {}

# per-unit header rate (bits) charged against the restored SSE — matches
# the host path's constants in intra_frame._lr_decide/_lr_decide_chroma
LR_RATE_Y = 12.0
LR_RATE_C = 9.0


def _make_lr_decide(bd: int, Hp: int, Wp: int, out_w: int, out_h: int):
    import jax
    import jax.numpy as jnp

    cw, ch = (out_w + 1) >> 1, (out_h + 1) >> 1
    nY_src, nC_src = Hp * Wp, (Hp >> 1) * (Wp >> 1)

    def tables(h, w, unit):
        rows = lr.unit_ranges(unit, h, shifted=True)
        cols = lr.unit_ranges(unit, w)
        ru = np.zeros(h, np.int32)
        for i, (s, e) in enumerate(rows):
            ru[s:e] = i
        cu = np.zeros(w, np.int32)
        for i, (s, e) in enumerate(cols):
            cu[s:e] = i
        return rows, cols, ru, cu

    rowsY, colsY, ruY, cuY = tables(out_h, out_w, 64)
    rowsC, colsC, ruC, cuC = tables(ch, cw, 32)
    gY = _gather_tables(out_h, 64)
    gC = _gather_tables(ch, 32)

    def unit_sse(d, rows, cols):
        """Exact int32 per-unit sums of a (h, w) int32 map via static
        slice reductions (unit sums stay < 2^31)."""
        a = jnp.stack([d[s:e].sum(axis=0, dtype=jnp.int32)
                       for (s, e) in rows])
        return jnp.stack([a[:, s:e].sum(axis=1, dtype=jnp.int32)
                          for (s, e) in cols], axis=1)

    def plane(cd, db, src, vf, hf, en, gt, rows, cols, ru, cu, rate, lam,
              h, w):
        ridx, use_db = gt
        rest = _wiener_body(jax, jnp, cd, db, jnp.asarray(ridx),
                            jnp.asarray(use_db), vf, hf, bd, w, h)
        base = cd[:h, :w].astype(jnp.int32)
        d0 = (base - src) ** 2
        d1 = (rest - src) ** 2
        s0 = unit_sse(d0, rows, cols)
        s1 = unit_sse(d1, rows, cols)
        take = (s1.astype(jnp.float32) + lam * rate
                < s0.astype(jnp.float32)) & (en > 0)
        tpx = jnp.take(jnp.take(take, jnp.asarray(ru), axis=0),
                       jnp.asarray(cu), axis=1)
        comp = jnp.where(tpx, rest, base)
        return comp, take, s0, s1

    def run(src_pack, cdY, dbY, cdU, dbU, cdV, dbV,
            vfY, hfY, vfU, hfU, vfV, hfV, en, lam):
        sY = src_pack[:nY_src].reshape(Hp, Wp)[:out_h, :out_w].astype(
            jnp.int32)
        sU = src_pack[nY_src : nY_src + nC_src].reshape(
            Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.int32)
        sV = src_pack[nY_src + nC_src : nY_src + 2 * nC_src].reshape(
            Hp >> 1, Wp >> 1)[:ch, :cw].astype(jnp.int32)
        cY, tY, s0Y, s1Y = plane(cdY, dbY, sY, vfY, hfY, en[0], gY,
                                 rowsY, colsY, ruY, cuY, LR_RATE_Y, lam,
                                 out_h, out_w)
        cU, tU, s0U, s1U = plane(cdU, dbU, sU, vfU, hfU, en[1], gC,
                                 rowsC, colsC, ruC, cuC, LR_RATE_C, lam,
                                 ch, cw)
        cV, tV, s0V, s1V = plane(cdV, dbV, sV, vfV, hfV, en[2], gC,
                                 rowsC, colsC, ruC, cuC, LR_RATE_C, lam,
                                 ch, cw)
        packed = jnp.concatenate([
            cY.astype(jnp.uint8).ravel(), cU.astype(jnp.uint8).ravel(),
            cV.astype(jnp.uint8).ravel(),
            tY.astype(jnp.uint8).ravel(), tU.astype(jnp.uint8).ravel(),
            tV.astype(jnp.uint8).ravel()])
        return packed

    return jax.jit(run)


def lr_decide_device(fe, taps_y, taps_c: dict):
    """Run the fused none-vs-Wiener LR decision on device.  taps_y:
    (vt, ht) or None; taps_c: {plane: (vt, ht)}.  Returns (composite
    planes [Y, U, V] int32 at out dims, choice maps {0,1,2: bool
    (n_ur, n_uc)}) or None when the device planes are unavailable."""
    dev_cdef = getattr(fe, "_dev_cdef", None)
    dev_db = getattr(fe, "_dev_db", None)
    dev_c = getattr(fe, "_dev_cdef_c", None)
    dev_db_c = getattr(fe, "_dev_db_c", None)
    src_dev = getattr(fe, "_src_dev", None)
    if (fe.bd != 8 or dev_cdef is None or dev_db is None or dev_c is None
            or dev_db_c is None or src_dev is None):
        return None
    import jax.numpy as jnp

    key = (fe.bd, fe.h, fe.w, fe.out_w, fe.out_h)
    fn = _DECIDE_CACHE.get(key)
    if fn is None:
        fn = _make_lr_decide(*key)
        _DECIDE_CACHE[key] = fn

    def taps7(tp):
        if tp is None:
            return (np.zeros(7, np.int32), np.zeros(7, np.int32), 0)
        vf = lr.wiener_7tap(tp[0]).astype(np.int32)
        hf = lr.wiener_7tap(tp[1]).astype(np.int32)
        return vf, hf, 1

    vfY, hfY, enY = taps7(taps_y)
    vfU, hfU, enU = taps7(taps_c.get(1))
    vfV, hfV, enV = taps7(taps_c.get(2))
    try:
        packed = fn(src_dev, dev_cdef, dev_db, dev_c[0], dev_db_c[0],
                    dev_c[1], dev_db_c[1],
                    jnp.asarray(vfY), jnp.asarray(hfY), jnp.asarray(vfU),
                    jnp.asarray(hfU), jnp.asarray(vfV), jnp.asarray(hfV),
                    jnp.asarray(np.asarray([enY, enU, enV], np.int32)),
                    np.float32(fe.lam))
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        out = np.asarray(packed)
    except Exception as e:  # pragma: no cover - device fallback
        _log.warning("device LR decide unavailable (%s); host path", e)
        return None
    out_h, out_w = fe.out_h, fe.out_w
    cw, ch = (out_w + 1) >> 1, (out_h + 1) >> 1
    nY, nC = out_h * out_w, ch * cw
    nuY = (lr.count_units(64, out_h), lr.count_units(64, out_w))
    nuC = (lr.count_units(32, ch), lr.count_units(32, cw))
    o = 0
    comp = []
    for n, (hh, ww) in ((nY, (out_h, out_w)), (nC, (ch, cw)),
                        (nC, (ch, cw))):
        comp.append(out[o : o + n].reshape(hh, ww).astype(np.int32))
        o += n
    choice = {}
    for p, (nr, nc) in ((0, nuY), (1, nuC), (2, nuC)):
        choice[p] = out[o : o + nr * nc].reshape(nr, nc).astype(bool)
        o += nr * nc
    return comp, choice


def wiener_filter_frame_device(cdef_p, deblock_p, vtaps3, htaps3,
                               stripe_size: int, bd: int,
                               frame_w: int, frame_h: int,
                               dev_cdef=None, dev_db=None) -> np.ndarray:
    """Drop-in for lrf_np.wiener_filter_frame (bit-exact, parity-tested).
    dev_cdef/dev_db: optional device-resident uint16 planes (from the CDEF
    device pass) to skip the host->device upload."""
    try:
        import jax.numpy as jnp

        ridx, use_db = _gather_tables(frame_h, stripe_size)
        vf = lr.wiener_7tap(vtaps3).astype(np.int32)
        hf = lr.wiener_7tap(htaps3).astype(np.int32)
        fn = _jitted(bd, frame_w, frame_h)
        # uint16 transfers (4x less tunnel traffic than int32)
        cd = (dev_cdef[:frame_h] if dev_cdef is not None
              else jnp.asarray(cdef_p[:frame_h].astype(np.uint16)))
        db = (dev_db[:frame_h] if dev_db is not None
              else jnp.asarray(deblock_p[:frame_h].astype(np.uint16)))
        out = fn(cd, db, jnp.asarray(ridx), jnp.asarray(use_db),
                 jnp.asarray(vf), jnp.asarray(hf))
        return np.asarray(out).astype(np.int64)
    except Exception as e:  # pragma: no cover - device fallback
        _log.warning("device wiener filter unavailable (%s); numpy fallback", e)
        if deblock_p is None:
            # no host copy of the deblocked plane: return an identity
            # restoration so the caller's RD decision rejects it (never
            # signal taps whose decoder-side output we could not compute)
            return np.asarray(cdef_p[:frame_h, :frame_w], np.int64).copy()
        return lr.wiener_filter_frame(cdef_p, deblock_p, vtaps3, htaps3,
                                      stripe_size, bd, frame_w, frame_h)
