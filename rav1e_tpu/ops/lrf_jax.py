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
