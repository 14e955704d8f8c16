"""Subexponential literal coding (spec 4.10.x ns/su/subexp) - used by loop
restoration parameters.  Encoder-side inverses of the decoder's
decode_subexp / decode_(un)signed_subexp_with_ref chain; all raw-bit based
(msac literals), no adaptive CDFs.

Reference analog: the write side of rav1e's lrf parameter coding
(src/lrf.rs + src/ec.rs write helpers).
"""

from __future__ import annotations


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1


def write_ns(enc, v: int, n: int) -> None:
    """Non-symmetric value v in [0, n) (spec ns(n))."""
    w = _floor_log2(n) + 1
    m = (1 << w) - n
    if v < m:
        if w - 1:
            enc.literal(v, w - 1)
        return
    x = v + m
    if w - 1:
        enc.literal(x >> 1, w - 1)
    enc.literal(x & 1, 1)


def read_ns(dec, n: int) -> int:
    w = _floor_log2(n) + 1
    m = (1 << w) - n
    v = dec.literal(w - 1) if w - 1 else 0
    if v < m:
        return v
    extra = dec.literal(1)
    return (v << 1) - m + extra


def write_subexp(enc, num_syms: int, k: int, v: int) -> None:
    i = 0
    mk = 0
    while True:
        b2 = k + i - 1 if i else k
        a = 1 << b2
        if num_syms <= mk + 3 * a:
            write_ns(enc, v - mk, num_syms - mk)
            return
        if v < mk + a:
            enc.literal(0, 1)
            enc.literal(v - mk, b2)
            return
        enc.literal(1, 1)
        i += 1
        mk += a


def read_subexp(dec, num_syms: int, k: int) -> int:
    i = 0
    mk = 0
    while True:
        b2 = k + i - 1 if i else k
        a = 1 << b2
        if num_syms <= mk + 3 * a:
            return read_ns(dec, num_syms - mk) + mk
        if dec.literal(1):
            i += 1
            mk += a
        else:
            return dec.literal(b2) + mk


def _recenter(r: int, target: int) -> int:
    """Forward of the spec's inverse_recenter (values >= ref code even)."""
    if target > 2 * r:
        return target
    if target >= r:
        return 2 * (target - r)
    return 2 * (r - target) - 1


def _inverse_recenter(r: int, v: int) -> int:
    """Spec 5.9.27 inverse_recenter: even offsets land at/above the ref.
    The branch below must be (r << 1) <= mx to mirror the decoder exactly:
    with the previous odd-above convention and a strict < branch the two
    bugs cancelled for every Wiener tap range (2r == mx there) but not for
    the SGRPROJ xqd[1] range (2r = 126 < mx = 128), found by probing
    libdav1d with known coded values."""
    if v > 2 * r:
        return v
    if v & 1:
        return r - ((v + 1) >> 1)
    return r + (v >> 1)


def write_unsigned_subexp_with_ref(enc, v: int, mx: int, k: int, r: int) -> None:
    if (r << 1) <= mx:
        write_subexp(enc, mx, k, _recenter(r, v))
    else:
        write_subexp(enc, mx, k, _recenter(mx - 1 - r, mx - 1 - v))


def read_unsigned_subexp_with_ref(dec, mx: int, k: int, r: int) -> int:
    v = read_subexp(dec, mx, k)
    if (r << 1) <= mx:
        return _inverse_recenter(r, v)
    return mx - 1 - _inverse_recenter(mx - 1 - r, v)


def write_signed_subexp_with_ref(enc, v: int, low: int, high: int, k: int, r: int) -> None:
    """v in [low, high); r the predictor (spec decode_signed_subexp_with_ref)."""
    write_unsigned_subexp_with_ref(enc, v - low, high - low, k, r - low)


def read_signed_subexp_with_ref(dec, low: int, high: int, k: int, r: int) -> int:
    return read_unsigned_subexp_with_ref(dec, high - low, k, r - low) + low
