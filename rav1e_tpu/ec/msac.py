"""AV1 MSAC (multi-symbol adaptive arithmetic coder), python reference.

This is the daala-lineage `od_ec` coder that AV1 standardized (AV1 spec
8.2; the reference encoder's equivalent lives in src/ec.rs — reimplemented
here from the published algorithm, not translated).  The python version is
the *correctness oracle*: the production encoder path uses the C++ mirror in
native/msac.cc; tests assert byte-identical output between the two, and
round-trip tests assert MsacDecoder recovers every symbol sequence.

Conventions (same as the spec / libaom / dav1d):
  - CDFs are 16-bit "inverse" cumulative tables: icdf[s] = 32768 - P(X <= s),
    strictly decreasing, icdf[nsymbs-1] == 0.  A table carries one extra
    trailing slot used as the adaptation counter.
  - EC_PROB_SHIFT = 6, EC_MIN_PROB = 4 (each symbol reserves a floor
    probability so zero-probability symbols stay decodable).
"""

from __future__ import annotations

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
WINDOW_SIZE = 64  # encoder low window bits (enough for any single carry run)
DEC_WINDOW = 64


def _ilog_nz(x: int) -> int:
    """Position of the highest set bit, 1-indexed (OD_ILOG_NZ)."""
    return x.bit_length()


class MsacEncoder:
    """Range encoder producing an AV1 tile-group compatible byte stream."""

    def __init__(self) -> None:
        self.low = 0
        self.rng = 0x8000
        self.cnt = -9
        self.precarry: list[int] = []

    # -- core --------------------------------------------------------------

    def _normalize(self, low: int, rng: int) -> None:
        d = 16 - _ilog_nz(rng)
        c = self.cnt
        s = c + d
        if s >= 9:
            c += 16
            m = (1 << c) - 1
            if s >= 16:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & ((1 << WINDOW_SIZE) - 1)
        self.rng = (rng << d) & 0xFFFF
        self.cnt = s

    def encode_q15(self, fl: int, fh: int, s: int, nsyms: int) -> None:
        """Encode symbol s where fl=icdf[s-1] (32768 if s==0), fh=icdf[s]."""
        low = self.low
        r = self.rng
        n = nsyms - 1
        assert 32768 <= r <= 65535
        assert fh <= fl <= 32768
        if fl < 32768:
            u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (
                n - (s - 1)
            )
            v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (
                n - s
            )
            low += r - u
            r = u - v
        else:
            r -= (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (
                n - s
            )
        self._normalize(low, r)

    # -- public ------------------------------------------------------------

    def symbol(self, s: int, icdf) -> None:
        """Encode s with the (nsymbs+1)-entry inverse CDF (no adaptation)."""
        nsyms = len(icdf) - 1
        fl = 32768 if s == 0 else int(icdf[s - 1])
        fh = int(icdf[s])
        self.encode_q15(fl, fh, s, nsyms)

    def symbol_adapt(self, s: int, icdf) -> None:
        """Encode s then adapt the CDF in place (icdf is a mutable array)."""
        self.symbol(s, icdf)
        update_cdf(icdf, s)

    def bool_(self, bit: int, f: int) -> None:
        """Encode a boolean; f = icdf[0] = 32768 - P(bit==0)*32768... i.e.
        the 2-symbol inverse-CDF entry, as stored in AV1 CDF tables."""
        if bit:
            self.encode_q15(f, 0, 1, 2)
        else:
            self.encode_q15(32768, f, 0, 2)

    def literal(self, value: int, bits: int) -> None:
        """Raw bits, equiprobable, MSB first (spec: L(n))."""
        for i in range(bits - 1, -1, -1):
            self.bool_((value >> i) & 1, 16384)

    def gather_bool(self, bit: int, cdf_row, pset, nsyms: int) -> None:
        """Bool with probability gathered from a cdf row (partition set
        bools at partial superblocks); no adaptation."""
        total = 0
        for p in pset:
            if p >= nsyms:
                continue
            hi = 32768 if p == 0 else int(cdf_row[p - 1])
            total += hi - int(cdf_row[p])
        self.bool_(bit, max(1, min(total, 32767)))

    def done(self) -> bytes:
        """Flush and carry-propagate; returns the final byte stream."""
        low = self.low
        c = self.cnt
        s = 10
        m = 0x3FFF
        e = ((low + m) & ~m) | (m + 1)
        s += c
        precarry = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                precarry.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry propagation (precarry entries may exceed 0xFF)
        out = bytearray(len(precarry))
        carry = 0
        for i in range(len(precarry) - 1, -1, -1):
            val = precarry[i] + carry
            out[i] = val & 0xFF
            carry = val >> 8
        assert carry == 0, "carry out of the first byte cannot happen"
        return bytes(out)

    def tell_bits(self) -> int:
        """Upper bound (in bits) of the stream size so far (rate tracking)."""
        # od_ec_enc_tell: buffered bytes + bits pending in low + termination
        return len(self.precarry) * 8 + self.cnt + 25  # conservative


class MsacDecoder:
    """Mirror decoder (spec 8.2.2-8.2.6) used for round-trip tests."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bptr = 0
        self.dif = (1 << (DEC_WINDOW - 1)) - 1
        self.rng = 0x8000
        self.cnt = -15
        self._refill()

    def _refill(self) -> None:
        s = DEC_WINDOW - 9 - (self.cnt + 15)
        while s >= 0 and self.bptr < len(self.data):
            self.dif ^= self.data[self.bptr] << s
            self.cnt += 8
            self.bptr += 1
            s -= 8
        if self.bptr >= len(self.data):
            self.cnt = 0x4000  # "lots of bits"

    def _normalize(self, dif: int, rng: int) -> None:
        d = 16 - _ilog_nz(rng)
        self.cnt -= d
        self.dif = (((dif + 1) << d) - 1) & ((1 << DEC_WINDOW) - 1)
        self.rng = (rng << d) & 0xFFFF
        if self.cnt < 0:
            self._refill()

    def symbol(self, icdf) -> int:
        nsyms = len(icdf) - 1
        dif = self.dif
        r = self.rng
        n = nsyms - 1
        c = dif >> (DEC_WINDOW - 16)
        v = r
        ret = -1
        while True:
            ret += 1
            u = v
            v = ((r >> 8) * (int(icdf[ret]) >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
            v += EC_MIN_PROB * (n - ret)
            if c >= v:
                break
        r = u - v
        dif -= v << (DEC_WINDOW - 16)
        self._normalize(dif, r)
        return ret

    def symbol_adapt(self, icdf) -> int:
        ret = self.symbol(icdf)
        update_cdf(icdf, ret)
        return ret

    def bool_(self, f: int) -> int:
        return self.symbol((f, 0, 0))

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.bool_(16384)
        return v


_NSYMBS2SPEED = (0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2)


def update_cdf(icdf, val: int) -> None:
    """In-place CDF adaptation after coding `val` (spec 8.2.6 update_cdf).

    icdf has nsymbs+1 entries; the last entry is the update counter.
    """
    nsymbs = len(icdf) - 1
    count = int(icdf[nsymbs])
    rate = 3 + (count > 15) + (count > 31) + _NSYMBS2SPEED[nsymbs]
    tmp = 32768
    for i in range(nsymbs - 1):
        if i == val:
            tmp = 0
        cur = int(icdf[i])
        if tmp < cur:
            icdf[i] = cur - ((cur - tmp) >> rate)
        else:
            icdf[i] = cur + ((tmp - cur) >> rate)
    icdf[nsymbs] = count + (1 if count < 32 else 0)
