"""MSB-first bit writer + LEB128, for AV1 uncompressed headers / OBUs.

(Reference analog: src/header.rs uses the bitstream-io crate; this is the
cold path so plain python is fine.)
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit accumulator (AV1 f(n) descriptor)."""

    def __init__(self) -> None:
        self._bytes = bytearray()
        self._bitbuf = 0
        self._nbits = 0

    def f(self, value: int, bits: int) -> None:
        assert 0 <= value < (1 << bits), (value, bits)
        self._bitbuf = (self._bitbuf << bits) | value
        self._nbits += bits
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._bitbuf >> self._nbits) & 0xFF)
        self._bitbuf &= (1 << self._nbits) - 1

    def su(self, value: int, bits: int) -> None:
        """Signed: f(1+bits) with sign handling (spec su(1+bits))."""
        self.f(value & ((1 << (bits + 1)) - 1), bits + 1)

    def ns(self, value: int, n: int) -> None:
        """Non-symmetric unsigned encoding ns(n) (spec 4.10.7)."""
        w = n.bit_length()
        m = (1 << w) - n
        if value < m:
            self.f(value, w - 1)
        else:
            extra = value - m
            self.f(m + (extra >> 1), w - 1)
            self.f(extra & 1, 1)

    def byte_align(self) -> None:
        if self._nbits:
            self.f(0, 8 - self._nbits)

    def trailing_bits(self) -> None:
        """trailing_one_bit + zero padding to byte boundary."""
        self.f(1, 1)
        self.byte_align()

    @property
    def bit_len(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def bytes(self) -> bytes:
        assert self._nbits == 0, "call byte_align()/trailing_bits() first"
        return bytes(self._bytes)


def leb128(value: int) -> bytes:
    """Unsigned LEB128 (OBU size fields)."""
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)
