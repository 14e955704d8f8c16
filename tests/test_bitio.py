"""Bit writer / OBU framing tests."""

from rav1e_tpu.obu.bitio import BitWriter, leb128
from rav1e_tpu.obu.headers import (
    FrameParams,
    Sequence,
    temporal_delimiter,
    write_frame_obu,
    write_sequence_header_obu,
)


def test_bitwriter_msb_first():
    w = BitWriter()
    w.f(1, 1)
    w.f(0, 1)
    w.f(3, 2)
    w.f(0b1010, 4)
    assert w.bytes() == bytes([0b10111010])


def test_bitwriter_align():
    w = BitWriter()
    w.f(1, 3)
    w.byte_align()
    assert w.bytes() == bytes([0b00100000])


def test_trailing_bits():
    w = BitWriter()
    w.f(0, 3)
    w.trailing_bits()
    assert w.bytes() == bytes([0b00010000])


def test_leb128():
    assert leb128(0) == b"\x00"
    assert leb128(127) == b"\x7f"
    assert leb128(128) == b"\x80\x01"
    assert leb128(300) == bytes([0xAC, 0x02])


def test_su():
    w = BitWriter()
    w.su(-1, 6)  # 7-bit two's complement
    w.byte_align()
    assert w.bytes() == bytes([0b11111110])


def test_temporal_delimiter():
    td = temporal_delimiter()
    assert td == bytes([0x12, 0x00])


def test_sequence_header_parses_shape():
    seq = Sequence(width=64, height=64)
    data = write_sequence_header_obu(seq)
    # obu_header byte: type=1 (<<3), has_size=1 -> 0x0A
    assert data[0] == 0x0A
    assert data[1] == len(data) - 2  # leb128 size (small)


def test_frame_obu_builds():
    seq = Sequence(width=64, height=64)
    fp = FrameParams()
    payload = b"\x00" * 10
    data = write_frame_obu(seq, fp, payload)
    assert data[0] == 0x32  # OBU_FRAME<<3 | has_size
