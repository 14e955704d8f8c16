"""IVF container muxing/demuxing (reference analog: src/bin/muxer/ivf.rs)."""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterator


def write_ivf_header(
    fh: BinaryIO, width: int, height: int, fps_num: int, fps_den: int, nframes: int = 0
) -> None:
    fh.write(b"DKIF")
    fh.write(struct.pack("<HH", 0, 32))
    fh.write(b"AV01")
    fh.write(struct.pack("<HH", width, height))
    fh.write(struct.pack("<II", fps_num, fps_den))
    fh.write(struct.pack("<II", nframes, 0))


def write_ivf_frame(fh: BinaryIO, pts: int, data: bytes) -> None:
    fh.write(struct.pack("<IQ", len(data), pts))
    fh.write(data)


def read_ivf(fh: BinaryIO) -> Iterator[tuple[int, bytes]]:
    header = fh.read(32)
    assert header[:4] == b"DKIF", "not an IVF file"
    while True:
        fr = fh.read(12)
        if len(fr) < 12:
            return
        size, pts = struct.unpack("<IQ", fr)
        yield pts, fh.read(size)
