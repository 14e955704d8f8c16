"""Frame / Plane containers (reference analog: v_frame crate Plane<T>,
src/frame/mod.rs).

Host-side storage is numpy (uint8/uint16); device work always operates on
padded, statically-shaped arrays so XLA sees fixed shapes.  Planes are
edge-padded by replication so prediction/ME kernels can over-read without
bounds logic (same trick the reference uses: padded plane alloc for
ME/MC overreach).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Plane:
    """2-D pixel storage, padded to a multiple of `align` with edge replication.

    data: (alloc_h, alloc_w) array; the valid window is [0:h, 0:w].
    """

    data: np.ndarray
    w: int
    h: int

    @classmethod
    def new(cls, w: int, h: int, bit_depth: int = 8, align: int = 64) -> "Plane":
        dtype = np.uint8 if bit_depth == 8 else np.uint16
        aw = (w + align - 1) // align * align
        ah = (h + align - 1) // align * align
        return cls(np.zeros((ah, aw), dtype=dtype), w, h)

    @classmethod
    def from_array(cls, arr: np.ndarray, align: int = 64) -> "Plane":
        h, w = arr.shape
        p = cls.new(w, h, 8 if arr.dtype == np.uint8 else 10, align)
        p.data[:h, :w] = arr
        p.pad()
        return p

    def pad(self) -> None:
        """Replicate edge pixels into the padding region."""
        d, w, h = self.data, self.w, self.h
        d[:h, w:] = d[:h, w - 1 : w]
        d[h:, :] = d[h - 1 : h, :]

    def window(self) -> np.ndarray:
        return self.data[: self.h, : self.w]


@dataclass
class Frame:
    """Planar frame; planes[0]=Y, then U, V (4:2:0 by default)."""

    planes: list
    bit_depth: int = 8
    subsampling: tuple = (1, 1)

    @classmethod
    def new(cls, w: int, h: int, bit_depth: int = 8, ss: tuple = (1, 1)) -> "Frame":
        sx, sy = ss
        cw = (w + sx) >> sx
        ch = (h + sy) >> sy
        return cls(
            [
                Plane.new(w, h, bit_depth),
                Plane.new(cw, ch, bit_depth),
                Plane.new(cw, ch, bit_depth),
            ],
            bit_depth,
            ss,
        )

    @classmethod
    def from_planes(cls, y, u, v, bit_depth: int = 8, ss: tuple = (1, 1)) -> "Frame":
        return cls([Plane.from_array(y), Plane.from_array(u), Plane.from_array(v)], bit_depth, ss)

    @property
    def width(self) -> int:
        return self.planes[0].w

    @property
    def height(self) -> int:
        return self.planes[0].h


def read_y4m(fh):
    """Minimal Y4M reader (reference analog: src/bin/decoder/y4m.rs).

    Yields (header_dict, frame_generator).
    """
    header = fh.readline().decode()
    assert header.startswith("YUV4MPEG2")
    params = {}
    for tok in header.split()[1:]:
        params[tok[0]] = tok[1:]
    w = int(params["W"])
    h = int(params["H"])
    num, den = (int(x) for x in params.get("F", "30:1").split(":"))
    cs = params.get("C", "420jpeg")
    if cs.startswith("420"):
        ss, depth = (1, 1), 8
        if "p10" in cs:
            depth = 10
        elif "p12" in cs:
            depth = 12
    elif cs.startswith("422"):
        ss = (1, 0)
        depth = 10 if "p10" in cs else (12 if "p12" in cs else 8)
    elif cs.startswith("444"):
        ss = (0, 0)
        depth = 10 if "p10" in cs else (12 if "p12" in cs else 8)
    else:
        raise ValueError(f"unsupported y4m colorspace {cs}")

    def frames():
        dtype = np.uint8 if depth == 8 else np.dtype("<u2")
        bps = 1 if depth == 8 else 2
        cw = (w + ss[0]) >> ss[0]
        ch = (h + ss[1]) >> ss[1]
        fsize = (w * h + 2 * cw * ch) * bps
        while True:
            line = fh.readline()
            if not line:
                return
            assert line.startswith(b"FRAME")
            raw = fh.read(fsize)
            if len(raw) < fsize:
                return
            y = np.frombuffer(raw, dtype, w * h).reshape(h, w)
            u = np.frombuffer(raw, dtype, cw * ch, w * h * bps).reshape(ch, cw)
            v = np.frombuffer(raw, dtype, cw * ch, (w * h + cw * ch) * bps).reshape(ch, cw)
            yield Frame.from_planes(y, u, v, depth, ss)

    meta = {"width": w, "height": h, "fps": (num, den), "bit_depth": depth, "ss": ss}
    return meta, frames()


def write_y4m_header(fh, w, h, fps=(30, 1), depth=8, ss=(1, 1)):
    cs = {(1, 1): "420jpeg", (1, 0): "422", (0, 0): "444"}[ss]
    if depth > 8:
        cs = {(1, 1): "420", (1, 0): "422", (0, 0): "444"}[ss] + f"p{depth}"
    fh.write(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A0:0 C{cs}\n".encode())


def write_y4m_frame(fh, frame: Frame):
    fh.write(b"FRAME\n")
    for p in frame.planes:
        fh.write(p.window().astype("<u2" if frame.bit_depth > 8 else np.uint8).tobytes())
