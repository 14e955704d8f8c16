"""libdav1d ctypes harness: decode our OBU streams and return planes.

This is the conformance oracle (SURVEY.md section 4.3): every encoded
stream must decode through dav1d with output identical to the encoder's
own reconstruction.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = "/usr/lib/x86_64-linux-gnu/libdav1d.so.6"

EAGAIN = -11


class Dav1dDecoder:
    def __init__(self) -> None:
        self.lib = ctypes.CDLL(_LIB)
        self.lib.dav1d_version.restype = ctypes.c_char_p
        self.version = self.lib.dav1d_version().decode()
        self.settings = ctypes.create_string_buffer(512)
        self.lib.dav1d_default_settings(self.settings)
        self.ctx = ctypes.c_void_p()
        rc = self.lib.dav1d_open(ctypes.byref(self.ctx), self.settings)
        if rc != 0:
            raise RuntimeError(f"dav1d_open failed: {rc}")

    def close(self) -> None:
        if self.ctx:
            self.lib.dav1d_close(ctypes.byref(self.ctx))
            self.ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _send(self, packet: bytes) -> int:
        data = ctypes.create_string_buffer(256)  # Dav1dData
        self.lib.dav1d_data_create.restype = ctypes.POINTER(ctypes.c_uint8)
        buf = self.lib.dav1d_data_create(data, ctypes.c_size_t(len(packet)))
        if not buf:
            raise RuntimeError("dav1d_data_create failed")
        ctypes.memmove(buf, packet, len(packet))
        rc = self.lib.dav1d_send_data(self.ctx, data)
        if rc != 0 and rc != EAGAIN:
            self.lib.dav1d_data_unref(data)
            raise RuntimeError(f"dav1d_send_data: {rc}")
        return rc

    def _get_picture(self):
        pic = ctypes.create_string_buffer(512)  # Dav1dPicture
        rc = self.lib.dav1d_get_picture(self.ctx, pic)
        if rc == EAGAIN:
            return None
        if rc != 0:
            raise RuntimeError(f"dav1d_get_picture: {rc}")
        return pic

    def _extract(self, pic):
        base = ctypes.addressof(pic)
        ptrs = (ctypes.c_void_p * 3).from_address(base + 16)
        strides = (ctypes.c_longlong * 2).from_address(base + 40)
        w, h = (ctypes.c_int * 2).from_address(base + 56)[:]
        layout = ctypes.c_int.from_address(base + 64).value
        bpc = ctypes.c_int.from_address(base + 68).value
        assert 0 < w <= 16384 and 0 < h <= 16384, (w, h)
        itemsize = 1 if bpc == 8 else 2
        dtype = np.uint8 if bpc == 8 else np.uint16

        def plane(ptr, stride, pw, ph):
            if not ptr:
                return None
            n = stride * ph
            raw = (ctypes.c_uint8 * n).from_address(ptr)
            arr = np.frombuffer(raw, dtype=np.uint8, count=n).reshape(ph, stride)
            arr = arr.view(dtype)[:, : pw]
            return arr.copy()

        # layout: 0 I400, 1 I420, 2 I422, 3 I444
        ss_x = 1 if layout in (1, 2) else 0
        ss_y = 1 if layout == 1 else 0
        cw = (w + ss_x) >> ss_x
        ch = (h + ss_y) >> ss_y
        y = plane(ptrs[0], strides[0], w, h)
        u = plane(ptrs[1], strides[1], cw, ch)
        v = plane(ptrs[2], strides[1], cw, ch)
        self.lib.dav1d_picture_unref(pic)
        return [y, u, v], (w, h, layout, bpc)

    def decode_packet(self, packet: bytes):
        """Decode one temporal unit; returns ([Y,U,V] ndarrays, meta)."""
        self._send(packet)
        for _ in range(8):
            pic = self._get_picture()
            if pic is not None:
                return self._extract(pic)
        raise RuntimeError("dav1d produced no picture for packet")


def decode_stream(packets) -> list:
    """Decode a sequence of temporal units; returns the DISPLAYED pictures
    in output order (no-show frames yield none until their
    show_existing_frame unit arrives)."""
    d = Dav1dDecoder()
    out = []
    try:
        for p in packets:
            d._send(p)
            while True:
                pic = d._get_picture()
                if pic is None:
                    break
                out.append(d._extract(pic)[0])
    finally:
        d.close()
    return out
