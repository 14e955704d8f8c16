"""ctypes binding to the native MSAC encoder + tokenizer (native/msac.cc).

The python implementation in msac.py is the oracle; this mirror must be
byte-identical (tests/test_native_msac.py).  Auto-builds the shared object
on first import when missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libmsac.so"


def _load():
    srcs = ("msac.cc", "transforms.cc", "block_intra.cc")
    newest = max((_NATIVE_DIR / s).stat().st_mtime for s in srcs
                 if (_NATIVE_DIR / s).exists())
    if not _SO.exists() or _SO.stat().st_mtime < newest:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    lib.msac_new.restype = ctypes.c_void_p
    lib.msac_free.argtypes = [ctypes.c_void_p]
    lib.msac_reset.argtypes = [ctypes.c_void_p]
    lib.msac_size_upper.argtypes = [ctypes.c_void_p]
    lib.msac_size_upper.restype = ctypes.c_size_t
    lib.msac_done.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.msac_done.restype = ctypes.c_size_t
    # pointers passed as raw addresses (c_void_p): ndarray.ctypes.data is
    # far cheaper per call than data_as/POINTER casts in the hot loop
    vp = ctypes.c_void_p
    lib.msac_symbol.argtypes = [vp, vp, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.msac_bool.argtypes = [vp, ctypes.c_int, ctypes.c_uint]
    lib.msac_literal.argtypes = [vp, ctypes.c_uint, ctypes.c_int]
    lib.msac_encode_txb.argtypes = [
        vp, vp, ctypes.c_int, ctypes.c_int, vp,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        vp, vp, ctypes.c_int, vp, vp, vp, vp, vp,
        ctypes.c_int, ctypes.c_int, vp, ctypes.c_int,
    ]
    lib.msac_encode_txb.restype = ctypes.c_int
    lib.msac_tell.argtypes = [ctypes.c_void_p]
    lib.msac_tell.restype = ctypes.c_int
    return lib


_lib = _load()
_U16P = ctypes.POINTER(ctypes.c_uint16)
_I32P = ctypes.POINTER(ctypes.c_int32)


def _p16(arr: np.ndarray) -> int:
    assert arr.dtype == np.uint16 and arr.flags.c_contiguous
    return arr.ctypes.data


def _p32(arr: np.ndarray) -> int:
    assert arr.dtype == np.int32 and arr.flags.c_contiguous
    return arr.ctypes.data


class NativeMsacEncoder:
    """Drop-in for ec.msac.MsacEncoder, backed by native/msac.cc."""

    def __init__(self) -> None:
        self._e = _lib.msac_new()

    def __del__(self):
        try:
            _lib.msac_free(self._e)
        except Exception:
            pass

    def symbol(self, s: int, icdf: np.ndarray) -> None:
        _lib.msac_symbol(self._e, _p16(icdf), len(icdf) - 1, s, 0)

    def symbol_adapt(self, s: int, icdf: np.ndarray) -> None:
        _lib.msac_symbol(self._e, _p16(icdf), len(icdf) - 1, s, 1)

    def bool_(self, bit: int, f: int) -> None:
        _lib.msac_bool(self._e, bit, f)

    def literal(self, value: int, bits: int) -> None:
        _lib.msac_literal(self._e, value, bits)

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

    def tell_bits(self) -> int:
        return _lib.msac_tell(self._e)

    def reset(self) -> None:
        _lib.msac_reset(self._e)

    def done(self) -> bytes:
        cap = _lib.msac_size_upper(self._e)
        buf = ctypes.create_string_buffer(int(cap))
        n = _lib.msac_done(self._e, buf)
        return buf.raw[:n]

    def encode_txb(
        self,
        levels: np.ndarray,  # (h, w) int32, effective (<=32x32) region
        scan: np.ndarray,  # int32
        plane_type: int,
        tx_class: int,
        txb_skip_ctx: int,
        dc_sign_ctx: int,
        cdf,
        txs_ctx: int,
        adapt: bool = True,
        tx_type_row: np.ndarray | None = None,
        tx_type_sym: int = 0,
    ) -> tuple:
        h, w = levels.shape
        area = w * h
        eob_name = {16: "eob_pt_16", 32: "eob_pt_32", 64: "eob_pt_64",
                    128: "eob_pt_128", 256: "eob_pt_256", 512: "eob_pt_512",
                    1024: "eob_pt_1024"}[area]
        eob_tbl = getattr(cdf, eob_name)
        eob_multi_ctx = 0 if tx_class == 0 else 1
        eob_row = eob_tbl[plane_type][eob_multi_ctx]
        lv = np.ascontiguousarray(levels, dtype=np.int32)
        sc = np.ascontiguousarray(scan, dtype=np.int32)
        ret = _lib.msac_encode_txb(
            self._e, _p32(lv), w, h, _p32(sc),
            plane_type, tx_class, txb_skip_ctx, dc_sign_ctx,
            _p16(cdf.txb_skip[txs_ctx][txb_skip_ctx]),
            _p16(eob_row), len(eob_row) - 1,
            _p16(np.ascontiguousarray(cdf.eob_extra[txs_ctx][plane_type])),
            _p16(np.ascontiguousarray(cdf.coeff_base_eob[txs_ctx][plane_type])),
            _p16(np.ascontiguousarray(cdf.coeff_base[txs_ctx][plane_type])),
            _p16(np.ascontiguousarray(cdf.coeff_br[min(txs_ctx, 3)][plane_type])),
            _p16(cdf.dc_sign[plane_type][dc_sign_ctx]),
            1 if adapt else 0,
            tx_type_sym,
            _p16(tx_type_row) if tx_type_row is not None else None,
            (len(tx_type_row) - 1) if tx_type_row is not None else 0,
        )
        return (ret >> 8) & 0xFF, ret & 0xFF
