"""ctypes binding to the native per-block intra coder (native/block_intra.cc).

One call encodes a whole leaf block — edge build, prediction, fused
fdct+quant, DCT-vs-ADST RD, symbol coding, reconstruction and neighbor
context updates — sharing the live MSAC handle and the python encoder's
numpy arrays.  Byte-identical to IntraFrameEncoder's python block path
(tests/test_native_block.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from rav1e_tpu.ec.native import _lib, NativeMsacEncoder
from rav1e_tpu.ops import intra_np as ip
from rav1e_tpu.ops import transforms_np as tf

# registry slot order — must match native/block_intra.cc enum
_REG_CDF_ATTRS = (
    "kf_y_mode", "angle_delta", "uv_mode", "skip", "txb_skip",
    "eob_pt_16", "eob_pt_32", "eob_pt_64", "eob_pt_128", "eob_pt_256",
    "eob_pt_512", "eob_pt_1024",
    "eob_extra", "coeff_base_eob", "coeff_base", "coeff_br", "dc_sign",
    "intra_tx_type_set2", "cfl_sign", "cfl_alpha", "segment_id",
    # inter-frame tables (single-reference wavefront walk)
    "intra_inter", "y_mode", "single_ref", "newmv", "zeromv", "refmv",
    "drl", "mv_joint", "mv_sign", "mv_class", "mv_class0", "mv_class0_fp",
    "mv_bits", "mv_fp", "inter_tx_type_set3",
)

_SM_I32 = np.ascontiguousarray(ip._SM_W, np.int32)
_DR_I32 = np.ascontiguousarray(ip._DR, np.int32)

# modes the native predictor implements (the encoder's full candidate set)
NATIVE_MODES = frozenset((
    ip.DC_PRED, ip.V_PRED, ip.H_PRED,
    ip.D45_PRED, ip.D135_PRED, ip.D113_PRED, ip.D157_PRED,
    ip.D203_PRED, ip.D67_PRED,
    ip.SMOOTH_PRED, ip.SMOOTH_V_PRED, ip.SMOOTH_H_PRED, ip.PAETH_PRED,
))

_vp = ctypes.c_void_p
_ci = ctypes.c_int
_configured = False


def _configure():
    global _configured
    if _configured:
        return
    _lib.encode_intra_block.argtypes = [
        _vp, _vp,                      # enc, registry
        _vp, _vp, _vp, _vp, _vp, _vp,  # src y/u/v, rec y/u/v
        _ci, _ci,                      # strides
        _ci, _ci, _ci, _ci,            # x y bw bh
        _ci, _ci,                      # have above/left
        _ci, _ci, _ci, _ci,            # max_x/y luma, chroma
        _ci, _ci, _ci, _ci,            # y_mode, dc_q, ac_q, bd
        _ci, _ci, ctypes.c_double,     # tx_search, q_nonzero, lam
        _vp, _vp, ctypes.c_double,     # luma DCT mats + scale
        _vp,                           # packed luma AA/AD/DA/IDTX mats
        _vp,                           # packed chroma DCT/AA/AD/DA mats
        _ci,                           # uv_search
        _vp, _vp,                      # scans
        _vp, _vp, _vp, _vp,            # above/left mode/skip
        _vp,                           # pctx pointer array
        _ci, _ci, _ci, _ci,            # mi_cols, mi_rows, adapt, recon_only
        _vp,                           # block cache (pass-A store) or NULL
        _ci,                           # cfl search enabled
        _vp, _ci,                      # mi_coded map + stride
        _ci, _ci, _ci, _ci, _ci,       # tile x0 y0 x1 y1, fine_dir
        _ci, _ci, _ci,                 # seg symbol value / ctx / nsyms
    ]
    _lib.encode_intra_block.restype = ctypes.c_int
    _lib.block_cache_new.restype = _vp
    _lib.block_cache_free.argtypes = [_vp]
    _lib.block_cache_reset.argtypes = [_vp]
    _lib.block_cache_rewind.argtypes = [_vp]
    _lib.block_cache_push_raw.argtypes = [_vp, _vp, ctypes.c_long]
    _lib.cached_block_peek.argtypes = [_vp, _ci, _ci, _ci, _ci]
    _lib.cached_block_peek.restype = ctypes.c_int
    _lib.encode_cached_block.argtypes = [
        _vp, _vp, _vp, _ci, _ci, _ci, _ci,
        _vp, _vp, _vp, _vp, _vp, _vp, _vp, _ci, _ci, _ci, _ci,
        _ci, _ci,                      # cdef_bits, cdef_idx
    ]
    _lib.encode_cached_block.restype = ctypes.c_int
    _lib.encode_sb_cached.argtypes = [
        _vp, _vp, _vp,                 # cache, enc, registry
        _ci, _ci, _ci, _ci, _ci, _ci,  # sb_x, sb_y, mi_cols/rows, adapt, q
        _ci, _ci, _ci, _ci,            # tile x0 y0 x1 y1
        _vp,                           # scans pointer table
        _vp, _vp, _vp, _vp, _vp, _vp,  # above/left part/mode/skip
        _vp, _vp,                      # pctx, partition cdf
        _vp, _ci, _ci,                 # split map, stride, rdo_partition
        _vp, _ci, _ci,                 # split16 map, stride, rdo_split8
        _vp, _ci,                      # none64 map, stride
        _ci, _ci,                      # cdef_bits, cdef_idx
    ]
    _lib.encode_sb_cached.restype = ctypes.c_int
    _lib.set_quant_bias.argtypes = [_ci]
    from rav1e_tpu.ops.quantize_np import QUANT_BIAS_NUM

    _lib.set_quant_bias(QUANT_BIAS_NUM)
    _lib.wavefront_cache_push_run.argtypes = [
        _vp, _vp,                      # cache, packed int16
        _vp, _vp,                      # avail, avail8
        _vp, _vp, _vp, _vp, _ci, _ci, _ci, _ci,  # steps/lanes/rows/cols, nsb, B, split8, nfields
        _vp, _vp, _vp, _vp, _vp, _ci, _ci,  # db maps, mi_cols_a, mi_rows_a
        _vp, _ci, _ci,                 # mi_coded, cols, rows
        _vp,                           # stat_out int64[27]
    ]
    _lib.encode_inter_sb_cached.argtypes = [
        _vp, _vp, _vp,                 # cache, enc, registry
        _ci, _ci, _ci, _ci, _ci, _ci,  # sb_x, sb_y, mi_cols, mi_rows, adapt, q_nonzero
        _ci, _ci, _ci, _ci,            # tile mi bounds r0 c0 r1 c1
        _vp,                           # scans table
        _vp, _vp, _vp, _vp,            # above/left part, above/left skip
        _vp, _vp,                      # pctx, partition cdf
        _vp, _ci, _ci,                 # split map, stride, rdo_partition
        _vp, _ci,                      # none64 map, stride
        _vp, _vp, _vp, _vp, _vp,       # grid: ref, mv, is_newmv, bw4, bh4
        _ci, _ci,                      # cdef_bits, cdef_idx
    ]
    _lib.encode_inter_sb_cached.restype = ctypes.c_int
    _configured = True


_MAT_CACHE: dict = {}
_PACK_CACHE: dict = {}

# DTT4_IDTX set symbol -> tx type (encode_intra_block returns the symbol)
_TT_FROM_SYM = {0: tf.IDTX, 1: tf.DCT_DCT, 2: tf.ADST_ADST,
                3: tf.ADST_DCT, 4: tf.DCT_ADST}


def _mats(tx_type: int, w: int, h: int):
    key = (tx_type, w, h)
    m = _MAT_CACHE.get(key)
    if m is None:
        Fv, FhT, scale = tf._fwd_mats(tx_type, w, h)
        m = (np.ascontiguousarray(Fv, np.float64),
             np.ascontiguousarray(FhT, np.float64), float(scale))
        _MAT_CACHE[key] = m
    return m


def _mats_pack(types: tuple, w: int, h: int) -> np.ndarray:
    """Contiguous [Fv (h*h), FhT (w*w), scale] per type — the packed
    matrix blobs encode_intra_block indexes for its tx/uv RD races."""
    key = (types, w, h)
    p = _PACK_CACHE.get(key)
    if p is None:
        parts = []
        for tt in types:
            Fv, FhT, scale = _mats(tt, w, h)
            parts += [Fv.ravel(), FhT.ravel(), np.asarray([scale])]
        p = np.ascontiguousarray(np.concatenate(parts), np.float64)
        _PACK_CACHE[key] = p
    return p


class NativeBlockCoder:
    """Per-frame binding: resolves the frame encoder's cdf/plane/context
    arrays into raw pointers once per (frame, tile) and drives
    encode_intra_block."""

    def __init__(self, fe):
        _configure()
        self.fe = fe
        self._cdf_obj = None
        self._reg = None
        self._keep = None
        self._scan_cache: dict = {}
        # pctx pointer array: per plane above_cul/left_cul/above_dc/left_dc
        ptrs = []
        for ctx in fe.pctx:
            for a in (ctx.above_cul, ctx.left_cul, ctx.above_dc, ctx.left_dc):
                assert a.dtype == np.int32 and a.flags.c_contiguous
                ptrs.append(a.ctypes.data)
        self._pctx = np.array(ptrs, dtype=np.uint64)
        self._max_x_y = fe.mi_cols * 4 - 1
        self._max_y_y = fe.mi_rows * 4 - 1
        self._max_x_c = (fe.mi_cols * 4 >> 1) - 1
        self._max_y_c = (fe.mi_rows * 4 >> 1) - 1
        self._cache = None

    def _refresh_registry(self) -> None:
        cdf = self.fe.cdf
        keep = []
        ptrs = []
        for name in _REG_CDF_ATTRS:
            a = getattr(cdf, name)
            assert a.dtype == np.uint16 and a.flags.c_contiguous
            keep.append(a)
            ptrs.append(a.ctypes.data)
        ptrs.append(_SM_I32.ctypes.data)
        ptrs.append(_DR_I32.ctypes.data)
        self._reg = np.array(ptrs, dtype=np.uint64)
        self._keep = keep
        self._cdf_obj = cdf

    def _scan(self, w: int, h: int) -> np.ndarray:
        s = self._scan_cache.get((w, h))
        if s is None:
            from rav1e_tpu.models.intra_frame import scan_for

            s = np.ascontiguousarray(scan_for(w, h), np.int32)
            self._scan_cache[(w, h)] = s
        return s

    def cache_start(self) -> None:
        """Arm the pass-A store: recon_only blocks append decisions+levels."""
        if self._cache is None:
            self._cache = _lib.block_cache_new()
        _lib.block_cache_reset(self._cache)

    def cache_rewind(self) -> None:
        _lib.block_cache_rewind(self._cache)

    def cache_push_raw(self, arr) -> None:
        """Append pre-serialized records (device wavefront output) to the
        pass-A cache.  arr: contiguous int32 numpy array in the cache's
        native layout (15-int header + levels when not skipped)."""
        import numpy as _np

        assert arr.dtype == _np.int32 and arr.flags.c_contiguous
        _lib.block_cache_push_raw(self._cache, arr.ctypes.data, len(arr))

    def cache_push_wavefront(self, wf, sbs) -> np.ndarray:
        """Serialize a run of device superblocks (list of (r, c), decode
        order) into the pass-A cache in one native call; fills the
        frame's deblock-info maps and mi_coded, and returns the int64[20]
        stats vector (see native wavefront_cache_push_run)."""
        fe = self.fe
        g = wf.geom
        n = len(sbs)
        rcs = np.asarray(sbs, np.int32).reshape(n, 2)
        steps = np.ascontiguousarray(g.sb_step[rcs[:, 0], rcs[:, 1]], np.int32)
        lanes = np.ascontiguousarray(g.sb_lane[rcs[:, 0], rcs[:, 1]], np.int32)
        rr = np.ascontiguousarray(rcs[:, 0])
        cc = np.ascontiguousarray(rcs[:, 1])
        info = fe.db_info
        stats = np.zeros(27, np.int64)
        assert wf.packed.dtype == np.int16 and wf.packed.flags.c_contiguous
        _lib.wavefront_cache_push_run(
            self._cache, wf.packed.ctypes.data,
            g.avail.ctypes.data, g.avail8.ctypes.data,
            steps.ctypes.data, lanes.ctypes.data,
            rr.ctypes.data, cc.ctypes.data,
            n, g.width,
            1 if wf.split16 is not None and getattr(fe, "rdo_split8", False)
            else 0,
            11 if getattr(wf, "has_mv", False) else 7,
            info.txw.ctypes.data, info.txh.ctypes.data,
            info.bx.ctypes.data, info.by.ctypes.data,
            info.skip.ctypes.data, info.txw.shape[1], info.txw.shape[0],
            fe.mi_coded.ctypes.data, fe.mi_coded.shape[1],
            fe.mi_coded.shape[0], stats.ctypes.data)
        return stats

    def cache_peek(self, x: int, y: int, bw: int, bh: int) -> bool:
        return bool(self._cache) and bool(
            _lib.cached_block_peek(self._cache, x, y, bw, bh))

    def _scan_table(self):
        """16 scan pointers indexed (log2(w)-2)*4 + (log2(h)-2)."""
        t = getattr(self, "_scans16", None)
        if t is None:
            from rav1e_tpu.models.intra_frame import scan_for

            keep = []
            ptrs = []
            for lw in range(4):
                for lh in range(4):
                    if abs(lw - lh) > 1:  # >2:1 tx ratios don't exist
                        ptrs.append(0)
                        continue
                    s = np.ascontiguousarray(scan_for(4 << lw, 4 << lh),
                                             np.int32)
                    keep.append(s)
                    ptrs.append(s.ctypes.data)
            t = np.array(ptrs, dtype=np.uint64)
            self._scans16 = t
            self._scans16_keep = keep
        return t

    def replay_sb(self, sb_x: int, sb_y: int,
                  cdef_bits: int = 0, cdef_idx: int = -1) -> None:
        """Replay a whole superblock (partition symbols + cached blocks)
        through the C++ walk; raises on cache desync.  With cdef_bits > 0
        the cdef_idx literal is written at the SB's first non-skip block
        (spec read_cdef)."""
        fe = self.fe
        if fe.cdf is not self._cdf_obj:
            self._refresh_registry()
        def _u8(m):
            if m.dtype != np.uint8:
                m = m.view(np.uint8) if m.dtype == np.bool_ \
                    else m.astype(np.uint8)
            assert m.flags.c_contiguous
            return m
        split = _u8(fe._rd_maps["split32"])
        none64 = fe._rd_maps.get("none64")
        if none64 is not None:
            none64 = _u8(none64)
            self._none64_keep = none64
            n64_ptr, n64_stride = none64.ctypes.data, none64.shape[1]
        else:
            n64_ptr, n64_stride = None, 0
        split16 = fe._rd_maps.get("split16")
        if split16 is not None:
            split16 = _u8(split16)
            self._split16_keep = split16
            s16_ptr, s16_stride = split16.ctypes.data, split16.shape[1]
        else:
            s16_ptr, s16_stride = None, 0
        part = fe.cdf.partition
        assert part.dtype == np.uint16 and part.flags.c_contiguous
        if getattr(fe, "wf_inter", False):
            grid = fe.grid
            ret = _lib.encode_inter_sb_cached(
                self._cache, fe.enc._e, self._reg.ctypes.data,
                sb_x, sb_y, fe.mi_cols, fe.mi_rows,
                1 if fe.adapt else 0, 1 if fe.q > 0 else 0,
                fe.ty0 // 4, fe.tx0 // 4,
                min(fe.ty1, fe.mi_rows * 4) // 4,
                min(fe.tx1, fe.mi_cols * 4) // 4,
                self._scan_table().ctypes.data,
                fe.above_part.ctypes.data, fe.left_part.ctypes.data,
                fe.above_skip.ctypes.data, fe.left_skip.ctypes.data,
                self._pctx.ctypes.data, part.ctypes.data,
                split.ctypes.data, split.shape[1],
                1 if fe.rdo_partition else 0,
                n64_ptr, n64_stride,
                grid.ref.ctypes.data, grid.mv.ctypes.data,
                grid.is_newmv.ctypes.data, grid.bw4.ctypes.data,
                grid.bh4.ctypes.data,
                cdef_bits, cdef_idx,
            )
            if ret < 0:
                raise RuntimeError(
                    "inter block cache desync in SB (%d,%d)" % (sb_x, sb_y))
            return
        ret = _lib.encode_sb_cached(
            self._cache, fe.enc._e, self._reg.ctypes.data,
            sb_x, sb_y, fe.mi_cols, fe.mi_rows,
            1 if fe.adapt else 0, 1 if fe.q > 0 else 0,
            fe.tx0, fe.ty0, fe.tx1, fe.ty1,
            self._scan_table().ctypes.data,
            fe.above_part.ctypes.data, fe.left_part.ctypes.data,
            fe.above_mode.ctypes.data, fe.left_mode.ctypes.data,
            fe.above_skip.ctypes.data, fe.left_skip.ctypes.data,
            self._pctx.ctypes.data, part.ctypes.data,
            split.ctypes.data, split.shape[1],
            1 if fe.rdo_partition else 0,
            s16_ptr, s16_stride,
            1 if (getattr(fe, "rdo_split8", False) and s16_ptr) else 0,
            n64_ptr, n64_stride,
            cdef_bits, cdef_idx,
        )
        if ret < 0:
            raise RuntimeError(
                "block cache desync in SB (%d,%d)" % (sb_x, sb_y))

    def replay_block(self, x: int, y: int, bw: int, bh: int,
                     cdef_bits: int = 0, cdef_idx: int = -1) -> tuple:
        """Code the next cached block's symbols (pass B).  cdef_idx >= 0
        writes the cdef_idx literal if this block is non-skip."""
        fe = self.fe
        if fe.cdf is not self._cdf_obj:
            self._refresh_registry()
        ret = _lib.encode_cached_block(
            self._cache, fe.enc._e, self._reg.ctypes.data,
            x, y, bw, bh,
            self._scan(bw, bh).ctypes.data,
            self._scan(bw >> 1, bh >> 1).ctypes.data,
            fe.above_mode.ctypes.data, fe.left_mode.ctypes.data,
            fe.above_skip.ctypes.data, fe.left_skip.ctypes.data,
            self._pctx.ctypes.data,
            fe.mi_cols, fe.mi_rows, 1 if fe.adapt else 0,
            1 if fe.q > 0 else 0,
            cdef_bits, cdef_idx,
        )
        if ret < 0:
            raise RuntimeError("block cache desync at (%d,%d,%dx%d)" % (x, y, bw, bh))
        return bool(ret & 1), _TT_FROM_SYM[ret >> 1]

    def __del__(self):
        try:
            if self._cache:
                _lib.block_cache_free(self._cache)
        except Exception:
            pass

    def encode_block(self, x: int, y: int, bw: int, bh: int, y_mode: int,
                     have_above: bool, have_left: bool,
                     recon_only: bool = False,
                     seg: tuple = (0, 0, 0)) -> tuple:
        """Encode one leaf block; returns (skip, tx_type)."""
        fe = self.fe
        if fe.cdf is not self._cdf_obj:
            self._refresh_registry()
        fy = _mats(tf.DCT_DCT, bw, bh)
        # extended luma mats at the block dims (only read when <= 16)
        ye = _mats_pack((tf.ADST_ADST, tf.ADST_DCT, tf.DCT_ADST, tf.IDTX),
                        bw, bh) if max(bw, bh) <= 16 else \
            _mats_pack((tf.DCT_DCT,), bw, bh)
        mc = _mats_pack((tf.DCT_DCT, tf.ADST_ADST, tf.ADST_DCT, tf.DCT_ADST),
                        bw >> 1, bh >> 1)
        ret = _lib.encode_intra_block(
            fe.enc._e, self._reg.ctypes.data,
            fe.src[0].ctypes.data, fe.src[1].ctypes.data, fe.src[2].ctypes.data,
            fe.rec[0].ctypes.data, fe.rec[1].ctypes.data, fe.rec[2].ctypes.data,
            fe.src[0].shape[1], fe.src[1].shape[1],
            x, y, bw, bh,
            1 if have_above else 0, 1 if have_left else 0,
            self._max_x_y, self._max_y_y, self._max_x_c, self._max_y_c,
            y_mode, fe.dc_q, fe.ac_q, fe.bd,
            1 if fe.tx_type_search else 0, 1 if fe.q > 0 else 0,
            fe._lam_for(x, y),
            fy[0].ctypes.data, fy[1].ctypes.data, fy[2],
            ye.ctypes.data, mc.ctypes.data,
            1 if getattr(fe, "uv_search", False) else 0,
            self._scan(bw, bh).ctypes.data,
            self._scan(bw >> 1, bh >> 1).ctypes.data,
            fe.above_mode.ctypes.data, fe.left_mode.ctypes.data,
            fe.above_skip.ctypes.data, fe.left_skip.ctypes.data,
            self._pctx.ctypes.data,
            fe.mi_cols, fe.mi_rows, 1 if fe.adapt else 0,
            1 if recon_only else 0,
            self._cache if recon_only else None,
            1 if fe.cfl_search else 0,
            fe.mi_coded.ctypes.data, fe.mi_coded.shape[1],
            fe.tx0, fe.ty0, fe.tx1, fe.ty1,
            1 if fe.fine_dir else 0,
            seg[0], seg[1], seg[2],
        )
        skip = bool(ret & 1)
        return skip, _TT_FROM_SYM[ret >> 1]


def block_coder_for(fe):
    """NativeBlockCoder for the frame encoder, or None if ineligible."""
    if not getattr(fe, "use_native", False):
        return None
    if not hasattr(_lib, "encode_intra_block"):
        return None
    return NativeBlockCoder(fe)
