"""Key-frame (intra) encoder: partition tree, mode info, residual coding,
in-loop reconstruction.

Reference analog: src/encoder.rs encode_tile / write_block +
src/context/block_unit.rs, rebuilt around this framework's split:
device-batchable analysis (mode costs, transforms) feeds a host entropy
pass that mirrors the decoder's context state machine exactly.

This first slice: fixed partition to 32x32, per-block intra mode chosen by
SAD over {DC, V, H, SMOOTH, PAETH}, 4:2:0, single tile, CDF adaptation
optional (frame header signals disable_cdf_update accordingly).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rav1e_tpu.ec.msac import MsacEncoder
from rav1e_tpu.entropy.cdf import CdfContext
from rav1e_tpu.entropy import coeffs as cf
from rav1e_tpu.ops import intra_np as ip
from rav1e_tpu.ops import quantize_np as qz
from rav1e_tpu.ops import transforms_np as tf

_TBL = np.load(__file__.rsplit("/", 2)[0] + "/ops/av1_tables.npz")

# partition context bytes (above, left) per block size, from the AV1 spec
# (verified against the libaom binary's partition_context_lookup)
_PART_CTX = {4: (31, 31), 8: (30, 30), 16: (28, 28), 32: (24, 24), 64: (16, 16)}

PARTITION_NONE = 0
PARTITION_SPLIT = 3

# Intra_Mode_Context (spec): mode -> neighbor context bucket
INTRA_MODE_CTX = (0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0)

_SKIP_CONTEXTS = ((1, 2, 2, 2, 3), (1, 4, 4, 4, 5), (1, 4, 4, 4, 5),
                  (1, 4, 4, 4, 5), (1, 4, 4, 4, 6))


def scan_for(w: int, h: int, tx_class: int = cf.TX_CLASS_2D) -> np.ndarray:
    kind = {cf.TX_CLASS_2D: "diag", cf.TX_CLASS_HORIZ: "col", cf.TX_CLASS_VERT: "row"}[tx_class]
    return _TBL[f"scan_{kind}_{w}x{h}"]


@dataclass
class PlaneCtx:
    """Per-plane above/left coefficient contexts, in 4-sample units."""

    above_cul: np.ndarray
    left_cul: np.ndarray
    above_dc: np.ndarray
    left_dc: np.ndarray

    @classmethod
    def new(cls, w4: int, h4: int) -> "PlaneCtx":
        return cls(
            np.zeros(w4, np.int32), np.zeros(h4, np.int32),
            np.zeros(w4, np.int32), np.zeros(h4, np.int32),
        )


class IntraFrameEncoder:
    """Encodes one key frame; exposes recon planes for conformance checks."""

    def __init__(self, width: int, height: int, q_idx: int, bit_depth: int = 8,
                 adapt_cdf: bool = False, speed: int = 6):
        assert width % 8 == 0 and height % 8 == 0, "partial blocks: next slice"
        self.w = width
        self.h = height
        self.q = q_idx
        self.bd = bit_depth
        self.adapt = adapt_cdf
        self.speed = speed
        self.mi_cols = width // 4
        self.mi_rows = height // 4
        self.dc_q = qz.dc_q(q_idx, 0, bit_depth)
        self.ac_q = qz.ac_q(q_idx, 0, bit_depth)

    def encode(self, planes: list) -> tuple:
        """planes: [Y, U, V] uint8/16 arrays.  Returns (tile_bytes, recon)."""
        w, h, bd = self.w, self.h, self.bd
        self.src = [p.astype(np.int32) for p in planes]
        # recon with 1-px border used by edge building (left/top only)
        self.rec = [np.zeros_like(s) for s in self.src]
        self.cdf = CdfContext(self.q)
        self.enc = MsacEncoder()

        # neighbor context state
        self.above_part = np.zeros(self.mi_cols, np.int32)
        self.left_part = np.zeros(self.mi_rows, np.int32)
        self.above_mode = np.zeros(self.mi_cols, np.int32)  # DC default
        self.left_mode = np.zeros(self.mi_rows, np.int32)
        self.above_skip = np.zeros(self.mi_cols, np.int32)
        self.left_skip = np.zeros(self.mi_rows, np.int32)
        self.pctx = [
            PlaneCtx.new(self.mi_cols, self.mi_rows),
            PlaneCtx.new((self.mi_cols + 1) >> 1, (self.mi_rows + 1) >> 1),
            PlaneCtx.new((self.mi_cols + 1) >> 1, (self.mi_rows + 1) >> 1),
        ]

        sb = 64
        for sy in range(0, h, sb):
            for sx in range(0, w, sb):
                self._partition(sx, sy, 64)
        data = self.enc.done()
        return data, self.rec

    # -- partition tree ------------------------------------------------------

    def _part_ctx(self, x: int, y: int, bsl: int) -> int:
        # bit position: deciding size 8/16/32/64/128 reads bit 0/1/2/3/4
        # (= bsl-1), verified against dav1d decode behavior
        mc, mr = x // 4, y // 4
        above = (int(self.above_part[mc]) >> (bsl - 1)) & 1
        left = (int(self.left_part[mr]) >> (bsl - 1)) & 1
        return left * 2 + above

    def _partition(self, x: int, y: int, size: int) -> None:
        if x >= self.w or y >= self.h:
            return
        bsl = {8: 1, 16: 2, 32: 3, 64: 4}[size]
        ctx = self._part_ctx(x, y, bsl)
        cdf_row = self.cdf.partition[(bsl - 1) * 4 + ctx]
        split = size > 32  # fixed: split 64 -> 32x32 leaves
        nsyms = 4 if size == 8 else 10
        sym = self.enc.symbol_adapt if self.adapt else self.enc.symbol
        # partition cdf rows are stride-11; use the active prefix
        active = cdf_row[: nsyms + 1]
        sym(PARTITION_SPLIT if split else PARTITION_NONE, active)
        if split:
            half = size // 2
            self._partition(x, y, half)
            self._partition(x + half, y, half)
            self._partition(x, y + half, half)
            self._partition(x + half, y + half, half)
        else:
            self._block(x, y, size)
            # partition context update for NONE at this size
            ab, lf = _PART_CTX[size]
            n4 = size // 4
            self.above_part[x // 4 : x // 4 + n4] = ab
            self.left_part[y // 4 : y // 4 + n4] = lf

    # -- leaf block ----------------------------------------------------------

    def _choose_mode(self, x: int, y: int, size: int):
        """SAD-based intra mode choice over cheap candidates."""
        rec = self.rec[0]
        have_above = y > 0
        have_left = x > 0
        above, left = ip.build_edges(rec, x, y, size, size, have_above, have_left, self.bd)
        src = self.src[0][y : y + size, x : x + size]
        best, best_cost = ip.DC_PRED, None
        for mode in (ip.DC_PRED, ip.V_PRED, ip.H_PRED, ip.SMOOTH_PRED, ip.PAETH_PRED):
            pred = ip.predict(mode, above, left, size, size, have_above, have_left, 0, self.bd)
            cost = int(np.abs(src - pred).sum())
            if best_cost is None or cost < best_cost:
                best, best_cost = mode, cost
        return best

    def _block(self, x: int, y: int, size: int) -> None:
        mc, mr = x // 4, y // 4
        n4 = size // 4
        sym = self.enc.symbol_adapt if self.adapt else self.enc.symbol

        y_mode = self._choose_mode(x, y, size)
        uv_mode = ip.DC_PRED

        # --- transform + quantize first (skip flag needs the answer) ---
        txs = []  # (plane, px, py, tw, th, levels2d, dq)
        # luma
        pred_y, lv_y, dq_y = self._code_plane_tx(0, x, y, size, size, y_mode)
        # chroma 4:2:0
        cx, cy, cs = x >> 1, y >> 1, size >> 1
        pred_u, lv_u, dq_u = self._code_plane_tx(1, cx, cy, cs, cs, uv_mode)
        pred_v, lv_v, dq_v = self._code_plane_tx(2, cx, cy, cs, cs, uv_mode)
        skip = not (lv_y.any() or lv_u.any() or lv_v.any())

        # --- mode info ---
        skip_ctx = int(self.above_skip[mc] + self.left_skip[mr])
        sym(1 if skip else 0, self.cdf.skip[skip_ctx])

        above_ctx = INTRA_MODE_CTX[int(self.above_mode[mc])] if y > 0 else 0
        left_ctx = INTRA_MODE_CTX[int(self.left_mode[mr])] if x > 0 else 0
        sym(y_mode, self.cdf.kf_y_mode[above_ctx][left_ctx])
        # angle delta for directional modes at bsize >= 8x8 (delta always 0
        # until fine directional search lands)
        if size >= 8 and y_mode in ip.DIRECTIONAL_MODES:
            sym(0 + 3, self.cdf.angle_delta[y_mode - ip.V_PRED])

        # uv mode: cfl allowed for blocks <= 32x32
        cfl_allowed = 1 if size <= 32 else 0
        uv_cdf = self.cdf.uv_mode[cfl_allowed][y_mode]
        nsyms = 14 if cfl_allowed else 13
        sym(uv_mode, uv_cdf[: nsyms + 1])
        if size >= 8 and uv_mode in ip.DIRECTIONAL_MODES:
            sym(0 + 3, self.cdf.angle_delta[uv_mode - ip.V_PRED])

        # --- residual ---
        if not skip:
            self._residual(0, x, y, size, size, lv_y)
            self._residual(1, cx, cy, cs, cs, lv_u)
            self._residual(2, cx, cy, cs, cs, lv_v)
        else:
            # zero contexts over the block extent
            for p, (px, py, ts) in ((0, (x, y, size)), (1, (cx, cy, cs)), (2, (cx, cy, cs))):
                self._update_coef_ctx(p, px, py, ts, ts, 0, 0)
            dq_y = np.zeros_like(dq_y)
            dq_u = np.zeros_like(dq_u)
            dq_v = np.zeros_like(dq_v)

        # --- reconstruct ---
        self._reconstruct(0, x, y, pred_y, dq_y)
        self._reconstruct(1, cx, cy, pred_u, dq_u)
        self._reconstruct(2, cx, cy, pred_v, dq_v)

        # --- neighbor state ---
        self.above_mode[mc : mc + n4] = y_mode
        self.left_mode[mr : mr + n4] = y_mode
        self.above_skip[mc : mc + n4] = 1 if skip else 0
        self.left_skip[mr : mr + n4] = 1 if skip else 0

    def _code_plane_tx(self, plane: int, px: int, py: int, tw: int, th: int, mode: int):
        """Predict + forward transform + quantize one tx block.
        Returns (pred, levels2d(eff), dequant(full))."""
        rec = self.rec[plane]
        have_above = py > 0
        have_left = px > 0
        above, left = ip.build_edges(rec, px, py, tw, th, have_above, have_left, self.bd)
        pred = ip.predict(mode, above, left, tw, th, have_above, have_left, 0, self.bd)
        src = self.src[plane][py : py + th, px : px + tw]
        resid = (src - pred).astype(np.int32)
        coeffs = tf.forward_transform(resid, tf.DCT_DCT, self.bd)
        we, he = min(tw, 32), min(th, 32)
        coeffs[he:, :] = 0
        coeffs[:, we:] = 0
        levels = qz.quantize(coeffs, self.dc_q, self.ac_q, tw, th)
        dq = qz.dequantize(levels, self.dc_q, self.ac_q, tw, th, self.bd)
        return pred, levels[:he, :we], dq

    def _residual(self, plane: int, px: int, py: int, tw: int, th: int, levels) -> None:
        we, he = min(tw, 32), min(th, 32)
        ptype = 1 if plane else 0
        txs_ctx = cf.tx_size_ctx(tw, th)
        scan = scan_for(we, he)
        tctx = self._txb_skip_ctx(plane, px, py, tw, th)
        dctx = self._dc_sign_ctx(plane, px, py, tw, th)
        cul, dc_cat = cf.encode_txb(
            self.enc, self.cdf, levels, scan, ptype, txs_ctx,
            cf.TX_CLASS_2D, tctx, dctx, adapt=self.adapt,
        )
        self._update_coef_ctx(plane, px, py, tw, th, cul, dc_cat)

    def _txb_skip_ctx(self, plane: int, px: int, py: int, tw: int, th: int) -> int:
        # bring-up: tx size == block size for luma -> ctx 0
        if plane == 0:
            return 0
        ctx = self.pctx[plane]
        u = 4
        a = ctx.above_cul[px // u : (px + tw) // u]
        l = ctx.left_cul[py // u : (py + th) // u]
        return 7 + int(a.any()) + int(l.any())

    def _dc_sign_ctx(self, plane: int, px: int, py: int, tw: int, th: int) -> int:
        ctx = self.pctx[plane]
        u = 4
        a = ctx.above_dc[px // u : (px + tw) // u]
        l = ctx.left_dc[py // u : (py + th) // u]
        s = int((a == 2).sum() + (l == 2).sum()) - int((a == 1).sum() + (l == 1).sum())
        return 0 if s == 0 else (2 if s > 0 else 1)

    def _update_coef_ctx(self, plane, px, py, tw, th, cul, dc_cat) -> None:
        ctx = self.pctx[plane]
        u = 4
        ctx.above_cul[px // u : (px + tw) // u] = cul
        ctx.left_cul[py // u : (py + th) // u] = cul
        ctx.above_dc[px // u : (px + tw) // u] = dc_cat
        ctx.left_dc[py // u : (py + th) // u] = dc_cat

    def _reconstruct(self, plane, px, py, pred, dq) -> None:
        resid = tf.inverse_transform(dq, tf.DCT_DCT, self.bd)
        out = np.clip(pred + resid, 0, (1 << self.bd) - 1)
        self.rec[plane][py : py + pred.shape[0], px : px + pred.shape[1]] = out
