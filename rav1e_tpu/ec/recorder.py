"""Recording writer: captures the tile's symbol stream for deferred
emission, so loop-restoration parameters (decided after deblock/CDEF) can
be inserted at each superblock's read_lr position before the real encode.

Reference analog: the WriterRecorder impl of the Writer trait in src/ec.rs,
which rav1e uses for exactly this deferral.

Adaptation note: recording does not touch CDFs; the replay performs the
real adaptive encode, so the decoder-visible adaptation is exact.  The
encode_txb context feedback (culLevel, dc category) is computed directly
from the levels here, matching the tokenizer's return values.
"""

from __future__ import annotations

import numpy as np


class RecordingEncoder:
    def __init__(self) -> None:
        self.ops: list = []

    # -- markers --------------------------------------------------------------

    def sb_anchor(self, sb_row: int, sb_col: int) -> None:
        """Mark a superblock start (read_lr insertion point)."""
        self.ops.append(("anchor", sb_row, sb_col))

    def cdef_anchor(self, sb_row: int, sb_col: int) -> None:
        """Mark the read_cdef position (first non-skip block of a 64x64
        unit); the replay writes the cdef_idx literal here when the frame
        ends up with cdef_bits > 0."""
        self.ops.append(("cdef", sb_row, sb_col))

    # -- Writer API (mirrors NativeMsacEncoder) -------------------------------

    def symbol(self, s: int, icdf) -> None:
        self.ops.append(("sym", s, icdf, False))

    def symbol_adapt(self, s: int, icdf) -> None:
        self.ops.append(("sym", s, icdf, True))

    def bool_(self, bit: int, f: int) -> None:
        self.ops.append(("bool", bit, f))

    def gather_bool(self, bit: int, cdf_row, pset, nsyms: int) -> None:
        """Bool whose probability is gathered from an adaptive cdf row at
        WRITE time (partial-SB partition bools) - deferred to replay."""
        self.ops.append(("gbool", bit, cdf_row, tuple(pset), nsyms))

    def literal(self, value: int, bits: int) -> None:
        self.ops.append(("lit", value, bits))

    def encode_txb(self, levels, scan, plane_type, tx_class, txb_skip_ctx,
                   dc_sign_ctx, cdf, txs_ctx, adapt=True, tx_type_row=None,
                   tx_type_sym=0) -> tuple:
        lv = np.ascontiguousarray(levels, dtype=np.int32)
        self.ops.append(("txb", lv, np.ascontiguousarray(scan, np.int32),
                         plane_type, tx_class, txb_skip_ctx, dc_sign_ctx,
                         txs_ctx, adapt, tx_type_row, tx_type_sym))
        # context feedback identical to the tokenizer's return values
        cul = int(min(63, np.abs(lv).sum()))
        dc = int(lv.flat[0])
        dc_cat = 0 if dc == 0 else (1 if dc < 0 else 2)
        return cul, dc_cat

    def replay(self, enc, cdf, lr_insert=None, cdef_insert=None) -> None:
        """Re-issue the recorded stream into a real encoder.  lr_insert:
        optional callback(enc, sb_row, sb_col) run at each SB anchor.
        cdef_insert: optional callback(enc, sb_row, sb_col) run at each
        read_cdef anchor (writes the cdef_idx literal, or nothing when the
        frame settled on cdef_bits == 0)."""
        for op in self.ops:
            kind = op[0]
            if kind == "anchor":
                if lr_insert is not None:
                    lr_insert(enc, op[1], op[2])
            elif kind == "cdef":
                if cdef_insert is not None:
                    cdef_insert(enc, op[1], op[2])
            elif kind == "sym":
                _, s, icdf, adapt = op
                (enc.symbol_adapt if adapt else enc.symbol)(s, icdf)
            elif kind == "bool":
                enc.bool_(op[1], op[2])
            elif kind == "gbool":
                enc.gather_bool(op[1], op[2], op[3], op[4])
            elif kind == "lit":
                enc.literal(op[1], op[2])
            else:  # txb
                (_, lv, scan, ptype, tclass, tctx, dctx, txs_ctx, adapt,
                 ttr, tts) = op
                enc.encode_txb(lv, scan, ptype, tclass, tctx, dctx, cdf,
                               txs_ctx, adapt=adapt, tx_type_row=ttr,
                               tx_type_sym=tts)
