"""AV1 coefficient level-map coding (spec 5.11.39 coeffs() + 8.3.2 context
derivations).

Reference encoder analog: src/context/transform_unit.rs.  Context rules
(nz-map offsets, partition/skip context bytes, level neighbor sets) were
verified against the constant tables embedded in the system libaom binary.

The encoder mirrors the decoder's reverse-scan pass exactly: base/br levels
are coded most-significant-scan-position first, and context derivations only
reference levels at later scan positions (already coded), with magnitudes
capped at 15 (the pre-golomb knowledge the decoder has mid-pass).
"""

from __future__ import annotations

import numpy as np

NUM_BASE_LEVELS = 2
COEFF_BASE_RANGE = 12
BR_CDF_SIZE = 4
MAX_LEVEL_KNOWN = COEFF_BASE_RANGE + NUM_BASE_LEVELS + 1  # 15

TX_CLASS_2D = 0
TX_CLASS_HORIZ = 1
TX_CLASS_VERT = 2

EOB_TABLE = {16: "eob_pt_16", 32: "eob_pt_32", 64: "eob_pt_64", 128: "eob_pt_128",
             256: "eob_pt_256", 512: "eob_pt_512", 1024: "eob_pt_1024"}


def tx_size_ctx(w: int, h: int) -> int:
    """get_txsize_entropy_ctx: (sqr + sqr_up + 1) >> 1, both capped at 32."""
    a = min(int(np.log2(min(w, h))) - 2, 3)
    b = min(int(np.log2(max(w, h))) - 2, 3)
    # sqr_up of 64-dim transforms is TX_64X64 (index 4)
    if max(w, h) == 64:
        b = 4
    return (a + b + 1) >> 1


def base_ctx_offset_2d(row: int, col: int, w: int, h: int) -> int:
    """nz-map context offset (verified against libaom's
    av1_nz_map_ctx_offset tables)."""
    if row == 0 and col == 0:
        return 0
    if w < h and row < 2:
        return 11
    if w > h and col < 2:
        return 16
    if row + col < 2:
        return 1
    if row + col < 4:
        return 6
    return 21


SIG_COEF_CONTEXTS_2D = 26
_CTX_OFFSET_1D = (0, 5, 10)


def base_ctx(levels: np.ndarray, row: int, col: int, w: int, h: int, tx_class: int) -> int:
    """levels: (h, w) already-coded magnitudes (capped 15)."""
    if tx_class == TX_CLASS_2D and row == 0 and col == 0:
        return 0  # DC of a 2D transform: always context 0
    if tx_class == TX_CLASS_2D:
        nb = ((0, 1), (1, 0), (1, 1), (0, 2), (2, 0))
    elif tx_class == TX_CLASS_HORIZ:
        nb = ((0, 1), (0, 2), (0, 3), (0, 4), (0, 5))
    else:
        nb = ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0))
    mag = 0
    for dr, dc in nb:
        r, cc = row + dr, col + dc
        if r < h and cc < w:
            mag += min(int(levels[r, cc]), 3)
    ctx = min((mag + 1) >> 1, 4)
    if tx_class == TX_CLASS_2D:
        return ctx + base_ctx_offset_2d(row, col, w, h)
    idx = col if tx_class == TX_CLASS_HORIZ else row
    return SIG_COEF_CONTEXTS_2D + ctx + _CTX_OFFSET_1D[min(idx, 2)]


def base_ctx_eob(scan_idx: int, eob_area: int) -> int:
    if scan_idx == 0:
        return 0
    if scan_idx <= eob_area // 8:
        return 1
    if scan_idx <= eob_area // 4:
        return 2
    return 3


def br_ctx(levels: np.ndarray, row: int, col: int, w: int, h: int, tx_class: int) -> int:
    if tx_class == TX_CLASS_2D:
        nb = ((0, 1), (1, 0), (1, 1))
    elif tx_class == TX_CLASS_HORIZ:
        nb = ((0, 1), (0, 2), (0, 3))
    else:
        nb = ((1, 0), (2, 0), (3, 0))
    mag = 0
    for dr, dc in nb:
        r, cc = row + dr, col + dc
        if r < h and cc < w:
            mag += min(int(levels[r, cc]), MAX_LEVEL_KNOWN)
    mag = min((mag + 1) >> 1, 6)
    if row == 0 and col == 0:
        return mag
    if tx_class == TX_CLASS_2D:
        return mag + (7 if (row < 2 and col < 2) else 14)
    idx = col if tx_class == TX_CLASS_HORIZ else row
    return mag + (7 if idx == 0 else 14)


def encode_txb(
    enc,
    cdf,
    levels2d: np.ndarray,
    scan: np.ndarray,
    plane_type: int,
    txs_ctx: int,
    tx_class: int,
    txb_skip_ctx: int,
    dc_sign_ctx: int,
    adapt: bool = True,
    tx_type_fn=None,
) -> tuple:
    """Code one transform block.

    levels2d: (h_eff, w_eff) SIGNED quantized levels (<=32x32 region).
    Returns (cul_level, dc_category) for neighbor context updates.
    """
    h, w = levels2d.shape
    sym = enc.symbol_adapt if adapt else enc.symbol

    flat = levels2d.reshape(-1)
    scanned = flat[scan]
    nz = np.nonzero(scanned)[0]
    eob = int(nz[-1]) + 1 if len(nz) else 0

    # all_zero
    sym(1 if eob == 0 else 0, cdf.txb_skip[txs_ctx][txb_skip_ctx])
    if eob == 0:
        return 0, 0

    # transform type signaling (spec: inside coeffs(), right after all_zero)
    if tx_type_fn is not None:
        tx_type_fn()

    # eob position
    area = w * h
    eob_table = getattr(cdf, EOB_TABLE[area])
    eob_multi_ctx = 0 if tx_class == TX_CLASS_2D else 1
    eob_pt = 0
    t = eob - 1
    # eobPt: 1 -> eob 1; 2 -> 2; 3 -> 3-4; 4 -> 5-8; k -> (2^(k-2)+1 .. 2^(k-1))
    if eob <= 2:
        eob_pt = eob
    else:
        eob_pt = int(np.ceil(np.log2(eob))) + 1
    sym(eob_pt - 1, eob_table[plane_type][eob_multi_ctx])
    if eob_pt >= 3:
        base = (1 << (eob_pt - 2)) + 1
        rem = eob - base  # 0 .. 2^(eob_pt-2)-1
        nbits = eob_pt - 2
        # first (most significant) bit is context-coded
        msb = (rem >> (nbits - 1)) & 1
        sym(msb, cdf.eob_extra[txs_ctx][plane_type][eob_pt - 3])
        for i in range(1, nbits):
            bit = (rem >> (nbits - 1 - i)) & 1
            enc.bool_(bit, 16384)

    # reverse-scan base + br
    known = np.zeros((h, w), dtype=np.int32)  # levels visible to decoder
    positions = scan[:eob]
    for ci in range(eob - 1, -1, -1):
        pos = int(positions[ci])
        row, col = pos // w, pos % w
        level = abs(int(flat[pos]))
        if ci == eob - 1:
            s = min(level, 3) - 1
            ctx = base_ctx_eob(ci, area)
            sym(s, cdf.coeff_base_eob[txs_ctx][plane_type][ctx])
        else:
            s = min(level, 3)
            ctx = base_ctx(known, row, col, w, h, tx_class)
            sym(s, cdf.coeff_base[txs_ctx][plane_type][ctx])
        if level > NUM_BASE_LEVELS:
            bctx = br_ctx(known, row, col, w, h, tx_class)
            base_range = level - 1 - NUM_BASE_LEVELS
            idx = 0
            while idx < COEFF_BASE_RANGE:
                k = min(base_range - idx, BR_CDF_SIZE - 1)
                sym(k, cdf.coeff_br[min(txs_ctx, 3)][plane_type][bctx])
                if k < BR_CDF_SIZE - 1:
                    break
                idx += BR_CDF_SIZE - 1
        known[row, col] = min(level, MAX_LEVEL_KNOWN)

    # signs + golomb extras, forward scan
    cul = 0
    dc_val = int(flat[int(positions[0])]) if int(positions[0]) == 0 else int(levels2d[0, 0])
    for ci in range(eob):
        pos = int(positions[ci])
        v = int(flat[pos])
        level = abs(v)
        if level:
            if ci == 0:
                sym(1 if v < 0 else 0, cdf.dc_sign[plane_type][dc_sign_ctx])
            else:
                enc.bool_(1 if v < 0 else 0, 16384)
            if level > COEFF_BASE_RANGE + NUM_BASE_LEVELS:
                _write_golomb(enc, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS)
        cul += level

    cul = min(cul, 63)
    dc0 = int(levels2d[0, 0])
    dc_category = 0 if dc0 == 0 else (1 if dc0 < 0 else 2)
    return cul, dc_category


def _write_golomb(enc, value: int) -> None:
    """Exp-Golomb suffix for levels > 15 (spec read_golomb mirror)."""
    x = value + 1
    length = x.bit_length()
    for _ in range(length - 1):
        enc.bool_(0, 16384)
    for i in range(length - 1, -1, -1):
        enc.bool_((x >> i) & 1, 16384)
