"""Intra prediction - numpy reference (NORMATIVE, spec 7.11.2).

Reconstruction depends on these predictors bit-exactly matching the
decoder.  This build signals enable_intra_edge_filter=0 and
enable_filter_intra=0 in the sequence header, so edge filtering /
upsampling / filter-intra never apply (they land with the full toolset).

Reference encoder analog: src/predict.rs + src/recon_intra.rs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_TABLES = np.load(Path(__file__).parent / "av1_tables.npz")
_SM_W = _TABLES["sm_weights"]  # concatenated for sizes 4,8,16,32,64
_DR = _TABLES["dr_intra_derivative"]

# PredictionMode enum (spec order)
DC_PRED = 0
V_PRED = 1
H_PRED = 2
D45_PRED = 3
D135_PRED = 4
D113_PRED = 5
D157_PRED = 6
D203_PRED = 7
D67_PRED = 8
SMOOTH_PRED = 9
SMOOTH_V_PRED = 10
SMOOTH_H_PRED = 11
PAETH_PRED = 12
UV_CFL_PRED = 13

MODE_ANGLE = {
    V_PRED: 90,
    H_PRED: 180,
    D45_PRED: 45,
    D135_PRED: 135,
    D113_PRED: 113,
    D157_PRED: 157,
    D203_PRED: 203,
    D67_PRED: 67,
}

DIRECTIONAL_MODES = tuple(MODE_ANGLE)


def sm_weights(n: int) -> np.ndarray:
    off = {4: 0, 8: 4, 16: 12, 32: 28, 64: 60}[n]
    return _SM_W[off : off + n]


def build_edges(
    recon: np.ndarray,
    x: int,
    y: int,
    w: int,
    h: int,
    have_above: bool,
    have_left: bool,
    bit_depth: int = 8,
    n_top_right: int = 0,
    n_bottom_left: int = 0,
    max_x: int | None = None,
    max_y: int | None = None,
):
    """Build AboveRow[-1..w+h-1] and LeftCol[-1..w+h-1] per spec 7.11.2
    (without edge filter/upsampling).  recon is the reconstruction plane;
    (x, y) the block origin.  n_top_right / n_bottom_left: number of valid
    pixels beyond the block edge (0 if unavailable).  max_x/max_y: last
    valid plane coordinate (the mi-grid bound; spec clamps all edge reads:
    AboveRow[i] = CurrFrame[y-1][Min(maxX, x+i)])."""
    base = 1 << (bit_depth - 1)
    if max_x is None:
        max_x = recon.shape[1] - 1
    if max_y is None:
        max_y = recon.shape[0] - 1
    above = np.empty(w + h + 1, dtype=np.int32)  # above[0] = top-left
    left = np.empty(w + h + 1, dtype=np.int32)  # left[0] = top-left

    if have_above:
        row = recon[y - 1]
        n_tr = min(n_top_right, h)
        avail = w + n_tr
        idx = np.minimum(np.arange(x, x + avail), max_x)
        above[1 : 1 + avail] = row[idx]
        above[1 + avail :] = above[avail]  # replicate last
    else:
        # spec: missing above row takes LeftCol[0], or base-1 if no left
        above[1:] = recon[y][x - 1] if have_left else base - 1

    if have_left:
        col = recon[:, x - 1]
        n_bl = min(n_bottom_left, w)
        avail = h + n_bl
        idx = np.minimum(np.arange(y, y + avail), max_y)
        left[1 : 1 + avail] = col[idx]
        left[1 + avail :] = left[avail]
    else:
        # spec: missing left column takes AboveRow[0], or base+1 if no above
        left[1:] = recon[y - 1][x] if have_above else base + 1

    # top-left corner
    if have_above and have_left:
        tl = recon[y - 1][x - 1]
    elif have_above:
        tl = recon[y - 1][x]
    elif have_left:
        tl = recon[y][x - 1]
    else:
        tl = base
    above[0] = left[0] = tl
    return above, left


def predict(
    mode: int,
    above: np.ndarray,
    left: np.ndarray,
    w: int,
    h: int,
    have_above: bool,
    have_left: bool,
    angle_delta: int = 0,
    bit_depth: int = 8,
) -> np.ndarray:
    """Returns (h, w) int32 prediction.  above/left from build_edges
    (index 0 = top-left corner, 1.. = edge pixels)."""
    base = 1 << (bit_depth - 1)
    A = above[1:].astype(np.int64)
    L = left[1:].astype(np.int64)
    tl = int(above[0])

    if mode == DC_PRED:
        if have_above and have_left:
            s = A[:w].sum() + L[:h].sum()
            avg = (s + ((w + h) >> 1)) // (w + h)
        elif have_above:
            avg = (A[:w].sum() + (w >> 1)) >> int(np.log2(w))
        elif have_left:
            avg = (L[:h].sum() + (h >> 1)) >> int(np.log2(h))
        else:
            avg = base
        return np.full((h, w), avg, dtype=np.int32)

    if mode == V_PRED and angle_delta == 0:
        return np.tile(A[:w], (h, 1)).astype(np.int32)
    if mode == H_PRED and angle_delta == 0:
        return np.tile(L[:h, None], (1, w)).astype(np.int32)

    if mode == PAETH_PRED:
        b = A[None, :w] + L[:h, None] - tl
        pa = np.abs(b - A[None, :w])
        pl = np.abs(b - L[:h, None])
        ptl = np.abs(b - tl)
        out = np.where((pl <= pa) & (pl <= ptl), L[:h, None],
                       np.where(pa <= ptl, A[None, :w], tl))
        return out.astype(np.int32)

    if mode in (SMOOTH_PRED, SMOOTH_V_PRED, SMOOTH_H_PRED):
        wx = sm_weights(w).astype(np.int64)
        wy = sm_weights(h).astype(np.int64)
        below = L[h - 1]
        right = A[w - 1]
        if mode == SMOOTH_PRED:
            v = (
                wy[:, None] * A[None, :w]
                + (256 - wy)[:, None] * below
                + wx[None, :] * L[:h, None]
                + (256 - wx)[None, :] * right
            )
            return ((v + 256) >> 9).astype(np.int32)
        if mode == SMOOTH_V_PRED:
            v = wy[:, None] * A[None, :w] + (256 - wy)[:, None] * below
            return ((v + 128) >> 8).astype(np.int32)
        v = wx[None, :] * L[:h, None] + (256 - wx)[None, :] * right
        return ((v + 128) >> 8).astype(np.int32)

    # directional
    p_angle = MODE_ANGLE[mode] + angle_delta * 3
    return _dr_predict(A, L, tl, w, h, p_angle, bit_depth)


def _dr_predict(A, L, tl, w, h, p_angle, bit_depth):
    """Directional prediction, no upsampling / edge filter (spec 7.11.2.4).
    Vectorized (the scalar loops were the host encoder's hottest path for
    partial-superblock mode search)."""
    rr = np.arange(h, dtype=np.int64)[:, None]
    cc = np.arange(w, dtype=np.int64)[None, :]
    # edge arrays indexed -1..: build with top-left at index 0
    az = np.concatenate(([tl], A))  # az[1+i] = above[i]
    lz = np.concatenate(([tl], L))
    if p_angle < 90:
        dx = int(_DR[p_angle])
        mx = w + h - 1
        xpos = (rr + 1) * dx
        b = (xpos >> 6) + cc
        sh = (xpos >> 1) & 0x1F
        i0 = np.minimum(b, mx)
        i1 = np.minimum(b + 1, mx)
        v = (A[i0] * (32 - sh) + A[i1] * sh + 16) >> 5
        out = np.where(b >= mx, A[mx], v)
    elif p_angle == 90:
        out = np.broadcast_to(A[None, :w], (h, w))
    elif p_angle < 180:
        dx = int(_DR[180 - p_angle])
        dy = int(_DR[p_angle - 90])
        xpos = (cc << 6) - (rr + 1) * dx
        bx = xpos >> 6
        shx = (xpos >> 1) & 0x1F
        i0 = np.clip(1 + bx, 0, len(az) - 1)
        i1 = np.clip(2 + bx, 0, len(az) - 1)
        va = (az[i0] * (32 - shx) + az[i1] * shx + 16) >> 5
        ypos = (rr << 6) - (cc + 1) * dy
        by = ypos >> 6
        shy = (ypos >> 1) & 0x1F
        j0 = np.clip(1 + by, 0, len(lz) - 1)
        j1 = np.clip(2 + by, 0, len(lz) - 1)
        vl = (lz[j0] * (32 - shy) + lz[j1] * shy + 16) >> 5
        out = np.where(bx >= -1, va, vl)
    elif p_angle == 180:
        out = np.broadcast_to(L[:h, None], (h, w))
    else:
        dy = int(_DR[270 - p_angle])
        mx = w + h - 1
        ypos = (cc + 1) * dy
        b = (ypos >> 6) + rr
        sh = (ypos >> 1) & 0x1F
        i0 = np.minimum(b, mx)
        i1 = np.minimum(b + 1, mx)
        v = (L[i0] * (32 - sh) + L[i1] * sh + 16) >> 5
        out = np.where(b >= mx, L[mx], v)
    return np.ascontiguousarray(out.astype(np.int32))


def cfl_predict(dc_pred: np.ndarray, luma_ac: np.ndarray, alpha: int, bit_depth: int = 8) -> np.ndarray:
    """CFL: chroma = dc + Round2Signed(alpha * luma_ac, 6) (spec 7.11.5).
    The sign belongs to the full product (alpha * ac), not alpha alone."""
    prod = alpha * luma_ac.astype(np.int64)
    scaled = np.sign(prod) * ((np.abs(prod) + 32) >> 6)
    v = dc_pred.astype(np.int64) + scaled
    return np.clip(v, 0, (1 << bit_depth) - 1).astype(np.int32)


def cfl_ac_420(luma: np.ndarray) -> np.ndarray:
    """CflAcValues for 4:2:0 (spec 7.11.5.2): 2x2 luma sums << 1, minus
    the rounded block average.  luma: the block's reconstructed samples."""
    s = (luma[0::2, 0::2].astype(np.int64) + luma[0::2, 1::2]
         + luma[1::2, 0::2] + luma[1::2, 1::2])
    L = s << 1
    n = L.size
    log2sz = n.bit_length() - 1
    avg = (int(L.sum()) + (1 << (log2sz - 1))) >> log2sz
    return (L - avg).astype(np.int32)
