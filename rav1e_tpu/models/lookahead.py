"""Lookahead importance propagation (temporal RDO).

Reference analog: src/api/lookahead.rs + compute_block_importances in
src/api/internal.rs: half-resolution motion estimation over the lookahead
queue estimates per-block inter/intra cost ratios; importances propagate
backwards through the MVs, and blocks that future frames reference heavily
get a lower effective lambda (better quality) when encoded.
"""

from __future__ import annotations

import numpy as np

BLK = 16  # importance grid granularity in luma pixels


def _half(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    return p[: h & ~1, : w & ~1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _block_sad(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    h, w = a.shape
    hb, wb = h // n, w // n
    d = np.abs(a[: hb * n, : wb * n] - b[: hb * n, : wb * n])
    return d.reshape(hb, n, wb, n).sum(axis=(1, 3))


def intra_cost_estimate(luma: np.ndarray) -> np.ndarray:
    """Cheap per-BLK intra cost: SAD against the block DC (the flat
    predictor bound used by rav1e's estimate_intra_costs fast path)."""
    h, w = luma.shape
    hb, wb = h // BLK, w // BLK
    b = luma[: hb * BLK, : wb * BLK].reshape(hb, BLK, wb, BLK).astype(np.float64)
    mean = b.mean(axis=(1, 3), keepdims=True)
    return np.abs(b - mean).sum(axis=(1, 3))


def lookahead_me(cur: np.ndarray, ref: np.ndarray, rng_px: int = 16):
    """Half-res full-pel ME per BLK block: exhaustive whole-plane-shift
    search (every shift is one vectorized block-SAD map).  Returns
    (mvs[hb,wb,2] in full-res pixels, inter_cost[hb,wb] at ~full-res
    scale)."""
    ch, cr = _half(cur), _half(ref)
    n = BLK // 2
    h, w = ch.shape
    hb, wb = h // n, w // n
    r = rng_px // 2
    best = np.full((hb, wb), np.inf)
    bmv = np.zeros((hb, wb, 2), np.int32)
    pad = np.pad(cr, r, mode="edge")
    for dy in range(-r, r + 1, 2):
        for dx in range(-r, r + 1, 2):
            shifted = pad[r + dy : r + dy + h, r + dx : r + dx + w]
            cost = _block_sad(ch, shifted, n)
            better = cost < best
            best = np.where(better, cost, best)
            bmv[..., 0] = np.where(better, dy, bmv[..., 0])
            bmv[..., 1] = np.where(better, dx, bmv[..., 1])
    return bmv * 2, best * 4.0


def propagate_importance(frames: list, rng_px: int = 16):
    """frames: list of luma planes in coding order (frame t references
    frame t-1... the DISPLAY order chain).  Returns a list of importance
    grids (one per frame, BLK granularity), propagated backwards like
    rav1e's compute_block_importances."""
    n = len(frames)
    if n == 0:
        return []
    grids = [None] * n
    hb = frames[0].shape[0] // BLK
    wb = frames[0].shape[1] // BLK
    imp = np.zeros((hb, wb))
    grids[n - 1] = imp
    for t in range(n - 2, -1, -1):
        intra_c = intra_cost_estimate(frames[t + 1])[:hb, :wb]
        mvs, inter_c = lookahead_me(frames[t + 1], frames[t], rng_px)
        inter_c = inter_c[:hb, :wb]
        # propagation fraction: how much of frame t+1's signal comes from t
        frac = np.clip(1.0 - inter_c / np.maximum(intra_c, 1.0), 0.0, 1.0)
        flow = (intra_c * frac) + grids[t + 1] * frac
        # splat into frame t through the MVs (nearest-block)
        cur = np.zeros((hb, wb))
        for by in range(hb):
            for bx in range(wb):
                ty = by + int(np.round(mvs[by, bx, 0] / BLK))
                tx = bx + int(np.round(mvs[by, bx, 1] / BLK))
                ty = min(max(ty, 0), hb - 1)
                tx = min(max(tx, 0), wb - 1)
                cur[ty, tx] += flow[by, bx]
        grids[t] = cur
    return grids


def importance_scale_map(imp: np.ndarray, intra_c: np.ndarray,
                         block: int = 32) -> np.ndarray:
    """Importance -> per-(block x block) distortion scale (>= 1 on blocks
    future frames reference heavily; the encoder folds it into lambda as
    lam / scale).  rav1e's model: scale = 1 + importance/intra_cost,
    geometric-mean normalized."""
    scale = 1.0 + imp / np.maximum(intra_c, 1.0)
    scale = scale / np.exp(np.log(scale).mean())
    scale = np.clip(scale, 0.5, 4.0)
    hb, wb = scale.shape
    m = block // BLK
    h2, w2 = hb // m, wb // m
    if h2 == 0 or w2 == 0:
        return None
    return scale[: h2 * m, : w2 * m].reshape(h2, m, w2, m).mean(axis=(1, 3))
