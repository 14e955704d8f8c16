"""Distortion kernels: SAD / SATD.

Reference analog: src/dist.rs (get_sad, get_satd with 8x8 Hadamard
tiles).  SATD approximates the transform-domain cost and is used for
subpel motion refinement at the slower speeds (use_satd_subpel).
"""

from __future__ import annotations

import numpy as np

_H8 = None


def _hadamard8():
    global _H8
    if _H8 is None:
        h = np.array([[1]])
        for _ in range(3):
            h = np.block([[h, h], [h, -h]])
        _H8 = h.astype(np.int64)
    return _H8


def satd(a: np.ndarray, b: np.ndarray) -> int:
    """Sum of absolute 8x8 Hadamard-transformed differences (normalized
    like the reference: >> 2 per 8x8 tile; ragged edges fall back to SAD
    scaled to match)."""
    d = a.astype(np.int64) - b.astype(np.int64)
    h, w = d.shape
    h8, w8 = h // 8, w // 8
    total = 0
    if h8 and w8:
        t = d[: h8 * 8, : w8 * 8].reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3)
        hm = _hadamard8()
        tt = hm @ t @ hm
        total += int(np.abs(tt).sum() >> 2)
    # ragged right/bottom strips: plain SAD (same scale as 1-px transforms)
    if w8 * 8 < w:
        total += int(np.abs(d[:, w8 * 8 :]).sum())
    if h8 * 8 < h:
        total += int(np.abs(d[: h8 * 8, : w8 * 8]).sum() * 0)  # covered above
        total += int(np.abs(d[h8 * 8 :, : w8 * 8]).sum())
    return total
