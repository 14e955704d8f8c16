"""Spatial activity masking (psychovisual tuning).

Reference analog: src/activity.rs (ActivityMask -> DistortionScale).  The
per-8x8 source variance maps to a distortion scale; here the scale is
folded into a per-block lambda (dist*scale + lam*rate is equivalent to
dist + (lam/scale)*rate for decision purposes), so the native block coder
and the device RD maps apply it through their existing lambda inputs.
"""

from __future__ import annotations

import numpy as np


def activity_mask(luma: np.ndarray) -> np.ndarray:
    """Per-8x8 spatial variance of the source luma (float64 result).
    Integer moment sums (no full-plane float copies): 8-bit samples keep
    x^2 block sums below 2^23, so int32 products cannot overflow."""
    h, w = luma.shape
    h8, w8 = h // 8, w // 8
    b = luma[: h8 * 8, : w8 * 8].reshape(h8, 8, w8, 8)
    s1 = b.sum(axis=(1, 3), dtype=np.int64)
    s2 = (b * b).sum(axis=(1, 3), dtype=np.int64)
    return s2 / 64.0 - (s1 / 64.0) ** 2


def distortion_scales(act: np.ndarray) -> np.ndarray:
    """Activity -> distortion scale, normalized to geometric mean 1 over
    the frame (reference: rav1e's DistortionScale with psychovisual tune:
    flat regions get scale > 1 = more protection, busy regions < 1)."""
    # rav1e-style: scale ~ (act + eps)^-alpha relative to the frame mean
    eps = 16.0
    alpha = 0.5
    s = (act + eps) ** -alpha
    # normalize in log domain so the average operating point is unchanged
    s = s / np.exp(np.log(s).mean())
    return np.clip(s, 0.25, 4.0)


def lambda_map(luma: np.ndarray, lam: float, block: int = 32) -> np.ndarray:
    """Per-(block x block) effective lambda = lam / mean(scale) over the
    block (SB-padded source)."""
    act = activity_mask(luma)
    sc = distortion_scales(act)
    h8, w8 = sc.shape
    n = block // 8
    hb, wb = h8 // n, w8 // n
    m = sc[: hb * n, : wb * n].reshape(hb, n, wb, n).mean(axis=(1, 3))
    return lam / m
