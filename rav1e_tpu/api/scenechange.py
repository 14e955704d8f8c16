"""Scene-change detection (fast mode): downscaled SAD between consecutive
input frames against an adaptive threshold.

Reference analog: src/scenechange/mod.rs (the fast path used at high
speeds: downscale -> plane SAD -> adaptive threshold; the [SC-Detect]
standard path with lookahead intra/inter costs lands with the lookahead
ring)."""

from __future__ import annotations

from collections import deque

import numpy as np


class SceneChangeDetector:
    def __init__(self, bit_depth: int = 8, min_len: int = 12, max_len: int = 240):
        self.bd = bit_depth
        self.min_len = min_len
        self.max_len = max_len
        self.prev = None
        self.since_kf = 0
        self.history: deque = deque(maxlen=8)
        # base threshold in 8-bit per-pixel SAD units (reference default
        # threshold lineage: scaled SAD ~ intensity step of a full cut)
        self.base = 12.0

    def _downscale(self, y: np.ndarray) -> np.ndarray:
        h, w = y.shape
        fy = max(1, h // 120)
        fx = max(1, w // 160)
        ch, cw = h - h % fy, w - w % fx
        d = y[:ch, :cw].reshape(ch // fy, fy, cw // fx, fx)
        return d.mean(axis=(1, 3))

    def analyze(self, y_plane: np.ndarray) -> bool:
        """Feed the next input luma plane; returns True on a scene cut.
        The caller applies min/max keyframe interval rules."""
        small = self._downscale(np.asarray(y_plane, np.float32))
        if self.bd > 8:
            small = small / (1 << (self.bd - 8))
        if self.prev is None:
            self.prev = small
            self.since_kf = 0
            return True
        sad = float(np.abs(small - self.prev).mean())
        self.prev = small
        self.since_kf += 1
        # adaptive: cut when SAD spikes well above the recent level
        recent = float(np.median(self.history)) if self.history else 0.0
        self.history.append(sad)
        is_cut = False
        if self.since_kf >= self.min_len:
            if sad > max(self.base, 3.0 * recent + 4.0):
                is_cut = True
        if self.since_kf >= self.max_len:
            is_cut = True
        if is_cut:
            self.since_kf = 0
            self.history.clear()
        return is_cut
