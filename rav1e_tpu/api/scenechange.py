"""Scene-change detection.

Reference analog: src/scenechange/mod.rs.  Two modes, like the reference:
- fast (high speeds): downscale -> plane SAD -> adaptive threshold
- standard: half-res motion-compensated inter cost vs intra cost
  ([SC-Detect] Raw/Bwd/Th model) using the lookahead ME helpers
"""

from __future__ import annotations

from collections import deque

import numpy as np


class SceneChangeDetector:
    def __init__(self, bit_depth: int = 8, min_len: int = 12, max_len: int = 240,
                 fast: bool = True):
        self.bd = bit_depth
        self.min_len = min_len
        self.max_len = max_len
        self.fast = fast
        self.prev = None
        self.prev_full = None
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
        if not self.fast:
            return self._analyze_std(np.asarray(y_plane, np.float32))
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

    def _analyze_std(self, y: np.ndarray) -> bool:
        """Standard mode: motion-compensated inter cost vs intra cost.
        A frame whose best half-res MC prediction from the previous frame
        costs a large fraction of its intra cost is a cut (the reference's
        [SC-Detect] Raw= Bwd= Th= model, simplified to one backward
        reference)."""
        from rav1e_tpu.models.lookahead import intra_cost_estimate, lookahead_me

        if self.bd > 8:
            y = y / (1 << (self.bd - 8))
        prev = self.prev_full
        self.prev_full = y
        if prev is None:
            self.since_kf = 0
            return True
        self.since_kf += 1
        _, inter_c = lookahead_me(y, prev)
        intra_c = intra_cost_estimate(y)
        h = min(inter_c.shape[0], intra_c.shape[0])
        w = min(inter_c.shape[1], intra_c.shape[1])
        ratio = float(inter_c[:h, :w].sum()) / max(float(intra_c[:h, :w].sum()), 1.0)
        # adaptive threshold on the inter/intra cost ratio: a cut is a
        # spike well above the recent level (reference: [SC-Detect] Th)
        recent = float(np.median(self.history)) if self.history else None
        thresh = 0.7 if recent is None else max(0.5, 2.0 * recent + 0.15)
        self.history.append(ratio)
        is_cut = False
        if self.since_kf >= self.min_len and ratio > thresh:
            is_cut = True
        if self.since_kf >= self.max_len:
            is_cut = True
        if is_cut:
            self.since_kf = 0
            self.history.clear()
        return is_cut
