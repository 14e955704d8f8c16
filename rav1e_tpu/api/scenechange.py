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

    # -- deferred (lookahead) API -------------------------------------------
    #
    # The reference resolves keyframe placement inside receive_packet over
    # the buffered lookahead with backward/forward validation
    # (src/api/internal.rs compute_keyframe_placement + the [SC-Detect]
    # Bwd=/Fwd= model): a frame is a cut only if it differs from the PAST
    # and the FUTURE sticks with it — a one-frame flash does not cut.
    # analyze_score() measures, resolve() decides once the next frame's
    # score is known, commit() advances the adaptive state in input order.

    def analyze_score(self, y_plane: np.ndarray) -> float:
        """Raw change score of this frame vs the previous input (no
        decision, no adaptive-state commitment).  inf for the first."""
        y = np.asarray(y_plane, np.float32)
        if self.fast:
            small = self._downscale(y)
            if self.bd > 8:
                small = small / (1 << (self.bd - 8))
            prev = self.prev
            self.prev = small
            if prev is None:
                return float("inf")
            return float(np.abs(small - prev).mean())
        from rav1e_tpu.models.lookahead import (intra_cost_estimate,
                                                lookahead_me)

        if self.bd > 8:
            y = y / (1 << (self.bd - 8))
        prev = self.prev_full
        self.prev_full = y
        if prev is None:
            return float("inf")
        _, inter_c = lookahead_me(y, prev)
        intra_c = intra_cost_estimate(y)
        h = min(inter_c.shape[0], intra_c.shape[0])
        w = min(inter_c.shape[1], intra_c.shape[1])
        return float(inter_c[:h, :w].sum()) / max(
            float(intra_c[:h, :w].sum()), 1.0)

    def _threshold(self) -> float:
        if self.fast:
            recent = float(np.median(self.history)) if self.history else 0.0
            return max(self.base, 3.0 * recent + 4.0)
        if not self.history:
            return 0.7
        recent = float(np.median(self.history))
        return max(0.5, 2.0 * recent + 0.15)

    def resolve(self, score: float, next_score: float | None) -> bool:
        """Keyframe decision for the frame with `score`, validated against
        the NEXT frame's score (None at the end of the stream).  Called
        once per frame in input order (it tracks flash state)."""
        if score == float("inf"):
            self._flash_pending = False
            return True  # first frame
        revert = getattr(self, "_flash_pending", False)
        self._flash_pending = False
        if self.since_kf + 1 >= self.max_len:
            return True
        if self.since_kf + 1 < self.min_len:
            return False
        thr = self._threshold()
        if score <= thr:
            return False
        if revert:
            # previous frame was a suppressed flash: this transition is
            # the scene reverting, not a new scene
            return False
        if next_score is not None and next_score > max(thr, 0.5 * score):
            # the next frame changes just as hard: a one-frame flash (the
            # scene reverts), not a cut — the reference's fwd validation
            self._flash_pending = True
            return False
        return True

    def commit(self, score: float, is_key: bool) -> None:
        """Advance the adaptive state for one frame, in input order."""
        if is_key:
            self.since_kf = 0
            self.history.clear()
        else:
            self.since_kf += 1
            if score != float("inf"):
                self.history.append(score)

    # -- causal API (no lookahead: resolve each frame immediately) ----------

    def analyze(self, y_plane: np.ndarray) -> bool:
        """Feed the next input luma plane; returns True on a scene cut.
        The caller applies min/max keyframe interval rules."""
        score = self.analyze_score(y_plane)
        is_cut = self.resolve(score, None)
        self.commit(score, is_cut)
        return is_cut
