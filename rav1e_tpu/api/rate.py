"""Rate control: single-pass average-bitrate with a bit reservoir.

Reference analog: src/rate.rs (RCState).  The reference implements the
Daala-lineage Q57 fixed-point log-domain model; this is the same structure
in float form: per-frame-type power-law bit models
(bits = scale * qstep^-beta), IIR scale adaptation, and a reservoir that
steers the per-frame target.  Constant-quantizer mode bypasses it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rav1e_tpu.ops import quantize_np as qz

# model exponent: empirical bits ~ qstep^-beta for this encoder (steep:
# the skip cliff at high q makes rate fall faster than 1/qstep)
BETA = {"key": 1.2, "inter": 1.8}
SCALE_INIT = {"key": 2.0, "inter": 1.0}  # bits/px at qstep 1.0, rough prior
ADAPT = {"key": 0.5, "inter": 0.45}  # IIR blend toward observed scale
KEY_BOOST = 4.0  # target multiple for keyframes


@dataclass
class RCState:
    width: int
    height: int
    bit_depth: int
    target_bitrate: int  # bits per second; 0 = CQ mode
    fps: float
    reservoir_frame_delay: int = 24
    min_q: int = 1
    max_q: int = 255

    def __post_init__(self) -> None:
        self.npx = self.width * self.height
        self.bits_per_frame = self.target_bitrate / max(self.fps, 1e-9)
        self.reservoir_target = self.bits_per_frame * self.reservoir_frame_delay
        self.fullness = self.reservoir_target
        self.log_scale = {t: float(np.log(SCALE_INIT[t])) for t in ("key", "inter")}
        self._qstep_table = np.array(
            [qz.ac_q(i, 0, self.bit_depth) / 8.0 for i in range(256)]
        )

    # qi units per rate doubling on the AV1 ac_q curve (the table spans
    # ~7.8 octaves of qstep over 256 indices)
    QI_PER_OCTAVE = 33.0
    GAIN = 0.9  # integral controller gain on log2(actual/target)

    def _frame_target(self, frame_type: str) -> float:
        # fullness below target => we have overspent => spend less now
        surplus = self.fullness - self.reservoir_target
        target = self.bits_per_frame + surplus / min(self.reservoir_frame_delay, 8)
        if frame_type == "key":
            target *= KEY_BOOST
        return max(target, self.bits_per_frame * 0.1)

    # -- quantizer selection --------------------------------------------------

    def select_qi(self, frame_type: str) -> int:
        """Pick base_q_idx for the next frame of the given type."""
        if not self.target_bitrate:
            raise RuntimeError("select_qi called in CQ mode")
        target = self._frame_target(frame_type)
        self._last_target = target
        qi_f = getattr(self, "_qi", {}).get(frame_type)
        if qi_f is None:
            # initial guess from the power-law prior
            beta = BETA[frame_type]
            scale = float(np.exp(self.log_scale[frame_type]))
            qstep = (self.npx * scale / target) ** (1.0 / beta)
            qi_f = float(np.argmin(np.abs(self._qstep_table - qstep)))
            if not hasattr(self, "_qi"):
                self._qi = {}
            self._qi[frame_type] = qi_f
        return int(np.clip(round(qi_f), self.min_q, self.max_q))

    # -- post-frame update ----------------------------------------------------

    def update(self, frame_type: str, qi: int, actual_bits: int) -> None:
        if not self.target_bitrate:
            return
        self.fullness += self.bits_per_frame - actual_bits
        # clamp fullness to a sane window (avoid runaway)
        self.fullness = float(
            np.clip(self.fullness, 0.0, 2.0 * self.reservoir_target)
        )
        target = getattr(self, "_last_target", self.bits_per_frame)
        ratio = max(actual_bits, 1) / max(target, 1)
        delta = self.GAIN * self.QI_PER_OCTAVE * float(np.log2(ratio))
        # saturated controller was pinned at a clamp: don't wind up further
        cur = self._qi.get(frame_type, float(qi))
        cur = float(np.clip(cur + delta, self.min_q, self.max_q))
        self._qi[frame_type] = cur
        # couple the other frame type loosely (keys are rare; keep its qi
        # tracking the inter operating point with the usual key offset)
        other = "inter" if frame_type == "key" else "key"
        if other in self._qi:
            self._qi[other] += 0.3 * delta
            self._qi[other] = float(np.clip(self._qi[other], self.min_q, self.max_q))

    def twopass_out(self) -> bytes:
        raise NotImplementedError("two-pass lands with the lookahead ring")
