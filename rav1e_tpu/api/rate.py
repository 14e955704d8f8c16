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

    # -- pyramid quantizers ---------------------------------------------------

    # per-level qstep offsets in octaves around the group base selection
    # (reference analog: the per-pyramid-level quantizer derivation in
    # src/rate.rs select_qi; deeper references get finer quantizers)
    PYR_ALT_OCT = -0.18
    PYR_MID_OCT = -0.09
    PYR_LEAF_OCT = 0.09

    @classmethod
    def group_qis(cls, q0: int, min_q: int = 1, max_q: int = 255) -> tuple:
        """(q_alt, q_mid, q_leaf) for a pyramid sub-GOP coded around base
        selection q0, spaced in octaves on the qstep curve rather than
        fixed qi deltas (so the ladder scales with the operating point)."""
        def at(oct_):
            return int(np.clip(round(q0 + oct_ * cls.QI_PER_OCTAVE),
                               min_q, max_q))

        return at(cls.PYR_ALT_OCT), at(cls.PYR_MID_OCT), at(cls.PYR_LEAF_OCT)

    def update_group(self, frame_type: str, n: int, total_bits: int) -> None:
        """One controller step for an n-frame pyramid group coded around the
        group's base selection: the reservoir absorbs every frame, the
        integral controller steps once on the group mean."""
        if not self.target_bitrate:
            return
        target = getattr(self, "_last_target", self.bits_per_frame)
        self.fullness += n * self.bits_per_frame - total_bits
        self.fullness = float(np.clip(self.fullness, 0.0, 2.0 * self.reservoir_target))
        ratio = max(total_bits / max(1, n), 1) / max(target, 1)
        delta = self.GAIN * self.QI_PER_OCTAVE * float(np.log2(ratio))
        cur = self._qi.get(frame_type, 128.0)
        self._qi[frame_type] = float(np.clip(cur + delta, self.min_q, self.max_q))


# -- two-pass ---------------------------------------------------------------
#
# Reference analog: src/rate.rs twopass_out/twopass_in (per-TU RCFrameMetrics
# + magic/version-validated summary).  Pass 1 records per-frame complexity
# (bits at the known quantizer -> a q-independent scale); pass 2 distributes
# the bit budget proportionally to each frame's scale share.

TWOPASS_MAGIC = b"RVTP"
TWOPASS_VERSION = 1
FRAME_REC_SIZE = 13  # type(1) + qi(1) + bits(8) + reserved(3)
SUMMARY_SIZE = 4 + 2 + 4 + 8 + 8  # magic, version, frames, key scale, inter scale


@dataclass
class FrameMetrics:
    frame_type: str
    qi: int
    bits: int

    def scale(self, qstep_table) -> float:
        return self.bits * float(qstep_table[self.qi]) ** BETA[self.frame_type]

    def pack(self) -> bytes:
        t = 0 if self.frame_type == "key" else 1
        return bytes([t, self.qi]) + int(self.bits).to_bytes(8, "little") + b"\0" * 3

    @classmethod
    def unpack(cls, b: bytes) -> "FrameMetrics":
        return cls("key" if b[0] == 0 else "inter", b[1],
                   int.from_bytes(b[2:10], "little"))


class TwoPassWriter:
    """Pass-1 stats collection (the twopass_out side)."""

    def __init__(self, qstep_table):
        self.frames: list = []
        self._qstep = qstep_table
        self._pending: list = []

    def record(self, frame_type: str, qi: int, bits: int) -> None:
        m = FrameMetrics(frame_type, qi, bits)
        self.frames.append(m)
        self._pending.append(m.pack())

    def out(self) -> bytes:
        """Per-frame records accumulated since the last call."""
        d = b"".join(self._pending)
        self._pending.clear()
        return d

    def summary(self) -> bytes:
        key_scale = sum(m.scale(self._qstep) for m in self.frames if m.frame_type == "key")
        inter_scale = sum(m.scale(self._qstep) for m in self.frames if m.frame_type != "key")
        out = TWOPASS_MAGIC
        out += TWOPASS_VERSION.to_bytes(2, "little")
        out += len(self.frames).to_bytes(4, "little")
        out += int(key_scale).to_bytes(8, "little")
        out += int(inter_scale).to_bytes(8, "little")
        return out


class TwoPassError(ValueError):
    pass


def parse_twopass(data: bytes) -> list:
    """Validate + parse a pass-1 stats blob (summary + frame records).
    Raises TwoPassError with reference-style diagnostics."""
    if len(data) < SUMMARY_SIZE:
        raise TwoPassError("First-pass stats data not retrieved or not enough data")
    if data[:4] != TWOPASS_MAGIC:
        raise TwoPassError("Magic value mismatch")
    version = int.from_bytes(data[4:6], "little")
    if version != TWOPASS_VERSION:
        raise TwoPassError("Version number mismatch")
    nframes = int.from_bytes(data[6:10], "little")
    if nframes <= 0:
        raise TwoPassError("No TUs found in first pass summary")
    body = data[SUMMARY_SIZE:]
    if len(body) < nframes * FRAME_REC_SIZE:
        raise TwoPassError("More TUs than frames provided")
    return [
        FrameMetrics.unpack(body[i * FRAME_REC_SIZE : (i + 1) * FRAME_REC_SIZE])
        for i in range(nframes)
    ]


class TwoPassAllocator:
    """Pass-2 quantizer selection from pass-1 metrics: per-frame bit targets
    proportional to complexity share, with a drift-correcting reservoir."""

    def __init__(self, metrics: list, rc: "RCState"):
        self.metrics = metrics
        self.rc = rc
        self.total_budget = rc.bits_per_frame * len(metrics)
        scales = [m.scale(rc._qstep_table) for m in metrics]
        total = sum(scales) or 1.0
        self.targets = [self.total_budget * s / total for s in scales]
        self.idx = 0
        self.drift = 0.0  # spent - targeted so far

    def select_qi(self) -> int:
        m = self.metrics[self.idx]
        target = self.targets[self.idx]
        # correct accumulated drift over the remaining frames
        remaining = max(1, len(self.metrics) - self.idx)
        target = max(target - self.drift / remaining, self.rc.bits_per_frame * 0.05)
        beta = BETA[m.frame_type]
        scale = m.scale(self.rc._qstep_table)
        qstep = (scale / max(target, 1.0)) ** (1.0 / beta)
        qi = int(np.argmin(np.abs(self.rc._qstep_table - qstep)))
        self._last_target = target
        return int(np.clip(qi, self.rc.min_q, self.rc.max_q))

    def update(self, actual_bits: int) -> None:
        self.drift += actual_bits - self._last_target
        self.idx = min(self.idx + 1, len(self.metrics) - 1)
