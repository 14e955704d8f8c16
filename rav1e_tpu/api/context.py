"""Public encode context: the send_frame / receive_packet state machine.

Reference analog: src/api/context.rs + src/api/internal.rs (ContextInner).
The semantics replicated here (EncoderStatus protocol, flush via
send_frame(None), packet reordering) are the ones the reference's API tests
assert.  Internals are TPU-first: per-frame device passes batched over
superblocks, host entropy tail.
"""

from __future__ import annotations

import enum
from collections import deque
from dataclasses import dataclass

from rav1e_tpu.api.config import EncoderConfig


class EncoderStatus(enum.Enum):
    NEED_MORE_DATA = "need_more_data"
    ENOUGH_DATA = "enough_data"
    ENCODED = "encoded"
    LIMIT_REACHED = "limit_reached"
    NOT_READY = "not_ready"
    FAILURE = "failure"


class EncoderError(Exception):
    def __init__(self, status: EncoderStatus):
        self.status = status
        super().__init__(status.value)


@dataclass
class Packet:
    data: bytes
    input_frameno: int
    frame_type: str  # "key" | "inter"
    opaque: object = None

    def __repr__(self) -> str:
        return (
            f"Packet(frame {self.input_frameno}, {self.frame_type}, {len(self.data)} bytes)"
        )


class Context:
    """Frame in -> packet out.  Single-pass CQ for now; the orchestration
    ring (lookahead, scenechange, rate control, GOP pyramid) attaches here
    as it lands (see SURVEY.md section 2.2)."""

    def __init__(self, enc: EncoderConfig):
        self.enc = enc
        self.frame_q: deque = deque()
        self.input_frameno = 0
        self.frames_processed = 0
        self.flushing = False
        self.limit: int | None = None
        self._encoder = None  # lazy: models.pipeline.FrameEncoder

    # -- API ---------------------------------------------------------------

    def send_frame(self, frame) -> None:
        """frame: utils.Frame, or None to begin flushing."""
        if frame is None:
            self.flushing = True
            return
        if self.flushing:
            raise EncoderError(EncoderStatus.ENOUGH_DATA)
        self.frame_q.append((self.input_frameno, frame))
        self.input_frameno += 1

    def receive_packet(self) -> Packet:
        if not self.frame_q:
            if self.flushing:
                raise EncoderError(EncoderStatus.LIMIT_REACHED)
            raise EncoderError(EncoderStatus.NEED_MORE_DATA)
        frameno, frame = self.frame_q.popleft()
        packet = self._encode_frame(frameno, frame)
        self.frames_processed += 1
        return packet

    def flush(self) -> None:
        self.send_frame(None)

    def container_sequence_header(self) -> bytes:
        from rav1e_tpu.obu.headers import write_sequence_header_obu

        return write_sequence_header_obu(self._sequence())

    # -- internal ----------------------------------------------------------

    def _sequence(self):
        from rav1e_tpu.obu.headers import Sequence

        return Sequence(
            width=self.enc.width,
            height=self.enc.height,
            bit_depth=self.enc.bit_depth,
            subsampling_x=self.enc.chroma_sampling[0],
            subsampling_y=self.enc.chroma_sampling[1],
            still_picture=self.enc.still_picture,
        )

    def _encode_frame(self, frameno: int, frame) -> Packet:
        if self._encoder is None:
            from rav1e_tpu.models.pipeline import FrameEncoder

            self._encoder = FrameEncoder(self.enc)
            if self.enc.speed_settings.no_scene_detection:
                self._sc = None
            else:
                from rav1e_tpu.api.scenechange import SceneChangeDetector

                self._sc = SceneChangeDetector(
                    bit_depth=self.enc.bit_depth,
                    min_len=self.enc.min_key_frame_interval,
                    max_len=self.enc.max_key_frame_interval,
                )
            if self.enc.bitrate > 0:
                from rav1e_tpu.api.rate import RCState

                num, den = self.enc.time_base
                self._rc = RCState(
                    width=self.enc.width,
                    height=self.enc.height,
                    bit_depth=self.enc.bit_depth,
                    target_bitrate=self.enc.bitrate,
                    fps=den / num,
                    min_q=max(1, self.enc.min_quantizer),
                )
            else:
                self._rc = None
            from rav1e_tpu.api.rate import (
                RCState,
                TwoPassAllocator,
                TwoPassWriter,
                parse_twopass,
            )

            qstep_rc = self._rc
            if qstep_rc is None:
                qstep_rc = RCState(width=self.enc.width, height=self.enc.height,
                                   bit_depth=self.enc.bit_depth,
                                   target_bitrate=0, fps=30.0)
            self._tp_writer = TwoPassWriter(qstep_rc._qstep_table)
            self._tp_alloc = None
            if self.enc.rc_stats is not None:
                if self._rc is None:
                    raise EncoderError(EncoderStatus.FAILURE)
                metrics = parse_twopass(self.enc.rc_stats)
                self._tp_alloc = TwoPassAllocator(metrics, self._rc)
        if self._tp_alloc is not None:
            # pass 2: frame types and targets come from the pass-1 metrics
            ftype = self._tp_alloc.metrics[
                min(frameno, len(self._tp_alloc.metrics) - 1)
            ].frame_type
            q_idx = self._tp_alloc.select_qi()
            data, ftype = self._encoder.encode_frame(frame, frameno, q_idx, ftype)
            self._tp_alloc.update(len(data) * 8)
        else:
            ftype = self._frame_type(frameno, frame)
            q_idx = None
            if self._rc is not None:
                q_idx = self._rc.select_qi(ftype)
            data, ftype = self._encoder.encode_frame(frame, frameno, q_idx, ftype)
            if self._rc is not None:
                self._rc.update(ftype, q_idx, len(data) * 8)
        self._tp_writer.record(ftype, q_idx if q_idx is not None else self.enc.quantizer,
                               len(data) * 8)
        return Packet(data=data, input_frameno=frameno, frame_type=ftype)

    # -- two-pass API (reference analog: twopass_out / rc summary) ----------

    def twopass_out(self) -> bytes:
        """Per-frame pass-1 records accumulated since the last call."""
        return self._tp_writer.out() if self._encoder else b""

    def twopass_summary(self) -> bytes:
        """Summary header to prepend to the stats file after pass 1."""
        if self._encoder is None:
            return b""
        return self._tp_writer.summary()

    def _frame_type(self, frameno: int, frame) -> str:
        if self._sc is None:
            return self._encoder.frame_type_for(frameno)
        is_cut = self._sc.analyze(frame.planes[0].window())
        if frameno == 0 or is_cut:
            return "key"
        return "inter"
