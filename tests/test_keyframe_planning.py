"""Lookahead keyframe planning: scene cuts resolve over the buffered
window with forward validation (reference analog: [SC-Detect] Bwd=/Fwd=
inside compute_keyframe_placement, src/api/internal.rs) — a one-frame
flash must NOT place a keyframe; a persistent scene change must."""

import numpy as np

from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings
from rav1e_tpu.api.context import EncoderError, EncoderStatus
from rav1e_tpu.utils.frame import Frame


def drive(ctx, frames):
    packets = []

    def drain():
        while True:
            try:
                packets.append(ctx.receive_packet())
            except EncoderError as e:
                if e.status in (EncoderStatus.NEED_MORE_DATA,
                                EncoderStatus.LIMIT_REACHED):
                    return
                raise

    for f in frames:
        ctx.send_frame(f)
        drain()
    ctx.flush()
    drain()
    return packets


def make_ctx():
    ss = SpeedSettings.from_preset(9)  # fast scene detection path
    cfg = Config(enc=EncoderConfig(width=64, height=64, quantizer=120,
                                   min_key_frame_interval=2,
                                   max_key_frame_interval=100,
                                   rdo_lookahead_frames=4,
                                   low_latency=True, speed_settings=ss))
    return cfg.new_context()


def scene(level, seed=0):
    rng = np.random.default_rng(seed)
    y = np.clip(level + rng.integers(-4, 4, (64, 64)), 0, 255).astype(
        np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    return Frame.from_planes(y, u, u)


def ftypes(packets):
    return [p.frame_type for p in sorted(packets,
                                         key=lambda p: p.input_frameno)]


def test_flash_does_not_cut():
    # scene A, a single white flash, scene A again: no keyframe at the
    # flash or the return (the fwd validation sees the revert)
    frames = [scene(60, s) for s in range(5)] + [scene(250, 99)] \
        + [scene(60, s + 10) for s in range(5)]
    types = ftypes(drive(make_ctx(), frames))
    assert types[0] == "key"
    assert all(t == "inter" for t in types[1:]), types


def test_real_cut_places_keyframe():
    frames = [scene(60, s) for s in range(6)] \
        + [scene(200, s + 20) for s in range(6)]
    types = ftypes(drive(make_ctx(), frames))
    assert types[0] == "key"
    assert types[6] == "key", types  # the scene change
    assert all(t == "inter" for t in types[1:6] + types[7:]), types


def test_cut_on_last_frame_still_cuts():
    # no forward data at flush: the backward evidence alone decides
    frames = [scene(60, s) for s in range(6)] + [scene(200, 77)]
    types = ftypes(drive(make_ctx(), frames))
    assert types[0] == "key"
    assert types[-1] == "key", types
