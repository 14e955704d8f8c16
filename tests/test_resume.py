"""GOP-shard checkpoint/resume + per-segment retry (api/resume.py).

The reference encoder restarts only from scratch (SURVEY section 5); these
tests cover the new-design requirements: a killed encode resumes at the
last completed keyframe segment with byte-identical output, and a
transient per-segment failure is retried on a fresh context.
"""

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings
from rav1e_tpu.api.resume import ShardedEncodeSession
from rav1e_tpu.utils.frame import Frame

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def _clip(n=9, w=96, h=64, cuts=(3, 6)):
    """Synthetic clip with hard scene cuts at the given frame indices."""
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    scene = 0
    for t in range(n):
        if t in cuts:
            scene += 1
        y = np.clip((xx * (scene + 1) + yy + 2 * t) % 256
                    + rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + 40 * scene, np.uint8)
        v = np.full((h // 2, w // 2), 160 - 30 * scene, np.uint8)
        frames.append(Frame.from_planes(y, u, v))
    return frames


def _cfg(**kw):
    ss = SpeedSettings.from_preset(8)
    args = dict(width=96, height=64, quantizer=120, low_latency=True,
                min_key_frame_interval=1, speed_settings=ss)
    args.update(kw)
    return Config(enc=EncoderConfig(**args))


def _source(frames):
    return lambda i: frames[i] if i < len(frames) else None


def test_resume_after_kill_byte_identical(tmp_path):
    frames = _clip()
    # uninterrupted run
    s1 = ShardedEncodeSession(_cfg(), tmp_path / "full", _source(frames))
    n1 = s1.run()
    assert n1 >= 2, "expected multiple keyframe segments"
    full = s1.assemble()

    # interrupted run: second segment blows up (retries exhausted)
    boom = {"armed": True}
    s2 = ShardedEncodeSession(_cfg(), tmp_path / "part", _source(frames),
                              retries=0)
    orig = ShardedEncodeSession._encode_segment

    def failing(self, seg_frames):
        if boom["armed"] and len(self.segments) == 1:
            raise RuntimeError("injected device failure")
        return orig(self, seg_frames)

    ShardedEncodeSession._encode_segment = failing
    try:
        with pytest.raises(RuntimeError):
            s2.run()
    finally:
        ShardedEncodeSession._encode_segment = orig
    assert len(s2.segments) == 1  # first shard persisted

    # a fresh session over the same workdir resumes and completes
    boom["armed"] = False
    s3 = ShardedEncodeSession(_cfg(), tmp_path / "part", _source(frames))
    assert len(s3.segments) == 1  # manifest picked up
    s3.run()
    assert s3.assemble() == full

    # and the stream decodes
    dec = dav1d.decode_stream(s3.packets())
    assert len(dec) == len(frames)


def test_segment_retry_recovers(tmp_path):
    frames = _clip(n=5, cuts=(2,))
    calls = {"n": 0}
    orig = ShardedEncodeSession._encode_segment

    def flaky(self, seg_frames):
        calls["n"] += 1
        if calls["n"] == 2:  # transient failure on the first segment retryable
            raise RuntimeError("transient")
        return orig(self, seg_frames)

    s_ref = ShardedEncodeSession(_cfg(), tmp_path / "ref", _source(frames))
    s_ref.run()

    ShardedEncodeSession._encode_segment = flaky
    try:
        s = ShardedEncodeSession(_cfg(), tmp_path / "flaky", _source(frames),
                                 retries=1)
        s.run()
    finally:
        ShardedEncodeSession._encode_segment = orig
    assert s.assemble() == s_ref.assemble()


def test_bitrate_rc_state_carried(tmp_path):
    frames = _clip(n=9, cuts=(3, 6))
    cfg = _cfg(quantizer=255, bitrate=400_000)
    s = ShardedEncodeSession(cfg, tmp_path / "abr", _source(frames))
    s.run()
    assert len(s.segments) >= 2
    assert s.segments[0]["rc_state"], "RC snapshot missing from manifest"
    # resumed continuation equals the uninterrupted sharded run
    s2 = ShardedEncodeSession(cfg, tmp_path / "abr2", _source(frames))
    orig = ShardedEncodeSession._encode_segment
    state = {"stop": True}

    def stop_after_first(self, seg_frames):
        if state["stop"] and len(self.segments) == 1:
            raise RuntimeError("preempted")
        return orig(self, seg_frames)

    ShardedEncodeSession._encode_segment = stop_after_first
    try:
        with pytest.raises(RuntimeError):
            s2.run()
    finally:
        ShardedEncodeSession._encode_segment = orig
    state["stop"] = False
    s3 = ShardedEncodeSession(cfg, tmp_path / "abr2", _source(frames))
    s3.run()
    assert s3.assemble() == s.assemble()
