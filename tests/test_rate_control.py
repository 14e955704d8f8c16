"""Rate control + scene detection behavior tests (reference analog: the
rate/keyframe assertions of src/api/test.rs)."""

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig
from rav1e_tpu.utils.frame import Frame


def clip(w, h, n, cut_at=None, seed=0):
    """Smooth panning scene; after cut_at, a visually different scene."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 64, 0 : w + 64]
    base1 = np.clip((xx + yy) % 200 + rng.integers(-6, 6, xx.shape), 0, 255).astype(np.uint8)
    base2 = np.clip(255 - (2 * xx - yy) % 180 + rng.integers(-6, 6, xx.shape), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        src = base2 if (cut_at is not None and t >= cut_at) else base1
        y = src[t : t + h, 2 * t : 2 * t + w]
        u = src[: h // 2, : w // 2]
        v = src[1 : 1 + h // 2, 1 : 1 + w // 2]
        frames.append(Frame.from_planes(y, u, v))
    return frames


def encode_all(cfg, frames):
    from tests.test_inter_conformance import drive

    ctx = Config(enc=cfg).new_context()
    return drive(ctx, frames)


def test_bitrate_convergence():
    """ABR mode must land near the requested bitrate over a short clip."""
    w, h, fps, n = 192, 128, 30, 24
    target = 400_000  # 400 kbps
    cfg = EncoderConfig(width=w, height=h, bitrate=target, time_base=(1, fps),
                        max_key_frame_interval=60)
    pkts = encode_all(cfg, clip(w, h, n, seed=3))
    total_bits = sum(len(p.data) for p in pkts) * 8
    achieved = total_bits * fps / n
    assert 0.5 * target < achieved < 1.8 * target, achieved


def test_scenecut_forces_keyframe():
    w, h = 128, 96
    cfg = EncoderConfig(width=w, height=h, quantizer=120,
                        min_key_frame_interval=4, max_key_frame_interval=100)
    pkts = encode_all(cfg, clip(w, h, 16, cut_at=8, seed=1))
    # packets arrive in coding order; map frame types by input frameno
    ftype = {}
    for p in pkts:
        ftype.setdefault(p.input_frameno, p.frame_type)
    assert ftype[0] == "key"
    assert ftype[8] == "key", ftype
    assert ftype[1] == "inter" and ftype[9] == "inter"


def test_max_interval_respected():
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, quantizer=150,
                        min_key_frame_interval=2, max_key_frame_interval=6)
    pkts = encode_all(cfg, clip(w, h, 14, seed=2))
    ftype = {}
    for p in pkts:
        ftype.setdefault(p.input_frameno, p.frame_type)
    assert ftype[0] == "key"
    assert "key" in [ftype[i] for i in range(1, 8)], ftype


def test_rc_state_monotonic():
    """Higher bitrate target must never select a higher quantizer."""
    from rav1e_tpu.api.rate import RCState

    qs = []
    for rate in (100_000, 500_000, 2_000_000):
        rc = RCState(width=320, height=240, bit_depth=8,
                     target_bitrate=rate, fps=30)
        qs.append(rc.select_qi("key"))
    assert qs[0] >= qs[1] >= qs[2], qs


def test_two_pass():
    """Pass 1 records complexity; pass 2 must hit the rate at least as
    accurately as single-pass ABR and validate the stats format."""
    from rav1e_tpu.api.rate import TwoPassError, parse_twopass

    w, h, fps, n = 160, 96, 30, 16
    target = 300_000
    frames = clip(w, h, n, cut_at=8, seed=5)
    # pass 1 at CQ
    cfg1 = EncoderConfig(width=w, height=h, quantizer=120,
                         min_key_frame_interval=2, low_latency=True,
                         rdo_lookahead_frames=1)
    ctx1 = Config(enc=cfg1).new_context()
    for f in frames:
        ctx1.send_frame(f)
        ctx1.receive_packet()
    stats = ctx1.twopass_summary() + ctx1.twopass_out()
    # format validation
    with pytest.raises(TwoPassError):
        parse_twopass(b"XXXX" + stats[4:])
    with pytest.raises(TwoPassError):
        parse_twopass(stats[:10])
    metrics = parse_twopass(stats)
    assert len(metrics) == n
    assert metrics[0].frame_type == "key"
    # pass 2
    cfg2 = EncoderConfig(width=w, height=h, bitrate=target, time_base=(1, fps),
                         min_key_frame_interval=2, rc_stats=stats,
                         low_latency=True, rdo_lookahead_frames=1)
    ctx2 = Config(enc=cfg2).new_context()
    bits = []
    types = []
    for f in frames:
        ctx2.send_frame(f)
        p = ctx2.receive_packet()
        bits.append(len(p.data) * 8)
        types.append(p.frame_type)
    achieved = sum(bits) * fps / n
    assert types[8] == "key"  # scene cut carried from pass 1
    assert 0.55 * target < achieved < 1.7 * target, achieved


def test_error_resilient_mode():
    """Error-resilient streams reset CDFs per frame (no primary ref) and
    must stay decodable."""
    import pytest
    dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")
    from tests.test_inter_conformance import run_clip, moving_content

    run_clip(moving_content(96, 64, 4, dx=2, dy=1), q=140,
             error_resilient=True, low_latency=True)


def test_lookahead_importance_and_deblock_search():
    """Temporal-RDO importances engage for pyramid groups and the
    speed<=5 deblock level search stays conformant end-to-end."""
    import rav1e_tpu.models.lookahead as la
    from rav1e_tpu.api.config import SpeedSettings
    from tests.test_inter_conformance import moving_content, run_clip

    calls = {"n": 0}
    orig = la.propagate_importance
    def probe(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)
    la.propagate_importance = probe
    try:
        run_clip(moving_content(128, 96, 6), q=120,
                 speed_settings=SpeedSettings.from_preset(5))
    finally:
        la.propagate_importance = orig
    assert calls["n"] >= 1


def test_standard_scene_detection():
    """Standard (MC inter-vs-intra cost) scene detection flags a hard cut
    and stays quiet on continuous motion."""
    import numpy as np
    from rav1e_tpu.api.scenechange import SceneChangeDetector

    rng = np.random.default_rng(2)
    det = SceneChangeDetector(min_len=2, max_len=999, fast=False)
    yy, xx = np.mgrid[0:96, 0:128]
    cuts = []
    for t in range(8):
        if t < 5:
            y = ((xx + yy + 3 * t) % 200).astype(np.uint8)  # pan
        else:
            y = rng.integers(0, 255, (96, 128)).astype(np.uint8)  # new scene
        cuts.append(det.analyze(y))
    assert cuts[0] is True        # first frame
    assert not any(cuts[1:5])     # smooth pan: no cuts
    assert cuts[5]                # hard cut detected
