"""send_frame / receive_packet state-machine semantics.

Reference analog: src/api/test.rs (~2000 LoC upstream) — these assert the
CONTRACT of the public API: status protocol, keyframe interval handling,
reordering/pts mapping, flush/limit edge cases and the two-pass protocol
errors.  SURVEY.md section 4.2 calls these the semantics to port first."""

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings
from rav1e_tpu.api.context import EncoderError, EncoderStatus
from rav1e_tpu.utils.frame import Frame

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def frames(n, w=64, h=64, cut_at=None, seed=0):
    """n flat-ish frames; from cut_at on, completely different content
    (a hard scene cut)."""
    rng = np.random.default_rng(seed)
    noise_b = rng.integers(-8, 8, (h, w))
    out = []
    for t in range(n):
        if cut_at is not None and t >= cut_at:
            # a coherent NEW scene (inverted diagonal + static texture)
            y = np.clip(255 - (np.add.outer(np.arange(h), np.arange(w)) * 3
                               + 2 * t) % 230 + noise_b, 0, 255).astype(np.uint8)
        else:
            y = ((np.add.outer(np.arange(h), np.arange(w)) + 2 * t) % 200
                 ).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        out.append(Frame.from_planes(y, u, v))
    return out


def ctx_for(**kw):
    kw.setdefault("width", 64)
    kw.setdefault("height", 64)
    kw.setdefault("quantizer", 120)
    return Config(enc=EncoderConfig(**kw)).new_context()


def drive(ctx, fs):
    pkts = []
    for f in fs:
        ctx.send_frame(f)
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderError:
                break
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderError as e:
            assert e.status == EncoderStatus.LIMIT_REACHED
            break
    return pkts


def test_need_more_data_before_any_frame():
    ctx = ctx_for(low_latency=True)
    with pytest.raises(EncoderError) as ei:
        ctx.receive_packet()
    assert ei.value.status == EncoderStatus.NEED_MORE_DATA


def test_limit_reached_after_flush_drain():
    ctx = ctx_for(low_latency=True)
    pkts = drive(ctx, frames(3))
    assert len(pkts) == 3
    # once LIMIT_REACHED, it stays LIMIT_REACHED
    with pytest.raises(EncoderError) as ei:
        ctx.receive_packet()
    assert ei.value.status == EncoderStatus.LIMIT_REACHED


def test_enough_data_when_sending_after_flush():
    ctx = ctx_for(low_latency=True)
    ctx.send_frame(frames(1)[0])
    ctx.flush()
    with pytest.raises(EncoderError) as ei:
        ctx.send_frame(frames(1)[0])
    assert ei.value.status == EncoderStatus.ENOUGH_DATA


def test_max_keyframe_interval_forces_keys():
    n = 9
    ctx = ctx_for(low_latency=True, max_key_frame_interval=4,
                  min_key_frame_interval=1)
    pkts = drive(ctx, frames(n))
    keys = [p.input_frameno for p in pkts if p.frame_type == "key"]
    assert 0 in keys
    # a key at least every 4 frames
    shown = sorted(p.input_frameno for p in pkts if p.shows)
    assert shown == list(range(n))
    for a, b in zip(keys, keys[1:]):
        assert b - a <= 4


def test_min_keyframe_interval_suppresses_cut():
    """A hard scene cut right after a keyframe must not start a new key
    within min_key_frame_interval (reference: detector min_len gate)."""
    n = 6
    ctx = ctx_for(low_latency=True, min_key_frame_interval=6,
                  max_key_frame_interval=100,
                  speed_settings=SpeedSettings.from_preset(6))
    pkts = drive(ctx, frames(n, cut_at=2))
    keys = [p.input_frameno for p in pkts if p.frame_type == "key"]
    assert keys == [0], keys


def test_scenecut_starts_key():
    n = 10
    ctx = ctx_for(low_latency=True, min_key_frame_interval=1,
                  max_key_frame_interval=100)
    pkts = drive(ctx, frames(n, cut_at=5))
    keys = [p.input_frameno for p in pkts if p.frame_type == "key"]
    assert keys[0] == 0
    assert 5 in keys, keys


def test_reordered_pyramid_pts_mapping():
    """Non-low-latency: packets arrive in coding order (no-show ALT/BWD
    first), every input frameno is emitted exactly once as a *shown*
    temporal unit, and the decoded stream length matches the display
    count."""
    n = 9
    ctx = ctx_for(low_latency=False, max_key_frame_interval=100,
                  min_key_frame_interval=1)
    pkts = drive(ctx, frames(n))
    shown = [p.input_frameno for p in pkts if p.shows]
    assert sorted(shown) == list(range(n))
    assert shown == sorted(shown), "display order must be input order"
    noshow = [p for p in pkts if not p.shows]
    assert noshow, "pyramid should code no-show refs"
    dec = dav1d.decode_stream([p.data for p in pkts])
    assert len(dec) == n


def test_recon_matches_decode_reordered():
    n = 6
    ctx = ctx_for(low_latency=False, max_key_frame_interval=100)
    pkts = drive(ctx, frames(n))
    dec = dav1d.decode_stream([p.data for p in pkts])
    shown = [p.input_frameno for p in pkts if p.shows]
    for disp, no in enumerate(shown):
        rec = ctx._encoder.recon_by_input[no]
        for pl in range(3):
            assert np.array_equal(dec[disp][pl].astype(np.int32), rec[pl])


def test_flush_mid_group_emits_all():
    """Flushing with a partial sub-GOP queued must still emit every
    frame."""
    for n in (1, 2, 3, 5, 7):
        ctx = ctx_for(low_latency=False, max_key_frame_interval=100)
        pkts = drive(ctx, frames(n))
        shown = sorted(p.input_frameno for p in pkts if p.shows)
        assert shown == list(range(n)), (n, shown)


def test_still_picture_single_frame():
    ctx = ctx_for(still_picture=True, low_latency=True)
    pkts = drive(ctx, frames(1))
    assert len(pkts) == 1 and pkts[0].frame_type == "key"
    dec = dav1d.decode_stream([p.data for p in pkts])
    assert len(dec) == 1


def test_invalid_config_rejected():
    from rav1e_tpu.api.config import InvalidConfig

    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(width=0, height=64)).new_context()
    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(width=64, height=64,
                                 min_key_frame_interval=10,
                                 max_key_frame_interval=5)).new_context()
    with pytest.raises(InvalidConfig):
        # switch frames require the low-latency regime
        Config(enc=EncoderConfig(width=64, height=64,
                                 switch_frame_interval=2,
                                 low_latency=False)).new_context()


def test_twopass_protocol_errors():
    from rav1e_tpu.api.rate import parse_twopass

    ctx = ctx_for(low_latency=True, bitrate=200_000)
    pkts = drive(ctx, frames(4))
    assert len(pkts) == 4
    stats = ctx.twopass_summary() + ctx.twopass_out()
    assert stats
    metrics = parse_twopass(stats)
    assert len(metrics) == 4
    # magic / version / truncation must all be rejected
    bad_magic = b"XXXX" + stats[4:]
    with pytest.raises(Exception):
        parse_twopass(bad_magic)
    with pytest.raises(Exception):
        parse_twopass(stats[: len(stats) // 2])


def test_twopass_roundtrip_drives_pass2():
    ctx = ctx_for(low_latency=True, bitrate=150_000)
    pkts1 = drive(ctx, frames(6, seed=3))
    stats = ctx.twopass_summary() + ctx.twopass_out()
    ctx2 = ctx_for(low_latency=True, bitrate=150_000, rc_stats=stats)
    pkts2 = drive(ctx2, frames(6, seed=3))
    assert len(pkts2) == 6
    assert [p.frame_type for p in pkts2] == [p.frame_type for p in pkts1]


def test_packet_metadata():
    ctx = ctx_for(low_latency=True)
    pkts = drive(ctx, frames(2))
    assert pkts[0].frame_type == "key"
    assert pkts[0].input_frameno == 0
    assert pkts[1].input_frameno == 1
    assert all(isinstance(p.data, bytes) and p.data for p in pkts)


def test_lookahead_queue_discipline():
    """receive_packet returns NEED_MORE_DATA until rdo_lookahead_frames
    are queued (reference: the lookahead queue in ContextInner), and
    send_frame applies ENOUGH_DATA backpressure at the queue bound."""
    ctx = ctx_for(low_latency=True, rdo_lookahead_frames=5)
    fs = frames(16)
    for i in range(4):
        ctx.send_frame(fs[i])
        with pytest.raises(EncoderError) as ei:
            ctx.receive_packet()
        assert ei.value.status == EncoderStatus.NEED_MORE_DATA, i
    ctx.send_frame(fs[4])
    pkt = ctx.receive_packet()  # lookahead full: encoding starts
    assert pkt.input_frameno == 0
    # backpressure: the queue is bounded
    sent = 5
    with pytest.raises(EncoderError) as ei:
        for i in range(5, 16):
            ctx.send_frame(fs[i])
            sent += 1
    assert ei.value.status == EncoderStatus.ENOUGH_DATA
    # draining packets makes room again
    ctx.receive_packet()
    ctx.send_frame(fs[sent - 1])


def test_container_sequence_header():
    ctx = ctx_for(low_latency=True)
    hdr = ctx.container_sequence_header()
    assert isinstance(hdr, bytes) and len(hdr) > 4


def test_multiref_long_gop_decode_exact():
    """Three pyramid groups so LAST2 (previous group's base) and GOLDEN
    (pinned keyframe slot 7) genuinely differ from LAST/ALTREF; every
    shown frame must still decode bit-exactly (reference analog: the
    GOLDEN/LAST2 slot management in src/api/internal.rs)."""
    n = 13
    ctx = ctx_for(width=96, height=80, low_latency=False,
                  max_key_frame_interval=100, min_key_frame_interval=1)
    fs = frames(n, w=96, h=80, seed=3)
    pkts = drive(ctx, fs)
    assert ctx._encoder.prev_base_slot is not None
    dec = dav1d.decode_stream([p.data for p in pkts])
    shown = [p.input_frameno for p in pkts if p.shows]
    assert sorted(shown) == list(range(n))
    for disp, no in enumerate(shown):
        rec = ctx._encoder.recon_by_input[no]
        for pl in range(3):
            assert np.array_equal(dec[disp][pl].astype(np.int32), rec[pl])


def test_multiref_off_collapses_to_last():
    """multiref=False (reference SpeedSettings) must still produce a
    decodable stream using LAST only."""
    from rav1e_tpu.api.config import SpeedSettings

    ss = SpeedSettings.from_preset(6)
    ss.multiref = False
    ctx = ctx_for(low_latency=False, max_key_frame_interval=100,
                  speed_settings=ss)
    pkts = drive(ctx, frames(9))
    dec = dav1d.decode_stream([p.data for p in pkts])
    assert len(dec) == 9
