"""Channel API + C-style API facade (reference analogs: src/api/channel,
src/capi.rs)."""

import numpy as np
import pytest

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def _frames(n, w=64, h=64):
    from rav1e_tpu.utils.frame import Frame

    rng = np.random.default_rng(0)
    out = []
    for t in range(n):
        y = ((np.add.outer(np.arange(h), np.arange(w)) + 3 * t) % 220).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        out.append(Frame.from_planes(y, u, v))
    return out


def test_channel_api():
    from rav1e_tpu.api.channel import new_channel
    from rav1e_tpu.api.config import Config, EncoderConfig

    cfg = Config(enc=EncoderConfig(width=64, height=64, quantizer=120,
                                   low_latency=True))
    tx, rx = new_channel(cfg)
    for f in _frames(4):
        tx.send(f)
    tx.close()
    pkts = list(rx)
    assert len(pkts) == 4
    dec = dav1d.decode_stream([p.data for p in pkts])
    assert len(dec) == 4


def test_capi_roundtrip():
    from rav1e_tpu import capi

    cfg = capi.rav1e_config_default()
    assert capi.rav1e_config_parse(cfg, "width", "64") == 0
    assert capi.rav1e_config_parse(cfg, "height", "64") == 0
    assert capi.rav1e_config_parse(cfg, "quantizer", "120") == 0
    assert capi.rav1e_config_parse(cfg, "low_latency", "1") == 0
    assert capi.rav1e_config_parse(cfg, "bogus_key", "1") < 0
    assert capi.rav1e_config_set_pixel_format(cfg, 8, (1, 1), 0, 0) == 0
    ctx = capi.rav1e_context_new(cfg)
    assert ctx is not None
    hdr = capi.rav1e_container_sequence_header(ctx)
    assert isinstance(hdr, bytes) and hdr
    pkts = []
    for f in _frames(3):
        assert capi.rav1e_send_frame(ctx, f) == 0
        while True:
            st, pkt = capi.rav1e_receive_packet(ctx)
            if st != 0:
                assert st == capi.RA_ENCODER_STATUS_NEED_MORE_DATA
                break
            pkts.append(pkt)
    capi.rav1e_send_frame(ctx, None)  # flush
    while True:
        st, pkt = capi.rav1e_receive_packet(ctx)
        if st != 0:
            break
        pkts.append(pkt)
    assert len(pkts) == 3
    assert capi.rav1e_status_to_str(0) == "success"
    dec = dav1d.decode_stream([p.data for p in pkts])
    assert len(dec) == 3


def test_capi_twopass_roundtrip():
    """C-style two-pass surface: twopass_out/summary on pass 1,
    set_rc_summary installing the blob for pass 2 (reference symbols:
    rav1e_twopass_*, rav1e_rc_*)."""
    from rav1e_tpu import capi

    def mk(bitrate_stats=None):
        cfg = capi.rav1e_config_default()
        for k, v in (("width", "64"), ("height", "64"), ("bitrate", "150000"),
                     ("low_latency", "1"), ("rdo_lookahead_frames", "1")):
            assert capi.rav1e_config_parse(cfg, k, v) == 0
        if bitrate_stats is not None:
            assert capi.rav1e_config_set_rc_summary(cfg, bitrate_stats) == 0
        return cfg, capi.rav1e_context_new(cfg)

    cfg1, ctx1 = mk()
    assert capi.rav1e_rc_second_pass_data_required(ctx1) == 1
    for f in _frames(4):
        capi.rav1e_send_frame(ctx1, f)
        while capi.rav1e_receive_packet(ctx1)[0] == 0:
            pass
    stats = capi.rav1e_rc_receive_pass_data(ctx1)
    assert len(stats) > capi.rav1e_rc_summary_size()
    # corrupt stats must be rejected at install time
    bad_cfg = capi.rav1e_config_default()
    assert capi.rav1e_config_set_rc_summary(bad_cfg, b"XX" + stats[2:]) != 0
    cfg2, ctx2 = mk(stats)
    assert capi.rav1e_rc_second_pass_data_required(ctx2) == 0
    n = 0
    for f in _frames(4):
        capi.rav1e_send_frame(ctx2, f)
        while True:
            st, pkt = capi.rav1e_receive_packet(ctx2)
            if st != 0:
                break
            n += 1
    capi.rav1e_send_frame(ctx2, None)
    while capi.rav1e_receive_packet(ctx2)[0] == 0:
        n += 1
    assert n == 4
