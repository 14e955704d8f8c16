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
