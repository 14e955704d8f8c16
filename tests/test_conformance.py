"""Encode -> libdav1d decode conformance tests: decoded output must equal
the encoder's own reconstruction plane-by-plane (the gate from SURVEY.md
section 4.3; reference analog: src/test_encode_decode/).
"""

import numpy as np
import pytest

from rav1e_tpu.models.intra_frame import IntraFrameEncoder
from rav1e_tpu.obu.headers import (
    FrameParams,
    Sequence,
    temporal_delimiter,
    write_frame_obu,
    write_sequence_header_obu,
)

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def encode_decode(y, u, v, q, adapt=True):
    h, w = y.shape
    fe = IntraFrameEncoder(w, h, q_idx=q, adapt_cdf=adapt)
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)])
    seq = Sequence(width=w, height=h)
    fp = FrameParams(base_q_idx=q, disable_cdf_update=not adapt)
    data = temporal_delimiter() + write_sequence_header_obu(seq) + write_frame_obu(seq, fp, tile)
    dec, meta = dav1d.Dav1dDecoder().decode_packet(data)
    return dec, recon, data


def content(w, h, kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return (
            rng.integers(0, 256, (h, w)).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
        )
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((xx + yy) % 256 + rng.integers(-12, 12, (h, w)), 0, 255).astype(np.uint8)
    u = ((xx[::2, ::2]) % 200 + 20).astype(np.uint8)
    v = ((yy[::2, ::2]) % 180 + 30).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("q", [50, 100, 200, 250])
def test_gradient_64x64(q):
    y, u, v = content(64, 64, "grad", q)
    dec, recon, _ = encode_decode(y, u, v, q)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


@pytest.mark.parametrize("kind", ["grad", "noise"])
def test_multi_sb_128x128(kind):
    y, u, v = content(128, 128, kind, 3)
    dec, recon, _ = encode_decode(y, u, v, 100)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


def test_rect_frame():
    y, u, v = content(192, 64, "grad", 5)
    dec, recon, _ = encode_decode(y, u, v, 120)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


@pytest.mark.parametrize("dims", [(72, 64), (64, 72), (100, 100), (104, 64), (200, 120)])
def test_partial_superblocks(dims):
    """Frames whose dimensions force partial SBs, forced HORZ/VERT
    partitions, mi-grid padding and overhanging edge blocks."""
    w, h = dims
    y, u, v = content(w, h, "noise", w + h)
    dec, recon, _ = encode_decode(y, u, v, 100)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


def test_adaptation_reduces_rate():
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder as FE

    y, u, v = content(128, 128, "grad", 11)
    planes = [y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)]
    t_adapt, _ = FE(128, 128, q_idx=100, adapt_cdf=True).encode(planes)
    t_static, _ = FE(128, 128, q_idx=100, adapt_cdf=False).encode(planes)
    assert len(t_adapt) < len(t_static)


def test_flat_all_skip():
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    v = u.copy()
    dec, recon, data = encode_decode(y, u, v, 250)
    assert len(data) < 40  # all-skip frame is tiny
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8))


def test_recon_quality_sane():
    y, u, v = content(128, 128, "grad", 9)
    dec, recon, data = encode_decode(y, u, v, 80)
    mse = np.mean((recon[0].astype(float) - y.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 33, psnr


def test_10bit_conformance():
    rng = np.random.default_rng(3)
    w, h = 128, 96
    y = rng.integers(0, 1024, (h, w)).astype(np.int32)
    u = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.int32)
    fe = IntraFrameEncoder(w, h, q_idx=100, bit_depth=10, device_modes=False)
    tile, recon = fe.encode([y, u, v])
    seq = Sequence(width=w, height=h, bit_depth=10)
    fp = FrameParams(base_q_idx=100, disable_cdf_update=False)
    data = temporal_delimiter() + write_sequence_header_obu(seq) + write_frame_obu(seq, fp, tile)
    dec, meta = dav1d.Dav1dDecoder().decode_packet(data)
    assert meta[3] == 10
    for i in range(3):
        assert np.array_equal(dec[i].astype(np.int32), recon[i]), f"plane {i}"


def test_fine_directional_conformance():
    """D45/D67/D203 + angle deltas with decoder-exact top-right /
    bottom-left edge availability (blockDecoded analog): streams decode
    bit-exactly and fine search saves bits on diagonal content."""
    rng = np.random.default_rng(7)
    w, h = 192, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx + yy * 1.1) % 24 * 10 + rng.integers(-4, 4, (h, w))).clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    dec, recon, _ = encode_decode(y, u, v, q=110)
    for dp, rp in zip(dec, recon):
        assert np.array_equal(dp.astype(np.int32), rp)
    # deltas must actually be coded on this content
    fe = IntraFrameEncoder(w, h, q_idx=110, device_modes=False)
    deltas = []
    orig = IntraFrameEncoder._choose_delta
    IntraFrameEncoder._choose_delta = lambda self, *a: deltas.append(orig(self, *a)) or deltas[-1]
    try:
        fe.encode([y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)])
    finally:
        IntraFrameEncoder._choose_delta = orig
    assert any(d != 0 for d in deltas), "no nonzero angle delta chosen"


def test_psychovisual_tune_conformance():
    """tune=psychovisual (activity-masked per-block lambda): streams stay
    bit-exact and the lambda map actually varies across blocks."""
    rng = np.random.default_rng(13)
    w, h = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    # half flat, half busy -> distinct activity classes
    y = np.where(xx < 64, 100, rng.integers(0, 255, (h, w))).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    fe = IntraFrameEncoder(w, h, q_idx=100, device_modes=False,
                           tune="psychovisual")
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32)])
    assert fe._lam_map is not None
    assert fe._lam_map.max() / fe._lam_map.min() > 1.5
    seq = Sequence(width=w, height=h)
    fp = FrameParams(base_q_idx=100, disable_cdf_update=False)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for dp, rp in zip(dec, recon):
        assert np.array_equal(dp.astype(np.int32), rp)


def test_12bit_conformance():
    """12-bit (profile 2) keyframes with all in-loop filters decode
    bit-exactly (covers the bd-scaled CDEF damping and 12-bit transforms,
    quantizers and Wiener rounding)."""
    rng = np.random.default_rng(5)
    w, h = 128, 96
    mx = 4095
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 31 + yy * 17) % 3800 + rng.integers(0, 200, (h, w))).clip(0, mx).astype(np.int32)
    u = (2048 + rng.integers(-300, 300, (h // 2, w // 2))).clip(0, mx).astype(np.int32)
    v = (1365 + rng.integers(-300, 300, (h // 2, w // 2))).clip(0, mx).astype(np.int32)
    fe = IntraFrameEncoder(w, h, q_idx=200, bit_depth=12, device_modes=False,
                           lf_levels=(12,) * 4, cdef_damping=5)
    fe.lrf = True
    tile, rec = fe.encode([y.copy(), u.copy(), v.copy()])
    seq = Sequence(width=w, height=h, bit_depth=12, profile=2,
                   enable_cdef=True, enable_restoration=True)
    fp = FrameParams(base_q_idx=200, disable_cdf_update=False,
                     loop_filter_levels=(12,) * 4, cdef_damping=5,
                     cdef_y_strengths=(fe.cdef_strengths[0],),
                     cdef_uv_strengths=(fe.cdef_strengths[1],),
                     frame_restoration_type=(1, 0, 0))
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for dp, rp in zip(dec, rec):
        assert np.array_equal(dp.astype(np.int32), rp)


def test_10bit_cdef_conformance():
    """10-bit with CDEF (bd-scaled damping)."""
    rng = np.random.default_rng(6)
    w, h = 128, 96
    mx = 1023
    y = rng.integers(0, mx + 1, (h, w)).astype(np.int32)
    u = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, mx + 1, (h // 2, w // 2)).astype(np.int32)
    fe = IntraFrameEncoder(w, h, q_idx=180, bit_depth=10, device_modes=False,
                           cdef_damping=5)
    tile, rec = fe.encode([y.copy(), u.copy(), v.copy()])
    seq = Sequence(width=w, height=h, bit_depth=10, enable_cdef=True)
    fp = FrameParams(base_q_idx=180, disable_cdf_update=False, cdef_damping=5,
                     cdef_y_strengths=(fe.cdef_strengths[0],),
                     cdef_uv_strengths=(fe.cdef_strengths[1],))
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for dp, rp in zip(dec, rec):
        assert np.array_equal(dp.astype(np.int32), rp)


def test_8x8_partitions_speed2():
    """Thorough speeds explore 16->8 splits (host RD); piecewise-flat 8px
    patches force them.  Covers 8x8 luma + 4x4 chroma transforms and the
    size-8 partition symbols."""
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    rng = np.random.default_rng(3)
    y = np.repeat(np.repeat(rng.integers(0, 256, (16, 16)), 8, 0), 8,
                  1).astype(np.uint8)
    u = np.full((64, 64), 120, np.uint8)
    v = np.full((64, 64), 136, np.uint8)
    fe = IntraFrameEncoder(128, 128, q_idx=100, speed=2)
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32)])
    seq = Sequence(width=128, height=128)
    fp = FrameParams(base_q_idx=100, disable_cdf_update=False)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"
    assert fe.stats.bsize_counts.get("8x8", 0) > 50, fe.stats.bsize_counts


def _roundtrip_sampling(ss, w, h, q=100, seed=0, speed=6):
    """Encode one keyframe at the given chroma sampling; dav1d decode must
    equal the encoder recon on all planes (reference capability:
    4:2:0/4:2:2/4:4:4, spec profiles 0/2/1)."""
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    rng = np.random.default_rng(seed)
    cw = (w + ss[0]) >> ss[0]
    ch = (h + ss[1]) >> ss[1]
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((xx * 3 + yy * 2) % 256 + rng.integers(-15, 15, (h, w)),
                0, 255).astype(np.int32)
    u = ((np.mgrid[0:ch, 0:cw][1] * 2 + 40) % 220).astype(np.int32)
    v = ((np.mgrid[0:ch, 0:cw][0] * 3 + 90) % 240).astype(np.int32)
    fe = IntraFrameEncoder(w, h, q_idx=q, speed=speed, device_modes=False,
                           chroma_sampling=ss)
    tile, recon = fe.encode([y, u, v])
    prof = 2 if ss == (1, 0) else (1 if ss == (0, 0) else 0)
    seq = Sequence(width=w, height=h, profile=prof,
                   subsampling_x=ss[0], subsampling_y=ss[1])
    fp = FrameParams(base_q_idx=q, disable_cdf_update=False)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


def test_422_intra_conformance():
    """4:2:2 (profile 2): rectangular chroma transforms (8x32, 4x16) and
    the tall-block partition restriction (spec Subsampled_Size maps tall
    16x32/8x16 to BLOCK_INVALID in 4:2:2; right-edge columns must SPLIT)."""
    _roundtrip_sampling((1, 0), 96, 80)
    _roundtrip_sampling((1, 0), 136, 72, q=140)  # 8px partial column
    _roundtrip_sampling((1, 0), 130, 70, q=60)   # odd render size


def test_444_intra_conformance():
    """4:4:4 (profile 1) with partial superblocks (the coefficient-context
    clamp regression: plane ctx updates must use the real subsampling)."""
    _roundtrip_sampling((0, 0), 96, 80)
    _roundtrip_sampling((0, 0), 136, 72, q=140)


def test_422_inter_gop_api():
    """4:2:2 inter GOP through the public API: chroma MC geometry and the
    tall-block restriction on inter frames; decode must be bit-exact."""
    from rav1e_tpu.api.config import Config, EncoderConfig
    from rav1e_tpu.api.context import EncoderError

    from rav1e_tpu.utils.frame import Frame

    w, h = 88, 64
    cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=110,
                                   chroma_sampling=(1, 0), low_latency=False,
                                   max_key_frame_interval=100))
    ctx = cfg.new_context()
    rng = np.random.default_rng(9)
    fs = []
    for t in range(6):
        yy, xx = np.mgrid[0:h, 0:w]
        y = np.clip((xx * 2 + yy + 3 * t) % 256
                    + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
        u = ((xx[:, ::2] + 40 + t) % 220).astype(np.uint8)
        v = ((yy[:, ::2] + 90 + t) % 240).astype(np.uint8)
        fs.append(Frame.from_planes(y, u, v, 8, (1, 0)))
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
        except EncoderError:
            break
    dec = dav1d.decode_stream([p.data for p in pkts])
    shown = [p.input_frameno for p in pkts if p.shows]
    assert sorted(shown) == list(range(6))
    for disp, no in enumerate(shown):
        rec = ctx._encoder.recon_by_input[no]
        for pl in range(3):
            assert np.array_equal(dec[disp][pl].astype(np.int32), rec[pl])


def test_odd_width_edge_partition_trials():
    """Regression: _rd_split's 32->16 trial caches per-child predictions,
    but the real recursion re-splits edge children (frame-edge / 4:2:2
    forced splits), so a later sibling's cached prediction can embed stale
    neighbor recon.  88px width puts the last 32-block astride the frame
    edge; the uv-mode race shifts luma picks toward above-right-reading
    D modes, which exposed the staleness as a decoder mismatch."""
    from rav1e_tpu.api.config import Config, EncoderConfig
    from rav1e_tpu.api.context import EncoderError
    from rav1e_tpu.utils.frame import Frame

    rng = np.random.default_rng(9)
    w, h = 88, 64
    yy, xx = np.mgrid[0:h, 0:w]
    for ss_, q in (((1, 0), 110), ((1, 1), 110), ((1, 1), 80)):
        cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=q,
                                       chroma_sampling=ss_,
                                       low_latency=False,
                                       max_key_frame_interval=100))
        ctx = cfg.new_context()
        cw_ = w >> ss_[0]
        ch_ = h >> ss_[1]
        for t in range(3):
            y = np.clip((xx * 2 + yy + 3 * t) % 256
                        + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
            u = ((np.arange(cw_)[None, :] + 40 + t) % 220
                 * np.ones((ch_, 1))).astype(np.uint8)
            v = ((np.arange(ch_)[:, None] * 2 + 90 + t) % 240
                 * np.ones((1, cw_))).astype(np.uint8)
            ctx.send_frame(Frame.from_planes(y, u, v, 8, ss_))
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderError:
                break
        dec = dav1d.decode_stream([p.data for p in pkts])
        shown = [p.input_frameno for p in pkts if p.shows]
        for disp, no in enumerate(shown):
            rec = ctx._encoder.recon_by_input[no]
            for pl in range(3):
                assert np.array_equal(dec[disp][pl].astype(np.int32),
                                      rec[pl]), (ss_, q, no, pl)
