"""Device wavefront encode conformance (models/wavefront.py).

The whole intra datapath (mode/partition decisions, transforms, recon)
runs on device; the host replays the chosen symbols.  Gate: libdav1d
decode == device reconstruction, across tile grids, partial superblocks
(the host/device interleave and the zone-1 mode restriction), speeds and
segmentation.  Sizes are >= 320x240 so the wavefront path engages
(device_modes auto threshold)."""

import numpy as np
import pytest

from rav1e_tpu.models.intra_frame import IntraFrameEncoder
from rav1e_tpu.obu.headers import (FrameParams, Sequence, temporal_delimiter,
                                   write_frame_obu, write_sequence_header_obu)

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def content(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((xx * 3 + yy * 2) % 256 + rng.integers(-15, 15, (h, w)),
                0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + 40) % 220).astype(np.uint8)
    v = ((yy[::2, ::2] + 90) % 240).astype(np.uint8)
    return y, u, v


def roundtrip(w, h, q=100, seed=0, speed=6, tiles=(0, 0), seg=()):
    y, u, v = content(w, h, seed)
    fe = IntraFrameEncoder(w, h, q_idx=q, speed=speed, device_modes=True,
                           tile_cols_log2=tiles[0], tile_rows_log2=tiles[1],
                           seg_deltas=seg)
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32)])
    seq = Sequence(width=w, height=h)
    fp = FrameParams(base_q_idx=q, disable_cdf_update=False,
                     tile_cols_log2=tiles[0], tile_rows_log2=tiles[1],
                     seg_deltas=fe.seg_deltas)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"
    return fe


def test_wavefront_engages():
    fe = roundtrip(320, 256, q=100, seed=1)
    # the wavefront path leaves its bool split map behind
    assert isinstance(fe._rd_maps["split32"], np.ndarray)
    assert fe._rd_maps["split32"].dtype == np.bool_


@pytest.mark.parametrize("q", [60, 140, 230])
def test_wavefront_quantizers(q):
    roundtrip(320, 256, q=q, seed=q)


def test_wavefront_partial_superblocks():
    """Partial right column AND bottom row: device/host interleave in the
    BlockCache, zone-1 mode restriction on the last device column."""
    roundtrip(330, 250, q=110, seed=3)


def test_wavefront_partial_row_only():
    roundtrip(320, 250, q=110, seed=4)


def test_wavefront_tiles():
    roundtrip(384, 256, q=120, seed=5, tiles=(1, 1))


@pytest.mark.parametrize("speed", [3, 8, 10])
def test_wavefront_speeds(speed):
    roundtrip(320, 256, q=100, seed=speed, speed=speed)


def test_wavefront_segmentation():
    roundtrip(320, 256, q=120, seed=7, seg=(-8, -3, 2, 7))


def test_wavefront_split8_engages():
    """Speed <= 3 runs the nested 16->8 partition RD on device; on busy
    content at moderate q some 16-leaves must split to 8x8 and the
    resulting stream must stay decoder-exact (reference analog:
    rdo_partition_decision recursing to BLOCK_8X8, src/rdo.rs)."""
    fe = roundtrip(320, 256, q=80, seed=11, speed=2)
    assert fe.rdo_split8
    sm16 = fe._rd_maps.get("split16")
    assert sm16 is not None and sm16.any(), "no 8x8 splits chosen"


def test_wavefront_split8_partial_superblocks():
    """8x8 device leaves interleaved with host partial-edge SBs."""
    fe = roundtrip(330, 250, q=80, seed=12, speed=2)
    assert fe.rdo_split8


def _encode_keyframes(w, h, n, batch_on, q=90):
    """All-key encode through the Context (exercises the prefetch path);
    batch_on=False forces the single-frame prefetch."""
    from rav1e_tpu.api.config import Config, EncoderConfig
    from rav1e_tpu.utils.frame import Frame
    import rav1e_tpu.models.pipeline as PL

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = np.clip(((xx * 2 + yy + 13 * t) % 256).astype(np.int16)
                    + rng.integers(-16, 16, (h, w)), 0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] + 40 + t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] + 90 + 2 * t) % 256).astype(np.uint8)
        frames.append(Frame.from_planes(y, u, v))
    cfg = Config(enc=EncoderConfig(
        width=w, height=h, quantizer=q, min_key_frame_interval=1,
        max_key_frame_interval=1, rdo_lookahead_frames=1, low_latency=True))
    ctx = cfg.new_context()
    orig = PL.FrameEncoder.prefetch_key_frames
    if not batch_on:
        PL.FrameEncoder.prefetch_key_frames = (
            lambda self, frs, q_idx=None: self.prefetch_key_frame(
                frs[0], q_idx))
    try:
        for f in frames:
            ctx.send_frame(f)
        return [ctx.receive_packet().data for _ in frames]
    finally:
        PL.FrameEncoder.prefetch_key_frames = orig


def test_batched_keyframes_match_single():
    """The multi-frame batched wavefront (stacked planes, F*B lanes) must
    produce byte-identical bitstreams to per-frame launches."""
    import rav1e_tpu.models.wavefront as WF

    orig = WF.launch_wavefront_batch
    calls = []

    def probe(fes, tiles):
        r = orig(fes, tiles)
        calls.append((len(fes), r is not None))
        return r

    WF.launch_wavefront_batch = probe
    try:
        batched = _encode_keyframes(320, 256, 5, True)
    finally:
        WF.launch_wavefront_batch = orig
    assert calls and calls[0][0] >= 2 and calls[0][1], calls  # batch engaged
    single = _encode_keyframes(320, 256, 5, False)
    assert batched == single


def test_int8_escape_refetch():
    """Levels beyond int8 (very low q, harsh content) must take the
    escape path: the int16 records are refetched and the stream still
    decodes bit-exactly."""
    from rav1e_tpu.models import wavefront as wfm

    w, h = 320, 256
    rng = np.random.default_rng(3)
    # checkerboard impulses: huge DCT coefficients at q=2
    y = (((np.add.outer(np.arange(h), np.arange(w)) % 2) * 255)
         .astype(np.uint8))
    y[rng.integers(0, h, 500), rng.integers(0, w, 500)] = 0
    u = np.full((h // 2, w // 2), 20, np.uint8)
    v = np.full((h // 2, w // 2), 235, np.uint8)
    before = wfm.ESC_REFETCHES
    fe = IntraFrameEncoder(w, h, q_idx=2, device_modes=True)
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32)])
    assert wfm.ESC_REFETCHES > before, "escape path never engaged"
    seq = Sequence(width=w, height=h)
    fp = FrameParams(base_q_idx=2, disable_cdf_update=False)
    fp.loop_filter_levels = fe.lf_levels
    data = temporal_delimiter() + write_sequence_header_obu(seq) + \
        write_frame_obu(seq, fp, tile)
    dec = dav1d.decode_stream([data])[0]
    for p in range(3):
        assert np.array_equal(dec[p].astype(np.int32), recon[p]), p
