"""Inter-frame encode -> libdav1d decode conformance.

Every decoded frame must equal the encoder's reconstruction exactly; this
validates the MV-stack construction, inter mode/MV coding contexts and the
MC filters against the normative decoder (SURVEY.md section 4.3).
"""

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig
from rav1e_tpu.api.context import EncoderError, EncoderStatus
from rav1e_tpu.utils.frame import Frame

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def drive(ctx, frames):
    """Full send/receive protocol: drain packets as available, flush at
    the end (the reference API's pull loop)."""
    packets = []

    def drain():
        while True:
            try:
                packets.append(ctx.receive_packet())
            except EncoderError as e:
                if e.status in (EncoderStatus.NEED_MORE_DATA,
                                EncoderStatus.LIMIT_REACHED):
                    return e.status
                raise

    for f in frames:
        ctx.send_frame(f)
        drain()
    ctx.flush()
    drain()
    return packets


def run_clip(frames, q=100, w=None, h=None, **cfg_kwargs):
    """Encode frames (list of (y,u,v)), decode with dav1d, compare the
    displayed pictures against the encoder's recons in display order."""
    h_, w_ = frames[0][0].shape
    cfg = Config(enc=EncoderConfig(width=w or w_, height=h or h_, quantizer=q,
                                   **cfg_kwargs))
    ctx = cfg.new_context()
    pkts = drive(ctx, [Frame.from_planes(y, u, v) for y, u, v in frames])
    shown = [p.input_frameno for p in pkts if p.shows]
    recons = [ctx._encoder.recon_by_input[no] for no in shown]
    decoded = dav1d.decode_stream([p.data for p in pkts])
    assert len(decoded) == len(recons), (len(decoded), len(recons))
    for i, (dec, rec) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(dec[p].astype(np.int32), rec[p]), (
                f"display frame {i} (input {shown[i]}) plane {p}: "
                f"{int((dec[p].astype(np.int32) != rec[p]).sum())} mismatches"
            )
    return [p.data for p in pkts]


def static_content(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((xx + yy) % 220 + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
    u = ((xx[::2, ::2]) % 200 + 20).astype(np.uint8)
    v = ((yy[::2, ::2]) % 180 + 30).astype(np.uint8)
    return [(y, u, v)] * n


def moving_content(w, h, n, dx=4, dy=2, seed=1):
    rng = np.random.default_rng(seed)
    big = np.clip(
        (np.add.outer(np.arange(h + 256), np.arange(w + 256)) % 200)
        + rng.integers(-15, 15, (h + 256, w + 256)),
        0, 255,
    ).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = 64 + dx * t, 64 + dy * t
        y = big[oy : oy + h, ox : ox + w]
        u = big[oy // 2 : oy // 2 + h // 2, ox // 2 : ox // 2 + w // 2]
        v = big[oy // 2 + 32 : oy // 2 + 32 + h // 2, ox // 2 : ox // 2 + w // 2]
        frames.append((y, u, v))
    return frames


def test_static_two_frames():
    """Static clip: P-frame should be mostly GLOBALMV/skip."""
    run_clip(static_content(64, 64, 2), q=120)


def test_static_multi_sb():
    run_clip(static_content(192, 128, 3), q=100)


def test_motion_newmv():
    """Global pan: exercises NEWMV coding + MV stack predictions."""
    run_clip(moving_content(128, 128, 4, dx=4, dy=2), q=100)


def test_motion_subpel_chroma():
    """Odd pan: chroma lands at half-pel positions -> 8-tap chroma MC."""
    run_clip(moving_content(128, 96, 3, dx=3, dy=1), q=80)


def test_partial_superblocks_inter():
    run_clip(moving_content(104, 72, 3, dx=2, dy=2), q=110)


def test_inter_frames_smaller():
    """P-frames of a static clip must be smaller than the keyframe (only
    requantization error of the first recon remains to code)."""
    pkts = run_clip(static_content(128, 128, 3), q=100, low_latency=True)
    assert len(pkts[1]) < len(pkts[0]) * 3 // 4
    assert len(pkts[2]) < len(pkts[0]) * 3 // 4


def test_flat_inter_all_skip():
    """A flat static clip: P-frames are pure GLOBALMV/skip and tiny."""
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 160, np.uint8)
    pkts = run_clip([(y, u, v)] * 3, q=120, low_latency=True)
    assert len(pkts[1]) < 40, len(pkts[1])
    assert len(pkts[2]) < 40, len(pkts[2])


def test_switch_frames():
    """switch_frame_interval in low latency: every Nth inter frame is an
    S-frame (frame_type SWITCH, error resilient, refreshes all slots) and
    the stream decodes bit-exactly."""
    from rav1e_tpu.obu.headers import SWITCH_FRAME

    seen = []
    import rav1e_tpu.obu.headers as hdr
    orig = hdr.write_frame_header
    def probe(seq, fp, **kw):
        seen.append(fp.frame_type)
        return orig(seq, fp, **kw)
    hdr.write_frame_header = probe
    import rav1e_tpu.models.pipeline as pl
    orig2 = pl.write_frame_obu
    try:
        run_clip(static_content(96, 80, 7), q=120, low_latency=True,
                 switch_frame_interval=3, min_key_frame_interval=1)
    finally:
        hdr.write_frame_header = orig
    assert SWITCH_FRAME in seen, seen


def test_inter_partition_rd_conforms():
    """Single-reference inter partition RD: 32->16 splits engage on
    motion-heterogeneous content and the stream stays dav1d bit-exact.
    The replay path re-derives non-NEW MVs from the coding-time stack."""
    import rav1e_tpu.models.inter_frame as inf

    splits = []
    orig = inf.InterFrameEncoder._rd_part

    def probe(self, x, y, size, cdf_row):
        r = orig(self, x, y, size, cdf_row)
        splits.append(r == self.P_SPLIT)
        return r

    inf.InterFrameEncoder._rd_part = probe
    rng = np.random.default_rng(3)
    big = np.clip(
        (np.add.outer(np.arange(96 + 256), np.arange(128 + 256)) * 3 % 200)
        + rng.integers(-20, 20, (96 + 256, 128 + 256)), 0, 255
    ).astype(np.uint8)
    frames = []
    for t in range(4):
        # split motion: left half pans, right half static (forces sub-32
        # motion boundaries through the middle of superblocks)
        y = big[64 : 64 + 96, 64 : 64 + 128].copy()
        y[:, :64] = big[64 + 2 * t : 64 + 2 * t + 96, 64 + 3 * t : 64 + 3 * t + 64]
        u = np.full((48, 64), 120, np.uint8)
        v = np.full((48, 64), 136, np.uint8)
        frames.append((y, u, v))
    try:
        run_clip(frames, q=120, low_latency=True)
    finally:
        inf.InterFrameEncoder._rd_part = orig
    assert any(splits), "no 32->16 inter split ever chosen"
