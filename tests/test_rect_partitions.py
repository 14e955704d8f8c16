"""Interior rectangular partitions (PARTITION_HORZ / PARTITION_VERT).

Reference analog: rdo_partition_decision's rect arms gated by the
non_square_partition speed preset (src/rdo.rs, src/api/config/
speedsettings.rs).  The streams must stay dav1d bit-exact and the rect
arms must actually win on content with half-block structure.
"""

import numpy as np
import pytest

from rav1e_tpu.api.config import SpeedSettings

from tests.test_inter_conformance import run_clip

pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def _probe_parts(cls):
    """Monkeypatch cls._rd_part to record chosen partition types."""
    chosen = []
    orig = cls._rd_part

    def probe(self, x, y, size, cdf_row):
        r = orig(self, x, y, size, cdf_row)
        chosen.append(r)
        return r

    cls._rd_part = probe
    return chosen, orig


def _banded(w, h, seed=0, period=32, off=16):
    """Luma with flat/textured horizontal bands switching mid-32-block:
    a HORZ leaf pair models each 32x32 better than NONE (one band is
    noisy) and cheaper than SPLIT (2 headers, not 4)."""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 90, np.uint8)
    rows = (np.arange(h) // off) % 2 == 1
    y[rows] = np.clip(
        160 + rng.integers(-34, 34, (int(rows.sum()), w)), 0, 255
    ).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    return y, u, v


def test_intra_rect_partitions_conform():
    """Small intra frame (host RD path) at a rect-enabled speed: HORZ/VERT
    leaves are chosen and the stream decodes bit-exactly."""
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    chosen, orig = _probe_parts(IntraFrameEncoder)
    try:
        run_clip([_banded(192, 128, seed=1)], q=120,
                 speed_settings=SpeedSettings.from_preset(3))
    finally:
        IntraFrameEncoder._rd_part = orig
    assert any(p in (IntraFrameEncoder.P_HORZ, IntraFrameEncoder.P_VERT)
               for p in chosen), f"no rect partition chosen: {chosen}"


def test_inter_rect_partitions_conform():
    """Inter frames with split motion along a half-block boundary: rect
    partitions engage and the stream stays dav1d bit-exact."""
    import rav1e_tpu.models.inter_frame as inf

    rng = np.random.default_rng(7)
    big = np.clip(
        (np.add.outer(np.arange(96 + 256), np.arange(128 + 256)) * 5 % 220)
        + rng.integers(-25, 25, (96 + 256, 128 + 256)), 0, 255
    ).astype(np.uint8)
    frames = []
    for t in range(4):
        # horizontal shear: rows 0..16 of each 32-row band pan, the rest
        # static — a HORZ pair per 32x32 matches the motion boundary
        y = big[64 : 64 + 96, 64 : 64 + 128].copy()
        for r0 in range(0, 96, 32):
            y[r0 : r0 + 16] = big[64 + r0 : 64 + r0 + 16,
                                  64 + 4 * t : 64 + 4 * t + 128]
        u = np.full((48, 64), 120, np.uint8)
        v = np.full((48, 64), 136, np.uint8)
        frames.append((y, u, v))
    chosen, orig = _probe_parts(inf.InterFrameEncoder)
    try:
        run_clip(frames, q=120, low_latency=True,
                 speed_settings=SpeedSettings.from_preset(3))
    finally:
        inf.InterFrameEncoder._rd_part = orig
    assert any(p in (inf.InterFrameEncoder.P_HORZ,
                     inf.InterFrameEncoder.P_VERT)
               for p in chosen), f"no rect partition chosen: {chosen}"


def test_rect_partitions_default_speed_off():
    """Default speed 6: non_square_partition is off (reference preset)."""
    assert not SpeedSettings.from_preset(6).non_square_partition
    assert SpeedSettings.from_preset(3).non_square_partition
