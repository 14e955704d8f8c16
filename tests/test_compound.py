"""Compound (bidirectional) prediction conformance.

Reference analog: rav1e's compound inter coding (src/context/block_unit.rs
read_ref_frames / inter_compound_mode paths) and spec 7.10.2 compound MV
stack + 7.11.3.1 COMPOUND_AVERAGE.  Every stream here signals
reference_select=1; blocks choose between single and (fwd, bwd) pairs.

The inter_compound_mode cdf context (models/inter_frame.comp_mode_cdf_ctx)
was determined empirically by per-cell forced-context scans against
libdav1d; these tests lock the validated cells in place.
"""

import numpy as np
import pytest

import rav1e_tpu.models.inter_frame as inf
from rav1e_tpu.api.config import Config, EncoderConfig
from rav1e_tpu.utils.frame import Frame

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")

from test_inter_conformance import drive, moving_content, run_clip  # noqa: E402


def run_counting(frames, modes=None, **cfg_kwargs):
    """run_clip variant that counts compound blocks actually coded."""
    counts = []
    orig = inf.InterFrameEncoder.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        if modes is not None:
            self.comp_modes_allowed = modes
        counts.append(self)

    inf.InterFrameEncoder.__init__ = patched
    try:
        run_clip(frames, **cfg_kwargs)
    finally:
        inf.InterFrameEncoder.__init__ = orig
    return sum(fe.comp_block_count for fe in counts)


def test_compound_pyramid_conformance():
    """Pyramid group: mid/leaf frames have (fwd, bwd) refs and code real
    compound blocks (NEAREST_NEAREST / GLOBAL_GLOBAL / NEW_NEWMV)."""
    n = run_counting(moving_content(128, 96, 6, dx=3, dy=2), q=100,
                     low_latency=False)
    assert n > 0, "no compound blocks coded"


def test_compound_nearest_only():
    n = run_counting(moving_content(128, 96, 6, dx=3, dy=2),
                     modes=(inf.NEAREST_NEARESTMV,), q=100, low_latency=False)
    assert n > 0


def test_compound_new_newmv():
    """NEW_NEWMV: drl + two MV residuals against the compound stack."""
    n = run_counting(moving_content(160, 96, 6, dx=5, dy=3),
                     modes=(inf.NEW_NEWMV,), q=90, low_latency=False)
    assert n > 0


def test_compound_near_modes():
    """NEAR_NEARMV (deeper DRL pairs) + single-ref NEARMV conformance."""
    n = run_counting(moving_content(160, 96, 6, dx=5, dy=3),
                     modes=(inf.NEAR_NEARMV, inf.NEAREST_NEARESTMV),
                     q=90, low_latency=False)
    assert n > 0


def test_compound_mixed_new_modes():
    """NEAREST_NEWMV / NEW_NEARESTMV: one predicted, one searched MV."""
    n = run_counting(moving_content(160, 96, 6, dx=5, dy=3),
                     modes=(inf.NEAREST_NEWMV, inf.NEW_NEARESTMV),
                     q=90, low_latency=False)
    assert n > 0


def test_single_nearmv():
    """Low-latency single-ref clip exercising the NEARMV DRL path."""
    from collections import Counter

    counts = Counter()
    orig = inf.InterFrameEncoder._decide_inter

    def patched(self, x, y, bw, bh, tile):
        out = orig(self, x, y, bw, bh, tile)
        if out[1] is not None:
            counts[out[1]] += 1
        return out

    inf.InterFrameEncoder._decide_inter = patched
    try:
        run_clip(moving_content(128, 96, 5, dx=4, dy=1), q=100,
                 low_latency=True)
    finally:
        inf.InterFrameEncoder._decide_inter = orig
    assert counts[inf.NEARMV] > 0, dict(counts)


def test_compound_static_quality():
    """Static pyramid: compound average should not hurt; stream decodes
    bit-exactly with reference_select on."""
    from test_inter_conformance import static_content

    run_clip(static_content(96, 96, 5), q=110, low_latency=False)


def test_comp_mode_ctx_cells():
    """Lock the empirically-validated inter_compound_mode context cells."""
    cells = {(0, 0): 0, (1, 1): 1, (2, 3): 3, (3, 3): 4,
             (2, 4): 5, (4, 5): 7, (5, 5): 7}
    for (n, r), want in cells.items():
        assert inf.comp_mode_cdf_ctx(n, r) == want, (n, r)


def test_skip_mode_allowed_derivation():
    """spec 5.9.22: allowed only with refs on both temporal sides."""
    from rav1e_tpu.obu.headers import (FrameParams, INTER_FRAME, Sequence,
                                       _skip_mode_allowed)

    seq = Sequence(width=64, height=64)
    fp = FrameParams(frame_type=INTER_FRAME, order_hint=4,
                     reference_select=True,
                     ref_frame_idx=(0, 0, 0, 0, 1, 1, 1),
                     ref_order_hints=(2, 6, 0, 0, 0, 0, 0, 0))
    assert _skip_mode_allowed(seq, fp)  # past (2) + future (6)
    fp.ref_order_hints = (2, 3, 0, 0, 0, 0, 0, 0)
    assert _skip_mode_allowed(seq, fp)  # two distinct forward refs
    fp.ref_frame_idx = (0, 0, 0, 0, 0, 0, 0)
    assert not _skip_mode_allowed(seq, fp)  # single forward ref only
    fp.reference_select = False
    assert not _skip_mode_allowed(seq, fp)


def test_avg_compound_fullpel_identity():
    """Full-pel compound average of two equal references returns the
    samples exactly (prep shortcut scale is exact for phase 0)."""
    from rav1e_tpu.ops import mc_np as mc

    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    for bd in (8, 10, 12):
        r = ref << (bd - 8)
        p0 = mc.put_prep(r, 8, 8, 16, 16, 16, -8, 0, 0, bd)
        p1 = mc.put_prep(r, 8, 8, 16, 16, 16, -8, 0, 0, bd)
        out = mc.avg_compound(p0, p1, bd)
        assert np.array_equal(out, r[10:26, 7:23])  # mv (16,-8)/8 = (+2,-1) px
