"""Segmentation (SEG_LVL_ALT_Q) conformance and behavior.

Reference analog: src/segmentation.rs — activity-driven per-segment
delta-q with spatially predicted segment ids (coded after the skip flag,
predicted for skip blocks)."""

import numpy as np
import pytest

import rav1e_tpu.ec.native_block as nb
from rav1e_tpu.models.intra_frame import IntraFrameEncoder
from rav1e_tpu.obu.headers import (FrameParams, Sequence, temporal_delimiter,
                                   write_frame_obu, write_sequence_header_obu)

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def _content(w, h, seed=13):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where(xx < w // 2, 100, rng.integers(0, 255, (h, w))).astype(np.int32)
    u = np.full((h // 2, w // 2), 120, np.int32)
    v = np.full((h // 2, w // 2), 136, np.int32)
    return y, u, v


def _roundtrip(deltas, w=128, h=128, q=120, native=True, lrf=False, **kw):
    y, u, v = _content(w, h)
    if not native:
        orig = nb.block_coder_for
        nb.block_coder_for = lambda fe: None
    try:
        fe = IntraFrameEncoder(w, h, q_idx=q, device_modes=False,
                               seg_deltas=deltas, **kw)
        fe.lrf = lrf
        tile, rec = fe.encode([y.copy(), u.copy(), v.copy()])
    finally:
        if not native:
            nb.block_coder_for = orig
    seq = Sequence(width=w, height=h, enable_restoration=lrf)
    fkw = {"frame_restoration_type": (1, 0, 0)} if lrf else {}
    fp = FrameParams(base_q_idx=q, disable_cdf_update=False,
                     seg_deltas=deltas, **fkw)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for dp, rp in zip(dec, rec):
        np.testing.assert_array_equal(dp.astype(np.int32), rp)
    return tile, rec


@pytest.mark.parametrize("deltas", [(0, 0), (-8, -3, 2, 7), (10, -10),
                                    (-20, -10, -5, 0, 5, 10, 15, 20)])
def test_seg_conformance(deltas):
    _roundtrip(deltas)


def test_seg_parity_native_vs_python():
    t1, r1 = _roundtrip((-8, -3, 2, 7), native=True, rdo=False) \
        if False else (None, None)
    # direct comparison without the rdo kwarg plumbing:
    y, u, v = _content(128, 128)
    def enc(native):
        if not native:
            orig = nb.block_coder_for
            nb.block_coder_for = lambda fe: None
        try:
            fe = IntraFrameEncoder(128, 128, q_idx=120, device_modes=False,
                                   seg_deltas=(-8, -3, 2, 7))
            fe.rdo_partition = False
            t, r = fe.encode([y.copy(), u.copy(), v.copy()])
        finally:
            if not native:
                nb.block_coder_for = orig
        return t, r
    t1, r1 = enc(True)
    t2, r2 = enc(False)
    assert t1 == t2
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)


def test_seg_with_restoration_two_pass():
    _roundtrip((-8, -3, 2, 7), lrf=True, lf_levels=(10,) * 4)


def test_seg_improves_smooth_region_quality():
    """Lower q on low-activity segments: the smooth half gets a better
    recon with segmentation than without."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:128, 0:192]
    smooth = (40 + xx * 0.7 + yy * 0.4 + 8 * np.sin(xx / 23.0)).astype(np.int32)
    y = np.where(xx < 96, smooth, rng.integers(0, 255, (128, 192))).astype(np.int32)
    u = np.full((64, 96), 120, np.int32)
    v = np.full((64, 96), 136, np.int32)
    outs = {}
    # deltas large enough that the q effect dominates mode tie-break
    # variation (at small deltas a single RD mode flip can swamp the
    # ~8% quantizer-step difference in region MSE)
    for deltas in ((), (-40, -12, 8, 24)):
        fe = IntraFrameEncoder(192, 128, q_idx=180, device_modes=False,
                               seg_deltas=deltas)
        tile, rec = fe.encode([y.copy(), u.copy(), v.copy()])
        smooth_mse = float(((rec[0][:, :96] - y[:, :96]) ** 2).mean())
        outs[deltas] = (len(tile), smooth_mse)
    assert outs[(-40, -12, 8, 24)][1] < outs[()][1], outs
