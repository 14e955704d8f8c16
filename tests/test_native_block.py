"""Native per-block intra coder (native/block_intra.cc) parity: the C fast
path must produce byte-identical tile data and reconstruction vs the python
block path, and the streams must still decode bit-exactly through dav1d."""

import numpy as np
import pytest

import rav1e_tpu.ec.native_block as nb
from rav1e_tpu.models.intra_frame import IntraFrameEncoder


def _planes(w, h, seed, bd=8):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2) // 4 + rng.integers(0, 24, (h, w))).clip(0, mx)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = (mx // 2 + rng.integers(0, 16, (ch, cw))).clip(0, mx)
    v = (mx // 3 + rng.integers(0, 16, (ch, cw))).clip(0, mx)
    return [a.astype(np.int32) for a in (y, u, v)]


def _encode(planes, w, h, q, bd=8, native_block=True, rdo=True, **kw):
    enc = IntraFrameEncoder(w, h, q, bit_depth=bd, device_modes=False, **kw)
    enc.rdo_partition = rdo
    if native_block:
        data, recon = enc.encode([p.copy() for p in planes])
        return data, recon, enc
    orig = nb.block_coder_for
    nb.block_coder_for = lambda fe: None
    try:
        data, recon = enc.encode([p.copy() for p in planes])
    finally:
        nb.block_coder_for = orig
    return data, recon, enc


@pytest.mark.parametrize("dims,q", [((128, 128), 80), ((96, 64), 40),
                                    ((72, 52), 140), ((64, 64), 0)])
def test_parity_vs_python(dims, q):
    w, h = dims
    planes = _planes(w, h, seed=q)
    d1, r1, e1 = _encode(planes, w, h, q, native_block=True)
    d2, r2, e2 = _encode(planes, w, h, q, native_block=False)
    assert e1._nbc is not None, "native block coder did not engage"
    assert e2._nbc is None
    assert d1 == d2
    for p1, p2 in zip(r1, r2):
        np.testing.assert_array_equal(p1, p2)


def test_parity_10bit():
    w, h = 96, 96
    planes = _planes(w, h, seed=7, bd=10)
    d1, r1, e1 = _encode(planes, w, h, 90, bd=10, native_block=True)
    d2, r2, _ = _encode(planes, w, h, 90, bd=10, native_block=False)
    assert e1._nbc is not None
    assert d1 == d2
    for p1, p2 in zip(r1, r2):
        np.testing.assert_array_equal(p1, p2)


def test_parity_tiles():
    w, h = 192, 128
    planes = _planes(w, h, seed=3)
    kw = dict(tile_cols_log2=1, tile_rows_log2=1)
    d1, r1, e1 = _encode(planes, w, h, 100, native_block=True, **kw)
    d2, r2, _ = _encode(planes, w, h, 100, native_block=False, **kw)
    assert e1._nbc is not None
    assert d1 == d2
    for p1, p2 in zip(r1, r2):
        np.testing.assert_array_equal(p1, p2)


def test_conformance_dav1d():
    from tests.test_conformance import encode_decode

    y, u, v = _planes(128, 96, seed=11)
    dec, recon, _ = encode_decode(y, u, v, q=70)
    for dp, rp in zip(dec, recon):
        np.testing.assert_array_equal(dp, rp)


def test_lr_two_pass_matches_recorder():
    """With restoration on, the native path re-encodes in two passes
    (decide filters from a throwaway sweep, then interleave read_lr);
    the output must be byte-identical to the recorder replay path.
    The device wavefront path is pinned OFF here: it makes its own
    (device-RD) decisions, so byte equality only holds for the host
    pass-A flow this test covers."""
    w, h = 320, 240  # >= 320x240 so device RD maps (two-pass gate) engage
    planes = _planes(w, h, seed=5)

    def run(force_recorder):
        enc = IntraFrameEncoder(w, h, 90, device_modes=True,
                                lf_levels=(8, 8, 6, 6), cdef_damping=5)
        enc._wavefront_eligible = lambda: False
        enc.lrf = True
        if force_recorder:
            orig = nb.block_coder_for
            nb.block_coder_for = lambda fe: None
            try:
                d, r = enc.encode([p.copy() for p in planes])
            finally:
                nb.block_coder_for = orig
            return d, r, enc
        d, r = enc.encode([p.copy() for p in planes])
        return d, r, enc

    d1, r1, e1 = run(False)
    d2, r2, e2 = run(True)
    assert e1._lrf_native and not e2._lrf_native
    assert d1 == d2
    for p1, p2 in zip(r1, r2):
        np.testing.assert_array_equal(p1, p2)


def _cfl_planes(w, h, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 90*np.sin(xx/13.0)*np.cos(yy/17.0)
                + rng.integers(-8, 8, (h, w)), 0, 255).astype(np.int32)
    u = np.clip(60 + (y[::2, ::2] - 128)//2 + 60, 0, 255).astype(np.int32)
    v = np.clip(200 - (y[::2, ::2] - 128)//3, 0, 255).astype(np.int32)
    return [y, u, v]


def test_parity_cfl_speed5():
    """CFL decision + symbols must be byte-identical between the C fast
    path and the python oracle."""
    w, h = 128, 96
    planes = _cfl_planes(w, h)
    # rdo off: fresh-block path so the C coder actually runs CFL
    d1, r1, e1 = _encode(planes, w, h, 100, native_block=True, speed=5, rdo=False)
    d2, r2, e2 = _encode(planes, w, h, 100, native_block=False, speed=5, rdo=False)
    assert e1._nbc is not None
    assert d1 == d2
    for p1, p2 in zip(r1, r2):
        np.testing.assert_array_equal(p1, p2)


def test_cfl_conformance_and_gain():
    """CFL streams decode bit-exactly through dav1d and reduce chroma
    error on luma-correlated content."""
    from tests.test_conformance import encode_decode

    y, u, v = _cfl_planes(128, 96)
    # encode_decode uses default speed; run a CFL encoder directly instead
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder, UV_CFL
    from rav1e_tpu.obu.headers import (FrameParams, Sequence,
                                       temporal_delimiter, write_frame_obu,
                                       write_sequence_header_obu)
    from rav1e_tpu.utils import dav1d_oracle

    cfl_used = {"n": 0}
    orig = IntraFrameEncoder._decide_chroma
    def probe(self, *a):
        r = orig(self, *a)
        if r[0] == UV_CFL:
            cfl_used["n"] += 1
        return r
    IntraFrameEncoder._decide_chroma = probe
    try:
        fe = IntraFrameEncoder(128, 96, q_idx=100, speed=5, device_modes=False)
        tile, recon = fe.encode([y.copy(), u.copy(), v.copy()])
    finally:
        IntraFrameEncoder._decide_chroma = orig
    assert cfl_used["n"] > 0, "CFL never chosen on correlated content"
    seq = Sequence(width=128, height=96)
    fp = FrameParams(base_q_idx=100, disable_cdf_update=False)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d_oracle.Dav1dDecoder().decode_packet(data)
    for dp, rp in zip(dec, recon):
        np.testing.assert_array_equal(dp.astype(np.int32), rp)
