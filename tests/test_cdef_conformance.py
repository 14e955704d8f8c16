"""CDEF conformance + engagement: frames signal CDEF strengths, dav1d's
decode (which includes its CDEF pass) must equal our reconstruction."""

import numpy as np
import pytest

from tests.test_inter_conformance import moving_content, run_clip

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def test_cdef_highq_noise():
    run_clip(moving_content(192, 128, 2, dx=4, dy=2, seed=5), q=220)


def test_cdef_edges_content():
    """Hard edges + flat areas: the content CDEF was designed for."""
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((xx * 3 + yy * 2) % 48 < 24, 70, 190).astype(np.uint8)
    u = np.where((xx[::2, ::2] + yy[::2, ::2]) % 20 < 10, 90, 160).astype(np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    run_clip([(y, u, v)] * 2, q=200)


def test_cdef_improves_psnr():
    """On ringing-prone content at high q, CDEF must engage (nonzero
    strength) and not hurt PSNR."""
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(2)
    y = np.where((xx * 3 + yy) % 64 < 32, 70, 190).astype(np.int32)
    y = np.clip(y + rng.integers(-6, 6, y.shape), 0, 255)
    u = np.full((h // 2, w // 2), 100, np.int32)
    v = np.full((h // 2, w // 2), 150, np.int32)

    results = {}
    for damping in (0, 6):
        fe = IntraFrameEncoder(w, h, q_idx=220, lf_levels=(30, 30, 30, 30),
                               cdef_damping=damping, device_modes=False)
        _, rec = fe.encode([y, u, v])
        mse = np.mean((rec[0].astype(float) - y) ** 2)
        results[damping] = (mse, getattr(fe, "cdef_strengths", None))
    assert results[6][1] is not None and results[6][1][0] > 0  # engaged
    assert results[6][0] <= results[0][0] * 1.001  # no PSNR harm


def test_batched_equals_scalar():
    """The vectorized whole-frame CDEF must equal the per-block oracle."""
    from rav1e_tpu.ops import cdef_np as cd

    rng = np.random.default_rng(9)
    h, w = 64, 128
    rec1 = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]
    rec2 = [p.copy() for p in rec1]
    skip = rng.integers(0, 2, (h // 4, w // 4)).astype(bool)
    args = (skip, 3, 2, 2, 1, 5, 8, w, h)
    cd.cdef_frame(rec1, *args)
    cd.cdef_frame_batched(rec2, *args)
    for p in range(3):
        assert np.array_equal(rec1[p], rec2[p]), f"plane {p}"


def test_device_equals_host():
    """The jitted device CDEF must equal the NumPy oracle bit-exactly."""
    from rav1e_tpu.ops import cdef_np as cd
    from rav1e_tpu.ops import cdef_jax as cj

    rng = np.random.default_rng(4)
    h, w = 64, 128
    rec1 = [rng.integers(0, 256, (h, w)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)]
    rec2 = [p.copy() for p in rec1]
    skip = rng.integers(0, 2, (h // 4, w // 4)).astype(bool)
    args = (skip, 5, 1, 2, 0, 4, 8, w, h)
    cd.cdef_frame_batched(rec1, *args)
    cj.cdef_frame_device(rec2, *args)
    for p in range(3):
        assert np.array_equal(rec1[p], rec2[p]), f"plane {p}"


def test_secondary_only_strengths_conform():
    """Strength codes with zero primary (sec-only filtering): the spec
    derives the direction only when a primary strength is nonzero, so
    sec-only taps use dir 0 per plane (regression: previously real
    directions were used, diverging from dav1d)."""
    import numpy as np
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder
    from rav1e_tpu.obu.headers import (FrameParams, Sequence,
                                       temporal_delimiter, write_frame_obu,
                                       write_sequence_header_obu)
    from rav1e_tpu.utils import dav1d_oracle

    rng = np.random.default_rng(4)
    w, h = 128, 128
    y = rng.integers(0, 255, (h, w)).astype(np.int32)
    u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32)
    for ystr, uvstr in ((2, 0), (1, 0), (0, 2), (10, 2), (2, 10)):
        fe = IntraFrameEncoder(w, h, q_idx=100, cdef_damping=4,
                               device_modes=False)
        fe._cdef_search = lambda ys=ystr, us=uvstr: (ys, us)
        tile, rec = fe.encode([y.copy(), u.copy(), v.copy()])
        seq = Sequence(width=w, height=h, enable_cdef=True)
        fp = FrameParams(base_q_idx=100, disable_cdf_update=False,
                         cdef_damping=4, cdef_y_strengths=(ystr,),
                         cdef_uv_strengths=(uvstr,))
        data = (temporal_delimiter() + write_sequence_header_obu(seq)
                + write_frame_obu(seq, fp, tile))
        dec, _ = dav1d_oracle.Dav1dDecoder().decode_packet(data)
        for dp, rp in zip(dec, rec):
            assert np.array_equal(dp.astype(np.int32), rp), (ystr, uvstr)
