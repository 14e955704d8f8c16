"""Device MC kernel (ops/mc_jax.py) vs the NumPy spec oracle
(ops/mc_np.py::put_single) -- checkasm-style bit-exactness over random MVs,
block sizes, subsampling, and frame-edge clamping (SURVEY.md 4.4)."""

import numpy as np
import pytest

from rav1e_tpu.ops import mc_np as mc
from rav1e_tpu.ops import mc_jax as mj


@pytest.mark.parametrize("w,h", [(64, 64), (32, 32), (16, 16), (8, 8),
                                 (32, 16), (16, 32)])
@pytest.mark.parametrize("fset", [mc.FILTER_REGULAR, mc.FILTER_SMOOTH,
                                  mc.FILTER_SHARP])
def test_luma_matches_oracle(w, h, fset):
    rng = np.random.default_rng(hash((w, h, fset)) & 0xFFFF)
    rw, rh = 200, 150  # real frame dims (not 64-aligned: exercises clamp)
    ref = rng.integers(0, 256, (rh, rw), np.int32)
    B = 48
    px = rng.integers(0, max(1, rw - w), B).astype(np.int32)
    py = rng.integers(0, max(1, rh - h), B).astype(np.int32)
    mvs = (rng.integers(-160, 161, (B, 2)) & ~1).astype(np.int32)
    got = mj.put_single_batch(ref, np.stack([px, py], 1), mvs, w, h,
                              0, 0, 8, fset, margin=48)
    for i in range(B):
        want = mc.put_single(ref, int(px[i]), int(py[i]), w, h,
                             int(mvs[i, 0]), int(mvs[i, 1]), 0, 0, 8,
                             filter_x=fset, filter_y=fset,
                             ref_w=rw, ref_h=rh)
        assert np.array_equal(np.asarray(got[i]), want), (i, mvs[i])


def test_chroma_420_matches_oracle():
    rng = np.random.default_rng(7)
    rw, rh = 100, 76  # chroma plane dims of a 200x150ish frame
    ref = rng.integers(0, 256, (rh, rw), np.int32)
    w = h = 16
    B = 32
    px = rng.integers(0, rw - w, B).astype(np.int32)
    py = rng.integers(0, rh - h, B).astype(np.int32)
    mvs = (rng.integers(-120, 121, (B, 2)) & ~1).astype(np.int32)
    got = mj.put_single_batch(ref, np.stack([px, py], 1), mvs, w, h,
                              1, 1, 8, mc.FILTER_REGULAR, margin=48)
    for i in range(B):
        want = mc.put_single(ref, int(px[i]), int(py[i]), w, h,
                             int(mvs[i, 0]), int(mvs[i, 1]), 1, 1, 8,
                             ref_w=rw, ref_h=rh)
        assert np.array_equal(np.asarray(got[i]), want), (i, mvs[i])


def test_fullpel_is_copy():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (128, 128), np.int32)
    got = mj.put_single_batch(ref, [(32, 32)], [(8 * 8, -16 * 8)], 32, 32)
    assert np.array_equal(np.asarray(got[0]),
                          ref[32 + 8 : 64 + 8, 32 - 16 : 64 - 16])
