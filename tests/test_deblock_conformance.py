"""Deblocking filter conformance: frames signal nonzero loop-filter levels,
so dav1d's decoded output includes its deblock pass - it must equal our
filtered reconstruction exactly (validates masks, thresholds and all four
filter kernels)."""

import numpy as np
import pytest

from tests.test_inter_conformance import moving_content, run_clip, static_content

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def test_deblock_intra_gradient():
    """Strong blocking at high q: gradient content, keyframe only."""
    run_clip(static_content(128, 128, 1), q=200)


def test_deblock_intra_noise():
    run_clip(static_content(192, 128, 1, seed=7), q=160)


def test_deblock_inter_motion():
    run_clip(moving_content(128, 96, 3, dx=4, dy=2), q=180)


def test_deblock_partial_sb():
    run_clip(moving_content(104, 72, 2, dx=2, dy=2), q=200)


def test_deblock_near_flat_taps():
    """Gentle ramps with steps at block edges: recon carries small (±1)
    texture, so the flat masks still pass while the wide-filter windows see
    non-uniform samples - exercises every individual tap."""
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx // 32) * 24 + (yy // 32) * 16 + 60
    y = np.clip(base + (xx % 7 == 0) + (yy % 5 == 0), 0, 255).astype(np.uint8)
    u = np.clip(base[::2, ::2] // 2 + 60, 0, 255).astype(np.uint8)
    v = np.clip(200 - base[::2, ::2] // 2, 0, 255).astype(np.uint8)
    run_clip([(y, u, v)] * 2, q=210)


def test_deblock_flat_strong():
    """Flat blocks with DC steps: exercises the wide (14/6-tap) filters."""
    rng = np.random.default_rng(3)
    h, w = 128, 128
    y = np.repeat(np.repeat(rng.integers(80, 180, (4, 4)), 32, 0), 32, 1).astype(np.uint8)
    u = np.repeat(np.repeat(rng.integers(80, 180, (2, 2)), 32, 0), 32, 1).astype(np.uint8)
    v = np.repeat(np.repeat(rng.integers(80, 180, (2, 2)), 32, 0), 32, 1).astype(np.uint8)
    run_clip([(y, u, v)], q=230)
