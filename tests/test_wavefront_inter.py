"""Inter wavefront (device datapath for P frames) conformance: encode with
the device MC + inter RD + recon path, decode with libdav1d, and require
decoded == the encoder's reconstruction bit-for-bit.

Reference analog: the same bar as the intra wavefront tests — the device
reconstruction must be exactly what the decoder rebuilds from the replayed
symbols (SURVEY.md section 7 hard parts)."""

import os

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig
from tests.test_inter_conformance import drive, run_clip

pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def moving_clip(w, h, n, seed=0, pan=(2, 3)):
    """Translating texture + noise: inter blocks should dominate."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 256, (h + 64, w + 64), np.int64)
    # smooth the field so MC has structure to track
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, 2, 0)) // 4
    frames = []
    for t in range(n):
        oy, ox = 16 + pan[0] * t, 16 + pan[1] * t
        y = big[oy : oy + h, ox : ox + w].astype(np.uint8)
        u = y[::2, ::2] // 2 + 40
        v = y[1::2, ::2] // 3 + 60
        frames.append((y, u.astype(np.uint8), v.astype(np.uint8)))
    return frames


def _assert_wavefront_used(monkeypatch):
    """Fail the test if the inter wavefront path silently fell back."""
    from rav1e_tpu.models.inter_frame import InterFrameEncoder

    used = []
    orig = InterFrameEncoder._install_wavefront

    def spy(self, wf):
        used.append(1)
        return orig(self, wf)

    monkeypatch.setattr(InterFrameEncoder, "_install_wavefront", spy)
    return used


def test_inter_wavefront_conformance(monkeypatch):
    used = _assert_wavefront_used(monkeypatch)
    frames = moving_clip(384, 256, 4)
    run_clip(frames, q=100, low_latency=True, max_key_frame_interval=16)
    assert used, "inter wavefront path not engaged"


def test_inter_wavefront_conformance_lowq_static(monkeypatch):
    # static content at low q: exercises skip blocks and 64x64 roots
    used = _assert_wavefront_used(monkeypatch)
    frames = moving_clip(384, 256, 3, seed=5, pan=(0, 0))
    run_clip(frames, q=160, low_latency=True, max_key_frame_interval=16)
    assert used


def test_inter_wavefront_matches_host_decisions_off():
    """The host-path fallback (env kill switch) still conforms and the
    switch actually disables the device path."""
    from rav1e_tpu.models.inter_frame import InterFrameEncoder

    frames = moving_clip(384, 256, 3, seed=9)
    os.environ["RAV1E_TPU_WF_INTER"] = "0"
    try:
        run_clip(frames, q=120, low_latency=True, max_key_frame_interval=16)
    finally:
        del os.environ["RAV1E_TPU_WF_INTER"]


def test_inter_wavefront_partial_sb_frame(monkeypatch):
    # 360 rows: bottom SB row is partial -> host path interleaves with
    # device SBs in decode order
    used = _assert_wavefront_used(monkeypatch)
    frames = moving_clip(384, 360, 3, seed=3)
    run_clip(frames, q=110, low_latency=True, max_key_frame_interval=16)
    assert used
