#!/usr/bin/env python
"""Measure the installed librav1e 0.5.1's fps on bench.py's exact
workloads (same content, same frame counts) so BASELINE constants have a
same-harness denominator.

Usage: python tools/measure_rav1e_baseline.py [--frames N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.quality_bench import _load_rav1e  # noqa: E402
import ctypes  # noqa: E402
from tools.quality_bench import _RaPacket  # noqa: E402


def rav1e_encode_timed(frames, q, speed, low_latency, kf_interval=None):
    lib = _load_rav1e()
    h, w = frames[0][0].shape
    cfg = lib.rav1e_config_default()
    assert lib.rav1e_config_parse_int(cfg, b"width", w) == 0
    assert lib.rav1e_config_parse_int(cfg, b"height", h) == 0
    assert lib.rav1e_config_parse_int(cfg, b"speed", speed) == 0
    assert lib.rav1e_config_parse_int(cfg, b"quantizer", q) == 0
    assert lib.rav1e_config_parse_int(cfg, b"threads", 1) == 0
    if low_latency:
        lib.rav1e_config_parse(cfg, b"low_latency", b"true")
    if kf_interval is not None:
        lib.rav1e_config_parse_int(cfg, b"key_frame_interval", kf_interval)
        lib.rav1e_config_parse_int(cfg, b"min_key_frame_interval",
                                   kf_interval)
    ctx = lib.rav1e_context_new(cfg)
    assert ctx
    nbytes = 0

    def drain():
        nonlocal nbytes
        while True:
            pp = ctypes.c_void_p()
            ret = lib.rav1e_receive_packet(ctx, ctypes.byref(pp))
            if ret != 0 or not pp.value:
                return ret
            pkt = ctypes.cast(pp, ctypes.POINTER(_RaPacket)).contents
            nbytes += pkt.len
            lib.rav1e_packet_unref(pp)

    t0 = time.perf_counter()
    for y, u, v in frames:
        f = lib.rav1e_frame_new(ctx)
        for i, p in enumerate((y, u, v)):
            pc = np.ascontiguousarray(p, np.uint8)
            lib.rav1e_frame_fill_plane(f, i, pc.ctypes.data, pc.size,
                                       pc.shape[1], 1)
        lib.rav1e_send_frame(ctx, f)
        lib.rav1e_frame_unref(f)
        drain()
    lib.rav1e_send_frame(ctx, None)
    drain()
    dt = time.perf_counter() - t0
    lib.rav1e_context_unref(ctx)
    lib.rav1e_config_unref(cfg)
    return len(frames) / dt, nbytes


def bench_frames(w, h, n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = ((xx + yy + 4 * t) % 256).astype(np.uint8)
        y = np.clip(y.astype(np.int16) + rng.integers(-8, 8, y.shape),
                    0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] // 2 + t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] // 2 + 2 * t) % 256).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf-frames", type=int, default=8)
    ap.add_argument("--mixed-frames", type=int, default=16)
    args = ap.parse_args()
    w, h = 1920, 1080
    kf_fps, kf_bytes = rav1e_encode_timed(
        bench_frames(w, h, args.kf_frames), 100, 6, True, kf_interval=1)
    mx_fps, mx_bytes = rav1e_encode_timed(
        bench_frames(w, h, args.mixed_frames), 100, 6, True)
    print(json.dumps({
        "rav1e_1080p_s6_keyframe_fps": round(kf_fps, 3),
        "rav1e_1080p_s6_ll_mixed_fps": round(mx_fps, 3),
        "kf_bytes": kf_bytes, "mixed_bytes": mx_bytes,
    }))


if __name__ == "__main__":
    main()
