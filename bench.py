#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Two workloads, both 1080p on one chip, vs the locally measured rav1e 0.5.1
speed-6 single-core baselines (BASELINE.md):

- keyframe fps: all-intra encode (the historical headline, vs 0.38 fps)
- mixed-GOP fps: 1 key + 15 inter low-latency frames (the realistic
  workload; denominator measured with the same harness/content through
  librav1e with low_latency=true)

Methodology: one warmup run (compiles every pass variant, absorbs the
chip tunnel's cold start), then median of 3 timed runs; per-stage wall
seconds from the encoder's stage timers ride along for diagnosis.
"""

import json
import time

import numpy as np

BASELINE_1080P_S6_FPS = 0.38  # rav1e 0.5.1 speed 6, this host (BASELINE.md)
# rav1e 0.5.1 speed 6 low_latency=true, 16 frames (1 key + 15 inter), the
# SAME content and drive loop as the mixed metric below, measured with
# tools/measure_rav1e_baseline.py on this host 2026-08-20.  (For the
# keyframe-only workload the same harness measures rav1e at 0.207 fps.)
BASELINE_1080P_S6_LL_FPS = 0.517


def make_frames(w, h, n):
    from rav1e_tpu.utils.frame import Frame

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        y = ((xx + yy + 4 * t) % 256).astype(np.uint8)
        y = np.clip(y.astype(np.int16) + rng.integers(-8, 8, y.shape),
                    0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] // 2 + t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] // 2 + 2 * t) % 256).astype(np.uint8)
        frames.append(Frame.from_planes(y, u, v))
    return frames


def run_encode(cfg, frames):
    from rav1e_tpu.api.context import EncoderError, EncoderStatus

    ctx = cfg.new_context()
    nbytes = 0
    got = 0

    def drain():
        nonlocal nbytes, got
        while True:
            try:
                nbytes += len(ctx.receive_packet().data)
                got += 1
            except EncoderError as e:
                if e.status in (EncoderStatus.NEED_MORE_DATA,
                                EncoderStatus.LIMIT_REACHED):
                    return
                raise

    for f in frames:
        ctx.send_frame(f)
        drain()
    ctx.flush()
    drain()
    assert got >= len(frames), (got, len(frames))
    return nbytes, ctx


def timed_fps(cfg, frames, runs=3):
    run_encode(cfg, frames)  # warmup: compile + tunnel wake
    times = []
    ctx = None
    for _ in range(runs):
        t0 = time.perf_counter()
        _, ctx = run_encode(cfg, frames)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    stages = {k: round(v, 2) for k, v in sorted(
        ctx._encoder.stats.stage_seconds.items(), key=lambda kv: -kv[1])[:8]}
    return len(frames) / med, [round(len(frames) / t, 3) for t in times], stages


def main() -> None:
    from rav1e_tpu.api.config import Config, EncoderConfig

    w, h = 1920, 1080
    out = {}
    try:
        # all-keyframe run (keyframe fps): interval 1
        kf_cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=100,
                                          min_key_frame_interval=1,
                                          max_key_frame_interval=1,
                                          rdo_lookahead_frames=8,
                                          low_latency=True))
        kf_fps, kf_runs, kf_stages = timed_fps(kf_cfg, make_frames(w, h, 8))
        out.update(metric="1080p_keyframe_fps", value=round(kf_fps, 3),
                   unit="frames/s",
                   vs_baseline=round(kf_fps / BASELINE_1080P_S6_FPS, 2),
                   runs=kf_runs, stages=kf_stages)
    except Exception as e:
        out.update(metric="1080p_keyframe_fps", value=0.0, unit="frames/s",
                   vs_baseline=0.0, error=f"{type(e).__name__}: {e}")
    try:
        # mixed GOP: 1 key + 15 inter, low latency (the realistic workload)
        mx_cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=100,
                                          max_key_frame_interval=240,
                                          rdo_lookahead_frames=8,
                                          low_latency=True))
        mx_fps, mx_runs, mx_stages = timed_fps(mx_cfg, make_frames(w, h, 16))
        out.update(mixed_gop_fps=round(mx_fps, 3),
                   mixed_vs_baseline=round(
                       mx_fps / BASELINE_1080P_S6_LL_FPS, 2),
                   mixed_runs=mx_runs, mixed_stages=mx_stages)
    except Exception as e:
        out.update(mixed_gop_fps=0.0, mixed_vs_baseline=0.0,
                   mixed_error=f"{type(e).__name__}: {e}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
