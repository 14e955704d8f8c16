#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: 1080p key-frame encode fps on one chip, vs the locally measured
rav1e 0.5.1 speed-6 baseline (0.38 fps, see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_1080P_S6_FPS = 0.38


def main() -> None:
    from rav1e_tpu.api.config import Config, EncoderConfig
    from rav1e_tpu.utils.frame import Frame

    w, h = 1920, 1080
    rng = np.random.default_rng(0)
    # synthetic moving-gradient + noise content (same recipe as BASELINE.md)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    nframes = 8
    for t in range(nframes):
        y = ((xx + yy + 4 * t) % 256).astype(np.uint8)
        y = np.clip(y.astype(np.int16) + rng.integers(-8, 8, y.shape), 0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] // 2 + t) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] // 2 + 2 * t) % 256).astype(np.uint8)
        frames.append(Frame.from_planes(y, u, v))

    try:
        # all-keyframe run (the metric is keyframe fps): interval 1
        cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=100,
                                       min_key_frame_interval=1,
                                       max_key_frame_interval=1,
                                       rdo_lookahead_frames=8,
                                       low_latency=True))
        def run() -> int:
            # queue all frames then flush: consecutive key frames batch
            # into one wavefront pass, and the device overlaps the host
            # entropy pass (lookahead pipelining)
            ctx = cfg.new_context()
            for f in frames:
                ctx.send_frame(f)
            ctx.flush()
            return sum(len(ctx.receive_packet().data) for _ in frames)

        # warmup with the SAME queued pattern as the timed run: compiles
        # every wavefront variant the run will use (single-frame plus the
        # F=4/F=2 batched key-frame passes) and absorbs the chip tunnel's
        # first-transfer stall (it wakes slowly after idle periods)
        run()
        t0 = time.perf_counter()
        nbytes = run()
        dt = time.perf_counter() - t0
        fps = nframes / dt
        print(
            json.dumps(
                {
                    "metric": "1080p_keyframe_fps",
                    "value": round(fps, 3),
                    "unit": "frames/s",
                    "vs_baseline": round(fps / BASELINE_1080P_S6_FPS, 2),
                }
            )
        )
    except Exception as e:  # encoder not far enough along yet
        print(
            json.dumps(
                {
                    "metric": "1080p_keyframe_fps",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )


if __name__ == "__main__":
    main()
