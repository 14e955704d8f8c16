import time, numpy as np
from rav1e_tpu.api.config import Config, EncoderConfig
from rav1e_tpu.utils.frame import Frame

w, h = 1920, 1080
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:h, 0:w]
frames = []
for t in range(4):
    y = ((xx + yy + 4 * t) % 256).astype(np.uint8)
    y = np.clip(y.astype(np.int16) + rng.integers(-8, 8, y.shape), 0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] // 2 + t) % 256).astype(np.uint8)
    v = ((yy[::2, ::2] // 2 + 2 * t) % 256).astype(np.uint8)
    frames.append(Frame.from_planes(y, u, v))

cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=100,
                               min_key_frame_interval=1, max_key_frame_interval=1,
                               rdo_lookahead_frames=1, low_latency=True))
ctx = cfg.new_context()
for _ in range(2):
    ctx.send_frame(frames[0]); ctx.receive_packet()
base = dict(ctx.stats.stage_seconds)
t0 = time.perf_counter()
for f in frames: ctx.send_frame(f)
for _ in frames: ctx.receive_packet()
dt = time.perf_counter() - t0
print("fps", 4/dt, "total", dt)
ss = ctx.stats.stage_seconds
diff = {k: ss[k] - base.get(k, 0.0) for k in ss}
tot = sum(diff.values())
for k, v in sorted(diff.items(), key=lambda x: -x[1]):
    print(f"{k}: {v/4*1000:.0f} ms/frame")
print(f"accounted {tot:.2f}s of {dt:.2f}s wall")
