#!/usr/bin/env python
"""One-off diagnostic: per-frame packet sizes + per-plane PSNR on the
quality_bench 'gradient' clip, ours vs librav1e, at one q."""
import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.quality_bench import make_clip, rav1e_encode, ours_encode  # noqa: E402
from rav1e_tpu.utils import dav1d_oracle as dav1d  # noqa: E402
from rav1e_tpu.obu.headers import temporal_delimiter  # noqa: E402


def plane_psnr(s, d):
    e = s.astype(np.float64) - d.astype(np.float64)
    mse = max((e * e).mean(), 1e-9)
    return 10 * np.log10(255.0 ** 2 / mse)


def report(name, frames, pkts, prepend_td):
    stream = [temporal_delimiter() + p for p in pkts] if prepend_td else list(pkts)
    dec = dav1d.decode_stream(stream)
    print(f"== {name}: total {sum(len(p) for p in pkts)} bytes")
    for i, ((sy, su, sv), d) in enumerate(zip(frames, dec)):
        size = len(pkts[i]) if i < len(pkts) else -1
        print(f"  f{i:02d} {size:6d}B  Y {plane_psnr(sy, d[0]):6.2f} "
              f"U {plane_psnr(su, d[1]):6.2f} V {plane_psnr(sv, d[2]):6.2f}")


def main():
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seed = zlib.crc32(b"gradient") & 0xFFFF
    frames = make_clip("gradient", 640, 360, n, seed=seed)
    ra = rav1e_encode(frames, q, 6)
    report("rav1e", frames, ra, True)
    us = ours_encode(frames, q, 6)
    report("ours", frames, us, False)


if __name__ == "__main__":
    main()
