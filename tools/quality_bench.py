#!/usr/bin/env python
"""Quality benchmark: BD-rate (PSNR) of rav1e_tpu vs the installed
librav1e 0.5.1, both dav1d-decoded (BASELINE.json north-star metric).

Encodes synthetic clips at matched speed through both encoders over a
quantizer ladder, measures bitrate + decoded PSNR vs source, and computes
the Bjontegaard rate delta (piecewise-cubic PSNR-over-log-rate fit).
Negative BD-rate = we need fewer bits for equal PSNR.

Usage: python tools/quality_bench.py [--frames N] [--speed S] [--json OUT]
Reference analog: the AWCY BD-rate infrastructure upstream uses for
regression tracking (SURVEY.md section 4.6).
"""

from __future__ import annotations

import argparse
import ctypes
import json
import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rav1e_tpu.utils import dav1d_oracle as dav1d  # noqa: E402


# ---------------------------------------------------------------------------
# librav1e ctypes harness (C API symbols verified in SURVEY.md 2.1)
# ---------------------------------------------------------------------------


class _RaPacket(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("len", ctypes.c_size_t),
        ("input_frameno", ctypes.c_uint64),
        ("frame_type", ctypes.c_int),
        ("opaque", ctypes.c_void_p),
    ]


def _load_rav1e():
    lib = ctypes.CDLL("librav1e.so.0.5.1")
    lib.rav1e_config_default.restype = ctypes.c_void_p
    lib.rav1e_config_parse.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_char_p]
    lib.rav1e_config_parse_int.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.c_int]
    lib.rav1e_context_new.argtypes = [ctypes.c_void_p]
    lib.rav1e_context_new.restype = ctypes.c_void_p
    lib.rav1e_frame_new.argtypes = [ctypes.c_void_p]
    lib.rav1e_frame_new.restype = ctypes.c_void_p
    lib.rav1e_frame_fill_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_ssize_t, ctypes.c_int]
    lib.rav1e_send_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rav1e_receive_packet.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_void_p)]
    lib.rav1e_packet_unref.argtypes = [ctypes.c_void_p]
    lib.rav1e_frame_unref.argtypes = [ctypes.c_void_p]
    lib.rav1e_context_unref.argtypes = [ctypes.c_void_p]
    lib.rav1e_config_unref.argtypes = [ctypes.c_void_p]
    lib.rav1e_container_sequence_header.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t)]
    lib.rav1e_container_sequence_header.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


def rav1e_encode(frames, q: int, speed: int):
    """Encode via librav1e at constant quantizer; returns list of packet
    bytes (each a full temporal unit for dav1d when prefixed with a TD)."""
    lib = _load_rav1e()
    h, w = frames[0][0].shape
    cfg = lib.rav1e_config_default()
    assert lib.rav1e_config_parse_int(cfg, b"width", w) == 0
    assert lib.rav1e_config_parse_int(cfg, b"height", h) == 0
    assert lib.rav1e_config_parse_int(cfg, b"speed", speed) == 0
    assert lib.rav1e_config_parse_int(cfg, b"quantizer", q) == 0
    assert lib.rav1e_config_parse_int(cfg, b"threads", 1) == 0
    lib.rav1e_config_parse(cfg, b"low_latency", b"true")
    ctx = lib.rav1e_context_new(cfg)
    assert ctx

    pkts = []

    def drain():
        while True:
            pp = ctypes.c_void_p()
            ret = lib.rav1e_receive_packet(ctx, ctypes.byref(pp))
            if ret != 0 or not pp.value:
                return ret
            pkt = ctypes.cast(pp, ctypes.POINTER(_RaPacket)).contents
            pkts.append(ctypes.string_at(pkt.data, pkt.len))
            lib.rav1e_packet_unref(pp)

    for y, u, v in frames:
        f = lib.rav1e_frame_new(ctx)
        for i, p in enumerate((y, u, v)):
            pc = np.ascontiguousarray(p, np.uint8)
            lib.rav1e_frame_fill_plane(f, i, pc.ctypes.data, pc.size,
                                       pc.shape[1], 1)
        lib.rav1e_send_frame(ctx, f)
        lib.rav1e_frame_unref(f)
        drain()
    lib.rav1e_send_frame(ctx, None)  # flush
    drain()
    lib.rav1e_context_unref(ctx)
    lib.rav1e_config_unref(cfg)
    return pkts


# ---------------------------------------------------------------------------
# our encoder
# ---------------------------------------------------------------------------


def ours_encode(frames, q: int, speed: int):
    from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings
    from rav1e_tpu.api.context import EncoderError
    from rav1e_tpu.utils.frame import Frame

    h, w = frames[0][0].shape
    cfg = Config(enc=EncoderConfig(
        width=w, height=h, quantizer=q, low_latency=True,
        speed_settings=SpeedSettings.from_preset(speed)))
    ctx = cfg.new_context()
    pkts = []
    for y, u, v in frames:
        ctx.send_frame(Frame.from_planes(y, u, v))
        try:
            pkts.append(ctx.receive_packet())
        except EncoderError:
            pass
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderError:
            break
    return [p.data for p in pkts]


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def psnr_yuv(src_frames, dec_frames):
    """Weighted YUV PSNR (4:2:0: 4/6 Y + 1/6 U + 1/6 V), frame-averaged."""
    assert len(src_frames) == len(dec_frames), (len(src_frames),
                                                len(dec_frames))
    tot = 0.0
    for (sy, su, sv), d in zip(src_frames, dec_frames):
        mses = []
        for s, dd in ((sy, d[0]), (su, d[1]), (sv, d[2])):
            e = s.astype(np.float64) - dd.astype(np.float64)
            mses.append((e * e).mean())
        mse = (4 * mses[0] + mses[1] + mses[2]) / 6.0
        tot += 10 * np.log10(255.0 * 255.0 / max(mse, 1e-9))
    return tot / len(src_frames)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b):
    """Bjontegaard rate delta of B vs A in percent (negative: B cheaper).
    Cubic fit of log-rate over PSNR, integrated over the overlap."""
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    if hi <= lo:
        return float("nan")
    ia = np.polyint(pa)
    ib = np.polyint(pb)
    va = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    vb = (np.polyval(ib, hi) - np.polyval(ib, lo)) / (hi - lo)
    return float((np.exp(vb - va) - 1) * 100)


def make_clip(kind, w, h, n, seed=0):
    """Synthetic clips with temporally COHERENT texture (static noise field
    panned with the content), so inter prediction is meaningful for both
    encoders."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 64, 0 : w + 64]
    noise = rng.integers(-10, 10, (h + 64, w + 64))
    frames = []
    for t in range(n):
        if kind == "gradient":
            base = ((xx + yy * 2) % 256)
        elif kind == "texture":
            base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 13.0)).astype(np.int32)
        else:  # detail: checkerboard
            base = (((xx // 8 + yy // 8) % 2) * 160 + 48)
        dy, dx = t % 32, 2 * (t % 16)
        win = (base + noise)[dy : dy + h, dx : dx + w]
        y = np.clip(win, 0, 255).astype(np.uint8)
        u = ((xx[::2, ::2][: h // 2, : w // 2] + 30 + 2 * t) % 200 + 20).astype(np.uint8)
        v = ((yy[::2, ::2][: h // 2, : w // 2] + 80 - t) % 180 + 30).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def run(frames, q_ladder, speed, encoder):
    rates, psnrs = [], []
    npx = len(frames)
    for q in q_ladder:
        pkts = (rav1e_encode(frames, q, speed) if encoder == "rav1e"
                else ours_encode(frames, q, speed))
        from rav1e_tpu.obu.headers import temporal_delimiter

        if encoder == "rav1e":
            stream = [temporal_delimiter() + p for p in pkts]
        else:
            stream = list(pkts)
        dec = dav1d.decode_stream(stream)
        bits = sum(len(p) for p in pkts) * 8
        rates.append(bits / npx)  # bits per frame
        psnrs.append(psnr_yuv(frames, dec))
    return rates, psnrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--speed", type=int, default=6)
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    ladder = [80, 120, 160, 200]

    results = {}
    for kind in ("gradient", "texture", "detail"):
        # stable seed: str hash() is salted per process, which would make
        # every run encode a different clip
        seed = zlib.crc32(kind.encode()) & 0xFFFF
        frames = make_clip(kind, w, h, args.frames, seed=seed)
        ra_r, ra_p = run(frames, ladder, args.speed, "rav1e")
        us_r, us_p = run(frames, ladder, args.speed, "ours")
        bd = bd_rate(ra_r, ra_p, us_r, us_p)
        results[kind] = {
            "rav1e": {"bits_per_frame": ra_r, "psnr": ra_p},
            "ours": {"bits_per_frame": us_r, "psnr": us_p},
            "bd_rate_pct": bd,
        }
        print(f"{kind}: BD-rate(PSNR) vs rav1e speed {args.speed}: "
              f"{bd:+.1f}%")
        for i, q in enumerate(ladder):
            print(f"   q={q}: rav1e {ra_r[i]:8.0f} b/f {ra_p[i]:6.2f} dB | "
                  f"ours {us_r[i]:8.0f} b/f {us_p[i]:6.2f} dB")
    mean_bd = float(np.mean([r["bd_rate_pct"] for r in results.values()]))
    results["mean_bd_rate_pct"] = mean_bd
    print(f"MEAN BD-rate: {mean_bd:+.1f}%")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
