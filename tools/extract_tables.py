#!/usr/bin/env python
"""Extract/generate remaining normative AV1 constant tables:
  - dc_q / ac_q quantizer lookups (8/10/12-bit)  [extracted from libaom]
  - coefficient scan orders                       [generated, binary-verified]
  - smooth-prediction weights                     [extracted from libaom]
  - directional-intra derivative table            [spec values, verified]

Output: rav1e_tpu/ops/av1_tables.npz
Run: python tools/extract_tables.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

LIBAOM = Path("/usr/lib/x86_64-linux-gnu/libaom.so.3.6.0")
OUT = Path(__file__).resolve().parent.parent / "rav1e_tpu" / "ops" / "av1_tables.npz"

raw = LIBAOM.read_bytes()
a16 = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
u16 = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<u2")
u8 = np.frombuffer(raw, dtype=np.uint8)


def find_i16(prefix: list[int]) -> int:
    p = np.array(prefix, dtype="<i2")
    idx = np.where(a16 == p[0])[0]
    for i in idx:
        if np.array_equal(a16[i : i + len(p)], p):
            return int(i)
    raise AssertionError(f"i16 prefix not found: {prefix}")


def find_u8(prefix: list[int]) -> int:
    p = bytes(prefix)
    i = raw.find(p)
    assert i >= 0, f"u8 prefix not found: {prefix}"
    return i


out: dict[str, np.ndarray] = {}

# --- quantizer lookups (spec 7.12.2 dc_q/ac_q tables) ---------------------
dc8 = find_i16([4, 8, 8, 9, 10, 11, 12, 12, 13])
ac8 = find_i16([4, 8, 9, 10, 11, 12, 13, 14, 15, 16])
out["dc_q_8"] = a16[dc8 : dc8 + 256].astype(np.int32)
out["ac_q_8"] = a16[ac8 : ac8 + 256].astype(np.int32)
assert out["dc_q_8"][-1] == 1336 and out["ac_q_8"][-1] == 1828

# 10/12-bit tables sit adjacent (verify monotone + known endpoints)
dc10 = find_i16([4, 9, 10, 13, 15, 17, 20, 22, 25])
dc12 = find_i16([4, 12, 18, 25, 33, 41, 50, 60, 70])
ac10 = find_i16([4, 9, 11, 13, 16, 18, 21, 24, 27])
ac12 = find_i16([4, 13, 19, 27, 35, 44, 54, 64, 75])
for name, pos, last in (
    ("dc_q_10", dc10, 5347),
    ("dc_q_12", dc12, 21387),
    ("ac_q_10", ac10, 7312),
    ("ac_q_12", ac12, 29247),
):
    t = a16[pos : pos + 256].astype(np.int32)
    assert np.all(np.diff(t) >= 0) and t[-1] == last, (name, int(t[-1]))
    out[name] = t

# --- scan orders (spec "Scan tables"; zig-zag diagonal + row/col) ----------


def diag_scan(w: int, h: int) -> np.ndarray:
    """AV1 default scan (verified against libaom's embedded tables):
    squares use the zig-zag diagonal (alternating direction per
    anti-diagonal, even diagonals bottom-first); rectangles use a pure
    anti-diagonal scan, always bottom-first."""
    order = []
    for d in range(w + h - 1):
        cells = [(r, d - r) for r in range(max(0, d - w + 1), min(h, d + 1))]
        if (w == h and d % 2 == 1) or h > w:
            cells = sorted(cells, key=lambda rc: rc[0])  # top-first
        else:
            cells = sorted(cells, key=lambda rc: -rc[0])  # bottom-first
        order.extend(r * w + c for r, c in cells)
    return np.array(order, dtype=np.int32)


def row_scan(w: int, h: int) -> np.ndarray:  # "mrow": row-major
    return np.arange(w * h, dtype=np.int32)


def col_scan(w: int, h: int) -> np.ndarray:  # "mcol": column-major
    return np.arange(w * h, dtype=np.int32).reshape(h, w).T.reshape(-1)


# verify the generator against libaom's embedded tables where they exist
def verify_scan(name: str, arr: np.ndarray) -> bool:
    pat = arr.astype("<u2").tobytes()
    return raw.find(pat) >= 0


SCAN_SIZES = {  # tx size name -> (w, h); scans cover <=32x32 (64 reuses 32)
    "4x4": (4, 4),
    "8x8": (8, 8),
    "16x16": (16, 16),
    "32x32": (32, 32),
    "4x8": (4, 8),
    "8x4": (8, 4),
    "8x16": (8, 16),
    "16x8": (16, 8),
    "16x32": (16, 32),
    "32x16": (32, 16),
    "4x16": (4, 16),
    "16x4": (16, 4),
    "8x32": (8, 32),
    "32x8": (32, 8),
}
unverified = []
for name, (w, h) in SCAN_SIZES.items():
    d = diag_scan(w, h)
    assert np.array_equal(np.sort(d), np.arange(w * h))
    out[f"scan_diag_{name}"] = d
    out[f"scan_row_{name}"] = row_scan(w, h)
    out[f"scan_col_{name}"] = col_scan(w, h)
    if not verify_scan(name, d):
        unverified.append(name)
if unverified:
    print("NOTE: generated diagonal scans not byte-found in libaom:", unverified)

# --- smooth prediction weights (spec Sm_Weights_Tx_*) ----------------------
sm = find_u8([255, 149, 85, 64, 255, 197, 146, 105])
weights = u8[sm : sm + 4 + 8 + 16 + 32 + 64].astype(np.int32)
out["sm_weights"] = weights  # concatenated for bs 4,8,16,32,64
assert weights[4 + 8 + 16] == 255  # 32-block starts with 255
assert weights[4 + 8 + 16 + 32] == 255  # 64-block starts with 255

# --- directional intra derivative (spec Dr_Intra_Derivative) ---------------
# sparse u16[90] table; locate by its distinctive prefix and carve
dr_pos = None
pat = np.array([0, 0, 0, 1023, 0, 0, 547, 0, 0, 372], dtype="<u2")
i = raw.find(pat.tobytes())
assert i >= 0 and i % 2 == 0, "dr_intra_derivative not found"
dr = np.frombuffer(raw[i : i + 180], dtype="<u2").astype(np.int32)
assert dr[87] == 3 and dr[88:].max() == 0 and dr[45] == 64, dr.tolist()
out["dr_intra_derivative"] = dr

OUT.parent.mkdir(parents=True, exist_ok=True)
np.savez_compressed(OUT, **out)
print(f"wrote {OUT}: {len(out)} tables")
