"""Quantization / dequantization (spec 7.12.2, 7.13.3).

Dequantization is NORMATIVE: level -> (level * q & 0xFFFFFF) >> tx_scale,
clamped at the inverse-transform input.  The forward quantizer is an encoder
choice (reference analog: src/quantize.rs) - we use a deadzone rounding
bias like the reference.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_TABLES = np.load(Path(__file__).parent / "av1_tables.npz")


def dc_q(q_idx: int, delta: int = 0, bit_depth: int = 8) -> int:
    i = int(np.clip(q_idx + delta, 0, 255))
    return int(_TABLES[f"dc_q_{bit_depth}"][i])


def ac_q(q_idx: int, delta: int = 0, bit_depth: int = 8) -> int:
    i = int(np.clip(q_idx + delta, 0, 255))
    return int(_TABLES[f"ac_q_{bit_depth}"][i])


import os as _os

# deadzone bias numerator (x/32 of a quantizer step).  16/32 (round-half)
# won the BD-rate ladder vs 13/32 (mean -25.5% vs -18.6% against rav1e s6,
# 2026-08-19); override via RAV1E_TPU_QUANT_BIAS - quantize_np, transforms_jax
# and native/block_intra.cc all read this single value.
QUANT_BIAS_NUM = int(_os.environ.get("RAV1E_TPU_QUANT_BIAS", "16"))


def tx_scale(w: int, h: int) -> int:
    """spec av1_get_tx_scale: extra right-shift for large transforms."""
    pels = w * h
    return (1 if pels > 256 else 0) + (1 if pels > 1024 else 0)


def quantize(coeffs: np.ndarray, dc: int, ac: int, w: int, h: int) -> np.ndarray:
    """coeffs: (h, w) int32 from forward_transform.  Returns levels (h, w).

    Deadzone quantizer: bias 13/32 of a step (tuned empirically on this
    encoder: dominates 21/32 and round-half on both size and PSNR for intra
    and inter; see PROGRESS notes 2026-08-16)."""
    shift = tx_scale(w, h)
    q = np.full(coeffs.shape, ac, dtype=np.int64)
    q.flat[0] = dc
    x = coeffs.astype(np.int64) << shift
    sign = np.sign(x)
    mag = np.abs(x)
    bias = (q * QUANT_BIAS_NUM) >> 5
    level = (mag + bias) // q
    # clamp level magnitude to the coded range
    level = np.minimum(level, (1 << 15) - 1)
    return (sign * level).astype(np.int32)


def dequantize(levels: np.ndarray, dc: int, ac: int, w: int, h: int, bit_depth: int = 8) -> np.ndarray:
    """Normative dequant: (|level|*q & 0xFFFFFF) >> tx_scale, signed,
    clamped to the inverse-transform input range."""
    shift = tx_scale(w, h)
    q = np.full(levels.shape, ac, dtype=np.int64)
    q.flat[0] = dc
    sign = np.sign(levels.astype(np.int64))
    mag = (np.abs(levels.astype(np.int64)) * q) & 0xFFFFFF
    dq = sign * (mag >> shift)
    lim = 1 << (bit_depth + 7)
    return np.clip(dq, -lim, lim - 1).astype(np.int32)
