"""Device (TPU) inter motion compensation: AV1 8-tap separable subpel
interpolation as batched MXU matmuls.

Reference analog: src/mc.rs put_8tap and its x86 asm (SURVEY.md 2.5 "Subpel
MC + compound avg" -> "Pallas separable 8-tap conv ... batch over blocks").
The oracle is ops/mc_np.py::put_single; bit-exactness is mandatory (the
wavefront's inter reconstruction must equal what the decoder builds) and is
validated in tests/test_mc_device.py.

Formulation: for a batch of same-size blocks, the (h+7, w+7) reference
window of each block is gathered with one per-lane dynamic_slice from an
edge-replicated padded reference plane (replication == the decoder's sample
clamp to the real frame bounds, spec 7.11.3.2).  The horizontal and
vertical 8-tap passes are then einsum contractions against per-phase
banded filter matrices selected per lane by the MV's 1/16-pel phase -- all
16 phases ride one gather, so one jitted call serves any MV mix.  All
arithmetic stays in int32/fp32 with exact integer products (|values| <
2^24, so fp32 matmuls are exact) and the spec's two-stage rounding
(InterRound0 = 3, InterRound1 = 11 at 8/10-bit) is applied elementwise in
int32.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from rav1e_tpu.utils.jaxsetup import configure as _configure_jax

_configure_jax()

import jax
import jax.numpy as jnp

from rav1e_tpu.ops.mc_np import MC_FILTERS


def _taps_i32(fset: int) -> np.ndarray:
    """(16, 8) int32 tap table for one filter set (per 1/16-pel phase)."""
    return np.ascontiguousarray(MC_FILTERS[fset], np.int32)


_MAT_CACHE: dict = {}


def filter_mats(w: int, h: int, fset: int):
    """Cached device-resident per-phase tap tables for a w x h block (both
    return slots hold the same (16, 8) int32 table; the block dims are in
    the key only for call-site convenience)."""
    key = (w, h, fset)
    got = _MAT_CACHE.get(key)
    if got is None:
        t = jnp.asarray(_taps_i32(fset))
        got = (t, t)
        _MAT_CACHE[key] = got
    return got


def pad_ref_plane(ref: np.ndarray, margin: int, pad_h: int,
                  pad_w: int) -> np.ndarray:
    """Edge-replicate a real-size reference plane into a
    (pad_h + 2*margin, pad_w + 2*margin) array.  Replication from the real
    frame edges reproduces the decoder's sample-coordinate clamp exactly."""
    rh, rw = ref.shape
    return np.pad(np.asarray(ref, np.int32),
                  ((margin, margin + pad_h - rh),
                   (margin, margin + pad_w - rw)), mode="edge")


def mc_block_batch(ref_pad, margin: int, px, py, mvr, mvc, w: int, h: int,
                   sub_x: int, sub_y: int, bd: int, hmat, vmat):
    """Batched single-reference prediction: (B, h, w) int32 in pixel range.

    ref_pad: padded plane (this plane's subsampling applied) from
    pad_ref_plane.  px/py: (B,) int32 plane coords of each block.  mvr/mvc:
    (B,) int32 LUMA-space 1/8-pel MVs (chroma derives its 1/16-pel position
    by the subsampling shift, spec 7.11.3.2).  hmat/vmat: filter_mats for
    (w, h).  Caller guarantees every read stays inside the padded plane
    (clamp MVs so |mv_px| + 4 < margin)."""
    start_x = (px << 4) + (mvc << (1 - sub_x))
    start_y = (py << 4) + (mvr << (1 - sub_y))
    ix = (start_x >> 4) - 3 + margin
    iy = (start_y >> 4) - 3 + margin
    fx = start_x & 15
    fy = start_y & 15

    win = jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(ref_pad, (y0, x0),
                                             (h + 7, w + 7)))(iy, ix)
    # shift-and-MAC separable filtering in pure int32 (VPU elementwise):
    # exact by construction, and much faster on TPU than per-lane batched
    # tiny matmuls (whose fp32-exact form needs the slow HIGHEST mode)
    taps = hmat  # (16, 8) int32 filter table (one per 1/16-pel phase)
    tx = taps[fx]  # (B, 8)
    ty = taps[fy]
    round0 = 3 if bd < 12 else 5
    inter = jnp.zeros((win.shape[0], h + 7, w), jnp.int32)
    for t in range(8):
        inter = inter + tx[:, t, None, None] * win[:, :, t : t + w]
    inter = (inter + (1 << (round0 - 1))) >> round0
    out = jnp.zeros((win.shape[0], h, w), jnp.int32)
    for t in range(8):
        out = out + ty[:, t, None, None] * inter[:, t : t + h, :]
    out = (out + (1 << (14 - round0 - 1))) >> (14 - round0)
    return jnp.clip(out, 0, (1 << bd) - 1)


@partial(jax.jit, static_argnums=(1, 6, 7, 8, 9, 10))
def _put_batch_jit(ref_pad, margin, px, py, mvr, mvc, w, h, sub_x, sub_y,
                   bd, hmat, vmat):
    return mc_block_batch(ref_pad, margin, px, py, mvr, mvc, w, h,
                          sub_x, sub_y, bd, hmat, vmat)


def put_single_batch(ref: np.ndarray, blocks, mvs, w: int, h: int,
                     sub_x: int = 0, sub_y: int = 0, bd: int = 8,
                     fset: int = 0, margin: int = 48) -> np.ndarray:
    """Convenience host wrapper (tests / host callers): blocks (B, 2) of
    (px, py) plane coords, mvs (B, 2) luma-space (row, col) 1/8-pel."""
    blocks = np.asarray(blocks, np.int32)
    mvs = np.asarray(mvs, np.int32)
    pad_h = ((ref.shape[0] + 63) & ~63) + 64
    pad_w = ((ref.shape[1] + 63) & ~63) + 64
    rp = jnp.asarray(pad_ref_plane(ref, margin, pad_h, pad_w))
    hmat, vmat = filter_mats(w, h, fset)
    out = _put_batch_jit(rp, margin, jnp.asarray(blocks[:, 0]),
                         jnp.asarray(blocks[:, 1]), jnp.asarray(mvs[:, 0]),
                         jnp.asarray(mvs[:, 1]), w, h, sub_x, sub_y, bd,
                         hmat, vmat)
    return np.asarray(out)
