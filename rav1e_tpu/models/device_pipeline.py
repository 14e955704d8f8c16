"""Device-side (JAX/XLA) compute steps of the encode pipeline.

The TPU-first reformulation (SURVEY.md section 7): everything per-pixel and
batchable runs on device over the whole frame at once; the host entropy
pass consumes the decisions.  Mode analysis here mirrors the reference's
lookahead cost model (src/api/lookahead.rs estimate_intra_costs) but covers
the full candidate mode set used by the host RD loop.

`mode_analysis(y, n)`: evaluate every intra candidate mode for every n x n
block of a luma plane using source-edge approximation, returning the
per-block best mode and its SAD.  One fused jit graph per block size -
thousands of blocks batch over the VPU; no host round-trips.
"""

from __future__ import annotations

from functools import partial

import os

from rav1e_tpu.utils.jaxsetup import configure as _configure_jax

_configure_jax()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# mode ids must match ops.intra_np
DC, V, H = 0, 1, 2
D45, D135, D113, D157, D203, D67 = 3, 4, 5, 6, 7, 8
SMOOTH, SMOOTH_V, SMOOTH_H, PAETH = 9, 10, 11, 12

# candidate list mirrored from the host encoder (zone-2 directional only)
CANDIDATES = (DC, V, H, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH, D135, D113, D157)
_ANGLE = {D45: 45, D135: 135, D113: 113, D157: 157, D203: 203, D67: 67, V: 90, H: 180}

_TBL = np.load(__file__.rsplit("/", 2)[0] + "/ops/av1_tables.npz")
_DR = _TBL["dr_intra_derivative"]
_SM = _TBL["sm_weights"]


def _sm_weights(n: int) -> np.ndarray:
    off = {4: 0, 8: 4, 16: 12, 32: 28, 64: 60}[n]
    return _SM[off : off + n]


def _predict_all(y: jax.Array, n: int) -> tuple:
    """All candidate intra predictions for every n x n block from source
    edges.  Returns (blocks (by,bx,n,n), preds (nmodes,by,bx,n,n))."""
    Hh, Ww = y.shape
    by, bx = Hh // n, Ww // n
    blocks = y.reshape(by, n, bx, n).transpose(0, 2, 1, 3)  # (by,bx,n,n)

    pad = jnp.pad(y, ((1, 0), (1, 0)), constant_values=128)
    above = pad[0:Hh:n, 1:].reshape(by, bx, n)  # (by,bx,n)
    left = jnp.swapaxes(pad[1:, 0:Ww:n].reshape(by, n, bx), 1, 2)  # (by,bx,n)
    topleft = pad[0:Hh:n, 0:Ww:n].reshape(by, bx)  # (by,bx)

    A = above[..., None, :]  # (by,bx,1,n)
    L = left[..., :, None]  # (by,bx,n,1)
    TL = topleft[..., None, None]

    preds = []
    # DC
    dc = (above.sum(-1) + left.sum(-1) + n) // (2 * n)
    preds.append(jnp.broadcast_to(dc[..., None, None], blocks.shape))
    # V / H
    preds.append(jnp.broadcast_to(A, blocks.shape))
    preds.append(jnp.broadcast_to(L, blocks.shape))
    # SMOOTH family
    w = jnp.asarray(_sm_weights(n), jnp.int32)
    below = left[..., -1][..., None, None]
    right = above[..., -1][..., None, None]
    wy = w[None, None, :, None]
    wx = w[None, None, None, :]
    sm = (wy * A + (256 - wy) * below + wx * L + (256 - wx) * right + 256) >> 9
    preds.append(sm)
    preds.append((wy * A + (256 - wy) * below + 128) >> 8)
    preds.append((wx * L + (256 - wx) * right + 128) >> 8)
    # PAETH
    base = A + L - TL
    pa = jnp.abs(base - A)
    pl = jnp.abs(base - L)
    ptl = jnp.abs(base - TL)
    paeth = jnp.where((pl <= pa) & (pl <= ptl), jnp.broadcast_to(L, blocks.shape),
                      jnp.where(pa <= ptl, jnp.broadcast_to(A, blocks.shape),
                                jnp.broadcast_to(TL, blocks.shape)))
    preds.append(paeth)
    # zone-2 directional (90 < angle < 180): mix of above/left rays
    az = jnp.concatenate([topleft[..., None], above], axis=-1)  # (by,bx,n+1)
    lz = jnp.concatenate([topleft[..., None], left], axis=-1)
    rr = jnp.arange(n)[:, None]
    cc = jnp.arange(n)[None, :]
    for mode in (D135, D113, D157):
        ang = _ANGLE[mode]
        dx = int(_DR[180 - ang])
        dy = int(_DR[ang - 90])
        xpos = (cc << 6) - (rr + 1) * dx  # (n,n)
        base_x = xpos >> 6
        shift_x = (xpos >> 1) & 0x1F
        ypos = (rr << 6) - (cc + 1) * dy
        base_y = ypos >> 6
        shift_y = (ypos >> 1) & 0x1F
        ax_idx0 = jnp.clip(1 + base_x, 0, n)
        ax_idx1 = jnp.clip(2 + base_x, 0, n)
        av = (az[..., ax_idx0] * (32 - shift_x) + az[..., ax_idx1] * shift_x + 16) >> 5
        ly_idx0 = jnp.clip(1 + base_y, 0, n)
        ly_idx1 = jnp.clip(2 + base_y, 0, n)
        lv = (lz[..., ly_idx0] * (32 - shift_y) + lz[..., ly_idx1] * shift_y + 16) >> 5
        preds.append(jnp.where(base_x >= -1, av, lv))

    return blocks, jnp.stack(preds, axis=0)  # (nmodes, by, bx, n, n)


@partial(jax.jit, static_argnums=(1,))
def mode_analysis(y: jax.Array, n: int) -> tuple:
    """y: (H, W) int32 luma plane, H/W multiples of n.
    Returns (best_mode (by,bx) int32, best_sad (by,bx) int32)."""
    blocks, stack = _predict_all(y, n)
    sads = jnp.abs(stack - blocks[None]).sum((-1, -2))  # (nmodes, by, bx)
    best = jnp.argmin(sads, axis=0)
    best_sad = jnp.min(sads, axis=0)
    mode_ids = jnp.asarray(CANDIDATES, jnp.int32)
    return mode_ids[best], best_sad


# -- full RD analysis: transform-domain cost of the best mode per block ------
#
# The device half of rdo_partition_decision/rdo_mode_decision (src/rdo.rs):
# pick the best mode per block by SAD, forward-transform its residual (two
# MXU matmuls), quantize, and estimate distortion in the transform domain
# plus rate from a level-magnitude model.  The host compares cost(32x32)
# against the four 16x16 children to decide the partition split, then codes
# the chosen blocks exactly (no trial encodes).

# rate model: bits ~ RATE_NZ per significant coeff + RATE_MAG per magnitude
# octave (calibrated against the host tokenizer on test frames)
RATE_NZ = 1.45
RATE_MAG = 0.95
# tx-domain sse -> pixel sse (measured: 0.0163 +- 0.0003 for 16/32 DCT)
DIST_SCALE = {32: 0.0164, 16: 0.0164}


def _fwd_mats_np(n: int):
    from rav1e_tpu.ops.transforms_np import DCT_DCT, _fwd_mats

    Fv, FhT, scale = _fwd_mats(DCT_DCT, n, n)
    return np.asarray(Fv * np.sqrt(scale), np.float32), np.asarray(
        FhT * np.sqrt(scale), np.float32
    )


@partial(jax.jit, static_argnums=(1, 2))
def rd_analysis(y: jax.Array, n: int, q: tuple, lam: float) -> tuple:
    """Per-block best mode + RD cost for n x n blocks: the tx-domain RD
    (forward DCT + quantize + rate model) is evaluated for EVERY candidate
    mode and the argmin taken over true RD cost — the device analog of
    rdo_mode_decision (src/rdo.rs), not a SAD prefilter.  The per-mode
    transforms are batched MXU matmuls, which is exactly the work the
    systolic array is for; a SAD argmin measurably mispicks between
    structured (expensive) and noise-like (cheap) residuals.
    q: (dc_q, ac_q) static.  Returns (mode, cost, nnz) maps (by, bx)."""
    blocks, stack = _predict_all(y, n)
    resid = (blocks[None] - stack).astype(jnp.float32)  # (m,by,bx,n,n)
    Fv, FhT = (jnp.asarray(m) for m in _fwd_mats_np(n))
    coeffs = jnp.einsum("ij,mbyjk,kl->mbyil", Fv, resid, FhT)
    # quantize (deadzone 13/32, tx_scale shift folded into q)
    shift = 1 if n == 32 else 0
    dc_q, ac_q = q
    qm = jnp.full((n, n), ac_q, jnp.float32).at[0, 0].set(dc_q) / (1 << shift)
    mag = jnp.abs(coeffs)
    level = jnp.floor((mag + qm * (13.0 / 32.0)) / qm)
    # coeffs beyond the 32x32 coded area are dropped by the host; zero them
    if n > 32:
        level = level.at[..., 32:, :].set(0).at[..., :, 32:].set(0)
    dq = level * qm
    err = (mag - dq) * (1 << shift)
    dist = (err * err).sum((-1, -2)) * DIST_SCALE[n]  # (m,by,bx)
    nnz_all = (level > 0).sum((-1, -2))
    rate = RATE_NZ * nnz_all + RATE_MAG * jnp.log2(1.0 + level).sum((-1, -2))
    cost_all = dist + lam * (rate + 6.0)  # + mode/skip signaling ballpark
    best = jnp.argmin(cost_all, axis=0)  # (by,bx)
    mode_ids = jnp.asarray(CANDIDATES, jnp.int32)
    cost = jnp.take_along_axis(cost_all, best[None], axis=0)[0]
    nnz = jnp.take_along_axis(nnz_all, best[None], axis=0)[0]
    return mode_ids[best], cost, nnz


def frame_rd_maps(y_plane: np.ndarray, dc_q: int, ac_q: int, lam: float) -> dict:
    """Device RD maps for the partition decision: for 32 and 16 block sizes,
    (mode, cost, nnz); plus the 32->16 split decision map."""
    yj = jnp.asarray(y_plane, jnp.int32)
    out = {}
    for n in (32, 16):
        mode, cost, nnz = rd_analysis(yj, n, (dc_q, ac_q), float(lam))
        out[n] = (np.asarray(mode), np.asarray(cost), np.asarray(nnz))
    c32 = out[32][1]
    c16 = out[16][1]
    by, bx = c32.shape
    c16sum = c16.reshape(by, 2, bx, 2).sum(axis=(1, 3))
    out["split32"] = c16sum + float(lam) * 6.0 < c32
    return out


@partial(jax.jit, static_argnums=(1,))
def _band_maps_packed(y: jax.Array, q: tuple, lam) -> jax.Array:
    """Device-fused band analysis: mode maps for 32/16 blocks plus the
    32->16 split decision, packed into ONE int32 vector (the chip tunnel
    charges ~50-80 ms latency per transfer, so everything rides one)."""
    m32, c32, _ = rd_analysis(y, 32, q, lam)
    m16, c16, _ = rd_analysis(y, 16, q, lam)
    by, bx = c32.shape
    c16sum = c16.reshape(by, 2, bx, 2).sum(axis=(1, 3))
    split = (c16sum + lam * 6.0 < c32).astype(jnp.int32)
    return jnp.concatenate([m32.ravel(), m16.ravel(), split.ravel()])


class LaunchedBandMaps:
    """Handle to an in-flight band RD analysis (JAX async dispatch): maps
    for the frame's host-path edge band (partial superblocks), launched
    right after the wavefront pass so the chip computes them while the
    host walks the device output.  collect() returns frame_rd_maps-shaped
    numpy maps; the band's pixel offset rides on the handle."""

    def __init__(self, y0: int, x0: int, out: jax.Array, shape: tuple):
        self.y0 = y0
        self.x0 = x0
        self._out = out
        self._shape = shape  # band (h, w)
        try:
            out.copy_to_host_async()
        except Exception:
            pass

    def collect(self) -> dict:
        v = np.asarray(self._out)
        h, w = self._shape
        n32 = (h // 32) * (w // 32)
        n16 = (h // 16) * (w // 16)
        out = {
            32: (v[:n32].reshape(h // 32, w // 32),),
            16: (v[n32 : n32 + n16].reshape(h // 16, w // 16),),
            "split32": v[n32 + n16 :].reshape(h // 32, w // 32).astype(bool),
        }
        return out


def launch_band_rd_maps(y_band: np.ndarray, dc_q: int, ac_q: int,
                        lam: float, y0: int, x0: int) -> LaunchedBandMaps:
    """Async frame_rd_maps over a plane band (dims multiples of 32).
    Used for the partial-superblock edge rows/cols the wavefront pass
    does not cover: the host block coder consumes these mode/split maps
    instead of running per-block python RD trials (SURVEY 2.5 'device
    analysis feeds host entropy' for the frame edges)."""
    yj = jnp.asarray(y_band, jnp.int32)
    out = _band_maps_packed(yj, (int(dc_q), int(ac_q)), float(lam))
    return LaunchedBandMaps(y0, x0, out, y_band.shape)


def frame_mode_maps(y_plane: np.ndarray) -> dict:
    """Run device mode analysis for the block sizes the encoder uses.
    y_plane: padded (SB-aligned) int32 numpy luma plane."""
    yj = jnp.asarray(y_plane, jnp.int32)
    out = {}
    for n in (32, 16):
        modes, sads = mode_analysis(yj, n)
        out[n] = (np.asarray(modes), np.asarray(sads))
    return out


# -- motion estimation: hierarchical full search over candidate grids --------
#
# TPU-first reformulation of src/me.rs (SURVEY 2.5): instead of a serial
# diamond walk per block, evaluate ALL candidate offsets for ALL blocks as
# one batched reduction.  Stage A searches +-MAX_PX at quarter resolution;
# stage B refines +-3 px at full resolution around each block's winner.

ME_RANGE_PX = 32  # full-pel search radius (stage A, via quarter-res +-8)


def _block_sads(diff_abs: jax.Array, n: int) -> jax.Array:
    """diff_abs: (H, W) -> per-n x n-block sums (H/n, W/n)."""
    Hh, Ww = diff_abs.shape
    return diff_abs.reshape(Hh // n, n, Ww // n, n).sum(axis=(1, 3))


@partial(jax.jit, static_argnums=(2,))
def me_fullpel(src: jax.Array, ref: jax.Array, n: int) -> jax.Array:
    """Full-pel motion map for n x n blocks: (by, bx, 2) int32 in PIXELS.
    src/ref: (H, W) int32 planes (same padded shape, H/W multiples of n)."""
    Hh, Ww = src.shape
    # stage A: quarter resolution, exhaustive +-8 (=> +-32 px)
    q = 4
    Hq, Wq = Hh // q, Ww // q
    srcq = src[: Hq * q, : Wq * q].reshape(Hq, q, Wq, q).sum(axis=(1, 3))
    refq = ref[: Hq * q, : Wq * q].reshape(Hq, q, Wq, q).sum(axis=(1, 3))
    nq = max(2, n // q)
    rad = ME_RANGE_PX // q
    pad_ref = jnp.pad(refq, rad, mode="edge")
    offs = [(dy, dx) for dy in range(-rad, rad + 1) for dx in range(-rad, rad + 1)]
    costs = []
    for dy, dx in offs:
        shifted = pad_ref[rad + dy : rad + dy + Hq, rad + dx : rad + dx + Wq]
        costs.append(_block_sads(jnp.abs(srcq - shifted), nq))
    costs = jnp.stack(costs)  # (noffs, by, bx)
    best = costs.argmin(axis=0)
    offs_arr = jnp.asarray(offs, jnp.int32) * q  # full-res px
    mv_a = offs_arr[best]  # (by, bx, 2) px

    # stage B: full-res +-2 px around the stage-A winner (covers the
    # quarter-res stage's quantization; the wavefront's candidate race
    # adds subpel refinement on top)
    rad2 = 2
    pad_full = jnp.pad(ref, ME_RANGE_PX + rad2, mode="edge")
    by, bx = mv_a.shape[:2]
    # per-block shifted SAD: gather block windows at mv + delta
    ys = jnp.arange(n)
    xs = jnp.arange(n)
    byi = jnp.arange(by)[:, None] * n
    bxi = jnp.arange(bx)[None, :] * n
    src_blocks = src.reshape(by, n, bx, n).transpose(0, 2, 1, 3)
    costs2 = []
    deltas = [(dy, dx) for dy in range(-rad2, rad2 + 1) for dx in range(-rad2, rad2 + 1)]
    base_y = byi + mv_a[..., 0] + ME_RANGE_PX + rad2  # (by,bx)
    base_x = bxi + mv_a[..., 1] + ME_RANGE_PX + rad2
    for dy, dx in deltas:
        yy = base_y[..., None] + dy + ys[None, None, :]  # (by,bx,n)
        xx = base_x[..., None] + dx + xs[None, None, :]
        win = pad_full[yy[..., :, None], xx[..., None, :]]
        costs2.append(jnp.abs(src_blocks - win).sum((-1, -2)))
    costs2 = jnp.stack(costs2)
    best2 = costs2.argmin(axis=0)
    deltas_arr = jnp.asarray(deltas, jnp.int32)
    return mv_a + deltas_arr[best2]


def frame_me_map(src_y: np.ndarray, ref_y: np.ndarray, n: int = 32) -> np.ndarray:
    """Host wrapper: (by, bx, 2) full-pel MVs in 1/8-pel units."""
    mv = me_fullpel(jnp.asarray(src_y, jnp.int32), jnp.asarray(ref_y, jnp.int32), n)
    return np.asarray(mv) * 8


# ---------------------------------------------------------------------------
# legacy single-chip analysis step (kept as the driver's compile-check entry)
# ---------------------------------------------------------------------------


@jax.jit
def intra_analysis_step(sbs: jax.Array, qidx: jax.Array) -> jax.Array:
    """sbs: (N, 64, 64) int32 luma superblocks.  Returns (N, 8, 8) int32
    per-8x8-block minimal intra prediction cost (lookahead cost model)."""
    n = sbs.shape[0]
    blocks = jnp.moveaxis(sbs.reshape(n, 8, 8, 8, 8), 2, 3)
    padded = jnp.pad(sbs, ((0, 0), (1, 0), (1, 0)), constant_values=128)
    above = padded[:, 0:64:8, 1:].reshape(n, 8, 8, 8)
    left = jnp.moveaxis(padded[:, 1:, 0:64:8].reshape(n, 8, 8, 8), 2, 3)
    dc = (above.sum(-1) + left.sum(-1) + 8) // 16
    pred_dc = dc[..., None, None]
    pred_h = left[..., :, None] * jnp.ones((1, 1, 1, 1, 8), jnp.int32)
    pred_v = above[..., None, :] * jnp.ones((1, 1, 1, 8, 1), jnp.int32)

    def sad(pred):
        return jnp.abs(blocks - pred).sum((-1, -2))

    costs = jnp.stack([sad(pred_dc), sad(pred_h), sad(pred_v)], axis=-1)
    bias = 2 + (qidx.astype(jnp.int32) >> 5)
    return costs.min(-1) + bias


def sharded_intra_analysis(mesh: Mesh, sbs: jax.Array, qidx: jax.Array) -> jax.Array:
    """Shard the SB batch across the mesh's `sb` axis and run one step."""
    sharding = NamedSharding(mesh, P("sb", None, None))
    sbs = jax.device_put(sbs, sharding)
    fn = jax.jit(
        intra_analysis_step,
        in_shardings=(sharding, NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P("sb", None, None)),
    )
    return fn(sbs, qidx)


def sharded_mode_analysis(mesh: Mesh, y: jax.Array, n: int) -> tuple:
    """Frame mode analysis with SB rows sharded over the mesh (the tile/
    row-group axis); used by the multi-chip dry run."""
    shard = NamedSharding(mesh, P("sb", None))
    y = jax.device_put(y, shard)
    fn = jax.jit(
        mode_analysis,
        static_argnums=(1,),
        in_shardings=(shard,),
        out_shardings=(NamedSharding(mesh, P("sb", None)),) * 2,
    )
    return fn(y, n)
