"""Tile-parallel encode over a device mesh.

Reference analog: rav1e's rayon tile parallelism (src/tiling/tiler.rs +
encode_tile_group) — there, threads over shared memory; here, TILE COLUMNS
shard over the mesh's `sb` axis.  AV1 tiles cut every prediction/context
dependency, so the per-tile wavefront passes (models/wavefront.py) run
with ZERO collectives — the tile axis is a batch axis laid over ICI.
Cross-tile work exists only in the in-loop filters; deblock_sharded
exchanges boundary halos with jax.lax.ppermute and recomputes the shared
edge columns redundantly on both neighbors (bit-identical to the
single-device pass).

The encode path is validated by byte-identical bitstreams vs the
single-device encoder (tests/test_multichip.py; __graft_entry__ runs the
same check on the driver's virtual mesh).
"""

from __future__ import annotations

import numpy as np

from rav1e_tpu.utils.jaxsetup import configure as _configure_jax

_configure_jax()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rav1e_tpu.models import wavefront as wfm


class ShardedWavefrontResult:
    """WavefrontResult-compatible view over per-tile sharded outputs:
    frame-coordinate sb_records / split_map / recon assembled from T
    tile-local results."""

    def __init__(self, fe, tile_results, tile_w_sb):
        self.tile_results = tile_results
        self.tile_w_sb = tile_w_sb
        t0 = tile_results[0]
        sb_rows = t0.geom.device_sb.shape[0]
        sb_cols = tile_w_sb * len(tile_results)
        self.geom_device_sb = np.zeros((sb_rows, sb_cols), bool)
        self.split_map = np.zeros((sb_rows * 2, sb_cols * 2), bool)
        self.split16_map = np.zeros((sb_rows * 4, sb_cols * 4), bool)
        # full-grid 64-root map assembled from the per-tile none64 lanes
        self.none64_full = np.zeros((sb_rows, sb_cols), bool)
        for t, r in enumerate(tile_results):
            c0 = t * tile_w_sb
            self.geom_device_sb[:, c0 : c0 + tile_w_sb] = r.geom.device_sb
            self.split_map[:, 2 * c0 : 2 * (c0 + tile_w_sb)] = r.split_map
            self.split16_map[:, 4 * c0 : 4 * (c0 + tile_w_sb)] = r.split16_map
            if r.none64 is not None:
                g = r.geom
                dev = g.device_sb
                n64 = np.zeros(dev.shape, bool)
                n64[dev] = r.none64[g.sb_step[dev], g.sb_lane[dev]]
                self.none64_full[:, c0 : c0 + tile_w_sb] = n64
        self.rec = [
            np.concatenate([r.rec[p] for r in tile_results], axis=1)
            for p in range(3)
        ]

        class _G:  # geometry facade for _encode_tiles_wavefront
            device_sb = self.geom_device_sb

        self.geom = _G()

    def sb_records(self, r, c):
        t = c // self.tile_w_sb
        recs = self.tile_results[t].sb_records(r, c % self.tile_w_sb)
        x_off = t * self.tile_w_sb * 64
        return [(x + x_off, y, bw, bh, *rest)
                for (x, y, bw, bh, *rest) in recs]


def run_wavefront_sharded(fe, tiles, mesh: Mesh):
    """Tile-column-sharded device pass.  Requirements: uniform tile
    columns of equal SB width, single tile row, no partial superblocks,
    and len(tiles) laid over the mesh axis.  Returns a WavefrontResult
    facade, or None if the frame does not fit the sharded envelope."""
    ncols = len(tiles)
    sb_cols = (fe.coded_w + 63) >> 6
    sb_rows = (fe.coded_h + 63) >> 6
    if ncols < 2 or sb_cols % ncols or fe.coded_w % 64 or fe.coded_h % 64:
        return None
    if any(r0 != 0 or r1 != sb_rows for (_, r0, _, r1) in tiles):
        return None  # tile rows not supported in the sharded path
    tw = sb_cols // ncols
    tile_w = tw * 64

    # per-tile geometry: identical for every column (tile-relative
    # availability; contexts reset per tile)
    geom = wfm.geometry_for(tile_w, fe.coded_h, tile_w, fe.h,
                            tile_w // 4, fe.mi_rows,
                            ((0, 0, tw, sb_rows),))
    if geom is None:
        return None
    K, B = geom.steps, geom.width
    # candidate-mode set shared with the single-device pass (drift here
    # would silently desync the byte-identical contract)
    mmask = wfm._mode_mask(fe)
    fn = wfm.build_pass(fe.h, tile_w, K, B, fe.bd,
                        bool(fe.cfl_search and fe.q > 0),
                        bool(fe.tx_type_search and fe.q > 0),
                        bool(fe.fine_dir), mmask, tile_w // 4, fe.mi_rows,
                        bool(fe.rdo_partition),
                        bool(getattr(fe, "rdo_split8", False)),
                        bool(getattr(fe, "uv_search", False) and fe.q > 0),
                        bool(getattr(fe, "rdo_none64", False)))

    lam_q = np.full((K, B, 4), fe.lam, np.float32)
    qdc_q = np.full((K, B, 4), fe.dc_q, np.float32)
    qac_q = np.full((K, B, 4), fe.ac_q, np.float32)
    params = np.concatenate([
        lam_q.ravel(), qdc_q.ravel(), qac_q.ravel(),
        wfm._mode_bit_params(fe)]).astype(np.float32)

    # per-tile packed uploads: (T, n) with the tile axis sharded
    ups = []
    for t in range(ncols):
        x0 = t * tile_w
        ups.append(np.concatenate([
            fe.src[0][:, x0 : x0 + tile_w].astype(np.uint8).ravel(),
            fe.src[1][:, x0 >> 1 : (x0 + tile_w) >> 1].astype(np.uint8).ravel(),
            fe.src[2][:, x0 >> 1 : (x0 + tile_w) >> 1].astype(np.uint8).ravel(),
            params.view(np.uint8)]))
    up = np.stack(ups)

    shard = NamedSharding(mesh, P("sb"))
    rep = NamedSharding(mesh, P())
    dev = [jnp.asarray(a) for a in (geom.sbr, geom.sbc, geom.valid,
                                    geom.avail, geom.avail8, geom.allow_z1)]
    vfn = jax.jit(jax.vmap(fn, in_axes=(0,) + (None,) * 6),
                  in_shardings=(shard,) + (rep,) * 6,
                  out_shardings=(shard, shard))
    vec, p16 = vfn(jax.device_put(up, shard), *dev)
    out = np.asarray(vec)

    results = []
    for t in range(ncols):
        results.append(wfm.unpack_wavefront(geom, fe, out[t], tile_w,
                                            packed16=p16[t]))
    return ShardedWavefrontResult(fe, results, tw)


# ---------------------------------------------------------------------------
# sharded deblock with ppermute halo exchange
# ---------------------------------------------------------------------------


def deblock_sharded(mesh: Mesh, plane: np.ndarray, info, levels, sharpness,
                    plane_idx, sub_x, sub_y, bd, width, height) -> np.ndarray:
    """Column-sharded deblock of one plane, bit-identical to the
    single-device pass (deblock_jax / deblock_np).  Vertical edges near a
    shard boundary read up to 16 px across it; each shard receives halos
    from its neighbors over ICI via jax.lax.ppermute and recomputes the
    boundary edges redundantly (deterministic, so both sides agree)."""
    from jax import shard_map

    from rav1e_tpu.ops import deblock_jax as dj
    from rav1e_tpu.ops.deblock_np import thresholds

    n = mesh.devices.size
    wt = width // n
    assert width % n == 0 and wt % 4 == 0, (width, n)
    # halo must be a multiple of the largest transform dim so slab-local
    # x keeps the same residues mod tx size as plane-global x
    HPX = 64
    H_MI = (HPX << sub_x) // 4  # halo width in luma-mi units

    lv_v = levels[0 if plane_idx == 0 else 1 + plane_idx]
    lv_h = levels[1 if plane_idx == 0 else 1 + plane_idx]
    lim_v = thresholds(lv_v, sharpness, bd) if lv_v else (0, 0, 0)
    lim_h = thresholds(lv_h, sharpness, bd) if lv_h else (0, 0, 0)

    def body(img, txv, bxv, txh_, byh, skp):
        img = img[0]
        txv, bxv, txh_, byh, skp = (a[0] for a in (txv, bxv, txh_, byh, skp))
        idx = jax.lax.axis_index("sb")

        def halo(arr, hw):
            from_left = jax.lax.ppermute(
                arr[:, -hw:], "sb", [(i, i + 1) for i in range(n - 1)])
            from_right = jax.lax.ppermute(
                arr[:, :hw], "sb", [(i, i - 1) for i in range(1, n)])
            return jnp.concatenate([from_left, arr, from_right], axis=1)

        if lv_v:
            ext = halo(img, HPX)
            txe = halo(txv, H_MI)
            ske = halo(skp, H_MI)
            # bpos entries are plane-global x; shift into slab coords so
            # the edge positions compare correctly
            bpe = halo(bxv, H_MI) - idx * wt + HPX
            # frame-boundary shards: the missing halo must reproduce the
            # single-device semantics — replicated edge pixels (the plane
            # clamp) and NO filterable edges (skip=1, bpos off-scale)
            hh = img.shape[0]
            first = idx == 0
            last = idx == n - 1
            ext = ext.at[:, :HPX].set(jnp.where(
                first, jnp.broadcast_to(img[:, :1], (hh, HPX)),
                ext[:, :HPX]))
            ext = ext.at[:, -HPX:].set(jnp.where(
                last, jnp.broadcast_to(img[:, -1:], (hh, HPX)),
                ext[:, -HPX:]))
            ske = ske.at[:, :H_MI].set(jnp.where(first, 1, ske[:, :H_MI]))
            ske = ske.at[:, -H_MI:].set(jnp.where(last, 1, ske[:, -H_MI:]))
            bpe = bpe.at[:, :H_MI].set(jnp.where(first, -(1 << 20),
                                                 bpe[:, :H_MI]))
            bpe = bpe.at[:, -H_MI:].set(jnp.where(last, -(1 << 20),
                                                  bpe[:, -H_MI:]))
            # only positions that are edges of the REAL plane may filter
            # (the slab sees phantom edge positions at the frame borders)
            Es = (wt + 2 * HPX) // 4 - 1
            ex_plane = (jnp.arange(Es) + 1) * 4 - HPX + idx * wt
            edge_ok = (ex_plane >= 4) & (ex_plane <= width - 4)
            out = dj._pass_dir(jnp, ext, *lim_v, bd, plane_idx,
                               wt + 2 * HPX, height, txe, bpe, ske != 0,
                               sub_y, sub_x, edge_valid=edge_ok)
            img = out[:, HPX : HPX + wt]
        if lv_h:
            img = dj._pass_dir(jnp, img.T, *lim_h, bd, plane_idx,
                               height, wt, txh_.T, byh.T, (skp != 0).T,
                               sub_x, sub_y).T
        return img[None]

    sm = shard_map(
        body, mesh=mesh,
        in_specs=(P("sb", None, None),) * 6,
        out_specs=P("sb", None, None))

    def split_cols(a, per):
        return np.stack([np.ascontiguousarray(a[:, i * per : (i + 1) * per])
                         for i in range(n)])

    mi_per = (wt << sub_x) // 4
    img_s = split_cols(np.ascontiguousarray(plane[:height, :width]), wt)
    out = sm(jnp.asarray(img_s.astype(np.int32)),
             jnp.asarray(split_cols(info.txw >> sub_x, mi_per)),
             jnp.asarray(split_cols(info.bx >> sub_x, mi_per)),
             jnp.asarray(split_cols(info.txh >> sub_y, mi_per)),
             jnp.asarray(split_cols(info.by >> sub_y, mi_per)),
             jnp.asarray(split_cols(info.skip.astype(np.int32), mi_per)))
    out = np.asarray(out)
    return np.concatenate([out[i] for i in range(n)], axis=1)


class ShardedLaunch:
    """LaunchedWavefront-compatible handle for the tile-sharded pass."""

    def __init__(self, fe, tiles, mesh):
        self.fe = fe
        self.tiles = tiles
        self.mesh = mesh

    def collect(self):
        return run_wavefront_sharded(self.fe, self.tiles, self.mesh)


def launch_sharded(fe, tiles, mesh: Mesh):
    """Sharded launch hook for IntraFrameEncoder (fe.wavefront_mesh).
    Returns None when the frame/tile layout is outside the sharded
    envelope (caller falls back to the single-device launch)."""
    ncols = len(tiles)
    sb_cols = (fe.coded_w + 63) >> 6
    if (ncols < 2 or sb_cols % ncols or fe.coded_w % 64 or fe.coded_h % 64):
        return None
    return ShardedLaunch(fe, tiles, mesh)
