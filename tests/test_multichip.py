"""Multi-chip (mesh-sharded) encode equivalence on the 8-device virtual
CPU mesh (conftest forces xla_force_host_platform_device_count=8).

The claims under test (SURVEY.md 2.6 tile->chip mapping):
- tile-column-sharded wavefront encode produces a bitstream BYTE-IDENTICAL
  to the single-device encode (tiles cut all deps; the tile axis is pure
  batch parallelism over the mesh);
- the ppermute halo-exchange deblock is bit-identical to the serial
  oracle."""

import numpy as np
import pytest

import jax

from rav1e_tpu.models.intra_frame import IntraFrameEncoder
from rav1e_tpu.parallel.mesh import make_mesh
from rav1e_tpu.parallel.tiles import deblock_sharded

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual mesh")


def content(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((xx * 2 + yy * 3) % 256 + rng.integers(-12, 12, (h, w)),
                0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + 50) % 210).astype(np.uint8)
    v = ((yy[::2, ::2] + 99) % 230).astype(np.uint8)
    return y, u, v


def encode(w, h, q, mesh=None, tiles_log2=3):
    y, u, v = content(w, h, 11)
    fe = IntraFrameEncoder(w, h, q_idx=q, device_modes=True,
                           tile_cols_log2=tiles_log2)
    if mesh is not None:
        fe.wavefront_mesh = mesh
    tile, recon = fe.encode([y.astype(np.int32), u.astype(np.int32),
                             v.astype(np.int32)])
    return tile, recon, fe


def test_sharded_encode_byte_identical():
    w, h = 512, 128  # 8 tile columns of one SB each
    tile_a, recon_a, _ = encode(w, h, 110)
    mesh = make_mesh(8)
    tile_b, recon_b, fe = encode(w, h, 110, mesh=mesh)
    for p in range(3):
        np.testing.assert_array_equal(recon_a[p], recon_b[p])
    assert tile_a == tile_b, (len(tile_a), len(tile_b))


def test_sharded_encode_conforms():
    from rav1e_tpu.obu.headers import (FrameParams, Sequence,
                                       temporal_delimiter, write_frame_obu,
                                       write_sequence_header_obu)

    w, h = 512, 128
    mesh = make_mesh(8)
    tile, recon, fe = encode(w, h, 130, mesh=mesh)
    seq = Sequence(width=w, height=h)
    fp = FrameParams(base_q_idx=130, disable_cdf_update=False,
                     tile_cols_log2=3)
    data = (temporal_delimiter() + write_sequence_header_obu(seq)
            + write_frame_obu(seq, fp, tile))
    dec, _ = dav1d.Dav1dDecoder().decode_packet(data)
    for i in range(3):
        assert np.array_equal(dec[i], recon[i].astype(np.uint8)), f"plane {i}"


@pytest.mark.parametrize("plane_idx,sub", [(0, (0, 0)), (1, (1, 1))])
def test_sharded_deblock_matches_oracle(plane_idx, sub):
    from rav1e_tpu.ops.deblock_np import DeblockInfo, deblock_plane

    rng = np.random.default_rng(5)
    w, h = 512, 128
    sub_x, sub_y = sub
    pw, ph = w >> sub_x, h >> sub_y
    info = DeblockInfo(h // 4, w // 4)
    y = 0
    while y < h:
        x = 0
        bh = int(rng.choice([16, 32]))
        while x < w:
            bw = int(rng.choice([16, 32]))
            info.set_block(x, y, bw, bh, bool(rng.integers(0, 2)))
            x += bw
        y += bh
    plane = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    levels = (24, 30, 18, 20)
    ref = plane.copy()
    deblock_plane(ref, info, plane_idx, levels, 2, sub_x, sub_y, 8, pw, ph)
    mesh = make_mesh(4)
    out = deblock_sharded(mesh, plane.copy(), info, levels, 2, plane_idx,
                          sub_x, sub_y, 8, pw, ph)
    np.testing.assert_array_equal(out, ref[:ph, :pw])
