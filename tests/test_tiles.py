"""Multi-tile encode conformance: tiles are context-independent, muxed with
le32 size prefixes, CDFs saved from tile 0 (context_update_tile_id).
Reference analog: src/tiling/ + the tile matrix of src/test_encode_decode.
"""

import numpy as np
import pytest

from rav1e_tpu.api.config import Config, EncoderConfig
from rav1e_tpu.utils.frame import Frame
from tests.test_inter_conformance import moving_content, static_content

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def run_tiled(frames, q, tile_cols, tile_rows):
    h, w = frames[0][0].shape
    cfg = Config(enc=EncoderConfig(width=w, height=h, quantizer=q,
                                   tile_cols=tile_cols, tile_rows=tile_rows))
    from tests.test_inter_conformance import drive

    ctx = cfg.new_context()
    pkts = drive(ctx, [Frame.from_planes(y, u, v) for y, u, v in frames])
    shown = [p.input_frameno for p in pkts if p.shows]
    recons = [ctx._encoder.recon_by_input[no] for no in shown]
    decoded = dav1d.decode_stream([p.data for p in pkts])
    assert len(decoded) == len(recons)
    for i, (dec, rec) in enumerate(zip(decoded, recons)):
        for p in range(3):
            assert np.array_equal(dec[p].astype(np.int32), rec[p]), (
                f"frame {i} plane {p}"
            )
    return [p.data for p in pkts]


def test_two_col_tiles_intra():
    run_tiled(static_content(256, 128, 1, seed=2), q=100, tile_cols=2, tile_rows=1)


def test_2x2_tiles_intra():
    run_tiled(static_content(256, 192, 1, seed=4), q=140, tile_cols=2, tile_rows=2)


def test_tiles_inter():
    run_tiled(moving_content(256, 128, 3, dx=4, dy=2), q=120, tile_cols=2, tile_rows=1)


def test_tiles_partial_sb():
    """Tile grid over a frame with partial superblocks."""
    run_tiled(moving_content(200, 136, 2, dx=2, dy=2), q=150, tile_cols=2, tile_rows=2)
