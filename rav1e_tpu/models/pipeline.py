"""Frame encoder pipeline: per-frame orchestration of device analysis,
entropy coding and OBU packaging.

Reference analog: the encode_frame path of src/encoder.rs.
"""

from __future__ import annotations

import numpy as np

from rav1e_tpu.models.intra_frame import IntraFrameEncoder
from rav1e_tpu.obu.headers import (
    FrameParams,
    Sequence,
    temporal_delimiter,
    write_frame_obu,
    write_sequence_header_obu,
)


class FrameEncoder:
    def __init__(self, enc_config):
        self.cfg = enc_config
        self.seq = Sequence(
            width=enc_config.width,
            height=enc_config.height,
            bit_depth=enc_config.bit_depth,
            subsampling_x=enc_config.chroma_sampling[0],
            subsampling_y=enc_config.chroma_sampling[1],
        )
        self.frame_count = 0
        self.last_recon = None

    def encode_key_frame(self, frame) -> bytes:
        q = self.cfg.quantizer
        fe = IntraFrameEncoder(
            self.cfg.width,
            self.cfg.height,
            q_idx=q,
            bit_depth=self.cfg.bit_depth,
            adapt_cdf=True,
            speed=self.cfg.speed_settings.speed,
        )
        planes = [p.window() for p in frame.planes]
        tile, recon = fe.encode(planes)
        self.last_recon = recon

        fp = FrameParams(
            base_q_idx=q,
            disable_cdf_update=False,
            order_hint=self.frame_count & 0x7F,
        )
        out = temporal_delimiter()
        out += write_sequence_header_obu(self.seq)
        out += write_frame_obu(self.seq, fp, tile)
        self.frame_count += 1
        return out
