#!/usr/bin/env python
"""One-off diagnostic: per-section bit accounting of our inter frames on a
quality_bench clip.  Buckets each block's bits into mode-info vs per-plane
residual, and histograms the mode/skip/MV decisions."""
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from tools.quality_bench import make_clip  # noqa: E402
from rav1e_tpu.models import inter_frame as inter  # noqa: E402

ACC = Counter()
MODES = Counter()
MVS = Counter()


def _patch():
    orig_block = inter.InterFrameEncoder._block
    orig_res = inter.InterFrameEncoder._residual_any
    orig_decide = inter.InterFrameEncoder._decide_inter

    def block(self, x, y, bw, bh):
        orig_block(self, x, y, bw, bh)
        ACC["blocks"] += 1

    def residual_any(self, plane, px, py, tw, th, levels, y_mode, is_inter,
                     tx_type=0):
        if plane == 0:
            orig_res(self, plane, px, py, tw, th, levels, y_mode, is_inter,
                     tx_type)
        else:
            orig_res(self, plane, px, py, tw, th, levels, y_mode, is_inter)
        ACC[f"resid_p{plane}"] += self._trial_rate_txb(
            plane, px, py, tw, th, levels, 0)
        ACC[f"resid_n{plane}"] += 1
        if levels is not None:
            ACC[f"nzc_p{plane}"] += int(np.count_nonzero(levels))
            ACC[f"abs_p{plane}"] += int(np.abs(levels).sum())

    def decide(self, x, y, bw, bh, tile):
        rid, mode, mv, idx, res = orig_decide(self, x, y, bw, bh, tile)
        if mode is None:
            MODES["INTRA"] += 1
        else:
            MODES[f"{mode}:{rid}"] += 1
            if not isinstance(mv, tuple) or isinstance(mv[0], tuple):
                MVS[str(mv)] += 1
            else:
                MVS[mv] += 1
        return rid, mode, mv, idx, res

    inter.InterFrameEncoder._block = block
    inter.InterFrameEncoder._residual_any = residual_any
    inter.InterFrameEncoder._decide_inter = decide


def main():
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    kind = sys.argv[3] if len(sys.argv) > 3 else "gradient"
    import zlib

    seed = zlib.crc32(kind.encode()) & 0xFFFF
    frames = make_clip(kind, 640, 360, n, seed=seed)
    _patch()
    from tools.quality_bench import ours_encode

    pkts = ours_encode(frames, q, 6)
    print("pkt sizes:", [len(p) for p in pkts])
    print(f"blocks={ACC['blocks']}")
    res_bits = 0.0
    for p in range(3):
        res_bits += ACC[f"resid_p{p}"]
        print(f"  plane{p}: resid ~{ACC[f'resid_p{p}']:.0f}b in "
              f"{ACC[f'resid_n{p}']} txbs, {ACC[f'nzc_p{p}']} nz coeffs, "
              f"abs sum {ACC[f'abs_p{p}']}")
    inter_bytes = sum(len(p) for p in pkts[1:])
    print(f"  residual est total {res_bits/8:.0f}B of {inter_bytes}B inter "
          f"packets -> mode-info+overhead ~{inter_bytes - res_bits/8:.0f}B")
    print("modes:", dict(MODES))
    print("top MVs:", MVS.most_common(8))


if __name__ == "__main__":
    main()
