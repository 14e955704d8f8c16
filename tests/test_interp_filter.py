"""Frame-level interpolation-filter selection (REGULAR/SMOOTH/SHARP).

The filter rides the frame header (spec read_interpolation_filter) and
every MC prediction; dav1d must track whichever filter the encoder
signals.  Reference analog: rav1e's FilterMode set (src/mc.rs), selected
per block in its RDO — here selected per frame by a subpel SATD probe.
"""

import numpy as np
import pytest

from rav1e_tpu.ops import mc_np as mc

from tests.test_inter_conformance import run_clip

pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def _pan_clip(n=3, dx=3, dy=5, w=128, h=96, seed=4):
    """Subpel-ish diagonal pan over textured content (forces non-zero
    subpel MVs so the filter actually matters)."""
    rng = np.random.default_rng(seed)
    big = np.clip(
        (np.add.outer(np.arange(h + 64), np.arange(w + 64)) * 7 % 230)
        + rng.integers(-30, 30, (h + 64, w + 64)), 0, 255
    ).astype(np.uint8)
    # half-pel motion content: blur so subpel interpolation wins
    big = (big.astype(np.int32) + np.roll(big, 1, 1) + np.roll(big, 1, 0)
           + np.roll(big, (1, 1), (0, 1))) // 4
    big = big.astype(np.uint8)
    frames = []
    for t in range(n):
        y = big[16 + t * dy // 2 : 16 + t * dy // 2 + h,
                16 + t * dx // 2 : 16 + t * dx // 2 + w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((np.ascontiguousarray(y), u, v))
    return frames


@pytest.mark.parametrize("filt", [mc.FILTER_SMOOTH, mc.FILTER_SHARP])
def test_forced_filter_conforms(filt):
    """Force a non-default frame filter end to end: header signaling and
    every subpel MC path must stay dav1d bit-exact."""
    import rav1e_tpu.models.inter_frame as inf

    orig = inf.InterFrameEncoder._choose_interp_filter

    def force(self):
        self.interp_filter = filt

    inf.InterFrameEncoder._choose_interp_filter = force
    try:
        run_clip(_pan_clip(), q=110, low_latency=True)
    finally:
        inf.InterFrameEncoder._choose_interp_filter = orig


def test_filter_selection_runs_and_conforms():
    """The probe picks some filter (whatever wins) and the stream decodes
    bit-exactly; the chosen value must be a legal header filter."""
    import rav1e_tpu.models.inter_frame as inf

    seen = []
    orig = inf.InterFrameEncoder._choose_interp_filter

    def probe(self):
        orig(self)
        seen.append(self.interp_filter)

    inf.InterFrameEncoder._choose_interp_filter = probe
    try:
        run_clip(_pan_clip(n=4), q=110, low_latency=True)
    finally:
        inf.InterFrameEncoder._choose_interp_filter = orig
    assert seen and all(f in (0, 1, 2) for f in seen), seen
