"""Loop restoration (Wiener) conformance + behavior.

The decoded output includes dav1d's LR pass; it must equal our restored
reconstruction exactly (validates read_lr placement, subexp tap coding,
stripe-aligned unit geometry and the two-pass filter arithmetic)."""

import numpy as np
import pytest

from tests.test_inter_conformance import moving_content, run_clip

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


def blurry_content(w, h, n, seed=0):
    """Smooth content + noise at high q: Wiener restoration engages."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 32, 0 : w + 32]
    base = (128 + 80 * np.sin(xx / 17.0) * np.cos(yy / 23.0)).astype(np.int32)
    frames = []
    for t in range(n):
        y = np.clip(base[t : t + h, 2 * t : 2 * t + w]
                    + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append((y, u, v))
    return frames


def test_lr_engages_and_conforms():
    """At mid q on noisy smooth content the Wiener filter should fire on
    some units, and the stream must decode bit-exactly."""
    run_clip(blurry_content(192, 128, 2, seed=3), q=140)


def test_lr_highq():
    run_clip(blurry_content(128, 192, 2, seed=5), q=210)


def test_lr_partial_units():
    """Frame dims forcing merged trailing restoration units."""
    run_clip(blurry_content(200, 136, 2, seed=7), q=170)


@pytest.mark.parametrize("bd,dims", [(8, (200, 136)), (10, (96, 120))])
def test_device_wiener_matches_numpy(bd, dims):
    """The jitted device Wiener frame filter must be bit-exact vs the
    numpy oracle (integer arithmetic, stripe gather rule included)."""
    from rav1e_tpu.ops import lrf_np as lr
    from rav1e_tpu.ops.lrf_jax import wiener_filter_frame_device

    w, h = dims
    rng = np.random.default_rng(bd)
    mx = (1 << bd) - 1
    ph = (h + 63) & ~63
    pw = (w + 63) & ~63
    cdef_p = rng.integers(0, mx + 1, (ph, pw)).astype(np.int32)
    db_p = np.clip(cdef_p + rng.integers(-6, 7, (ph, pw)), 0, mx)
    for vt, ht in (((1, -3, 15), (2, -5, 20)), ((0, 0, 0), (3, -7, 15)),
                   ((-5, -23, -17), (10, 8, 46))):
        ref = lr.wiener_filter_frame(cdef_p, db_p, vt, ht, 64, bd, w, h)
        dev = wiener_filter_frame_device(cdef_p, db_p, vt, ht, 64, bd, w, h)
        np.testing.assert_array_equal(ref, dev)


def test_lr_improves_psnr():
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    y, u, v = blurry_content(192, 128, 1, seed=11)[0]
    planes = [y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)]
    res = {}
    for lrf in (False, True):
        fe = IntraFrameEncoder(192, 128, q_idx=160, lf_levels=(25,) * 4,
                               cdef_damping=5, device_modes=False)
        fe.lrf = lrf
        _, rec = fe.encode([p.copy() for p in planes])
        res[lrf] = np.mean((rec[0].astype(float) - planes[0]) ** 2)
    assert res[True] <= res[False] * 1.0005, res


# -- SGRPROJ / switchable restoration ----------------------------------------

def test_sgr_forced_sets_conform():
    """Force SGRPROJ with representative parameter sets (dual-pass,
    3x3-only, 5x5-only) and extreme xqd values; every stream must decode
    bit-exactly (validates the guided filter integer pipeline, the
    decode_xq projection mapping and the subexp recentering)."""
    import numpy as np
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder
    from rav1e_tpu.ops import lrf_np as lr
    from rav1e_tpu.ops import sgr_np as sg
    from tests.test_inter_conformance import run_clip

    def make(si, xqd):
        def forced(self):
            self._lr_params = {}
            rows = lr.unit_ranges(self.LR_UNIT, self.out_h, shifted=True)
            cols = lr.unit_ranges(self.LR_UNIT, self.out_w)
            cdef_p = self.rec[0]
            db_p = self._deblock_copy[0]
            f0, f1 = sg.sgr_flt_frame(cdef_p, db_p, si, self.bd,
                                      self.out_w, self.out_h)
            for ur, (y0, y1) in enumerate(rows):
                for uc, (x0, x1) in enumerate(cols):
                    base = cdef_p[y0:y1, x0:x1].astype(np.int64)
                    f0u = f0[y0:y1, x0:x1] if f0 is not None else None
                    f1u = f1[y0:y1, x0:x1] if f1 is not None else None
                    out = sg.sgr_apply(base, f0u, f1u, xqd, si, self.bd)
                    self._lr_params[(ur, uc)] = ("sgr", si, xqd, out)
        return forced

    orig = IntraFrameEncoder._lr_decide
    try:
        for si, xqd in ((4, (10, 20)), (10, (0, -32)), (14, (25, 103)),
                        (0, (-96, 95))):
            IntraFrameEncoder._lr_decide = make(si, xqd)
            run_clip(blurry_content(192, 128, 1, seed=3), q=140)
    finally:
        IntraFrameEncoder._lr_decide = orig


def test_lr_speed5_full_search_conforms():
    """Speed 5: per-unit Wiener taps + SGR set search, mixed unit types;
    end-to-end dav1d conformance."""
    from rav1e_tpu.api.config import EncoderConfig, SpeedSettings

    run_clip(blurry_content(320, 240, 2, seed=9), q=150,
             speed_settings=SpeedSettings.from_preset(5))


def test_per_unit_wiener_taps_conform():
    """Distinct Wiener taps per unit (subexp tap deltas vs evolving refs)."""
    import numpy as np
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder
    from rav1e_tpu.ops import lrf_np as lr

    def forced(self):
        self._lr_params = {}
        rows = lr.unit_ranges(self.LR_UNIT, self.out_h, shifted=True)
        cols = lr.unit_ranges(self.LR_UNIT, self.out_w)
        cdef_p = self.rec[0]
        db_p = self._deblock_copy[0]
        taps = [((1, -3, 15), (2, -5, 20)), ((-2, 6, 30), (0, -10, 8)),
                ((5, -20, 40), (-5, 8, 25)), ((0, 0, 0), (3, -7, 15))]
        i = 0
        for ur, (y0, y1) in enumerate(rows):
            for uc, (x0, x1) in enumerate(cols):
                vt, ht = taps[i % len(taps)]
                i += 1
                out = lr.wiener_filter_unit(cdef_p, db_p, x0, y0, x1, y1,
                                            vt, ht, 64, self.bd,
                                            self.out_w, self.out_h)
                self._lr_params[(ur, uc)] = ("wiener", vt, ht, out)

    orig = IntraFrameEncoder._lr_decide
    try:
        IntraFrameEncoder._lr_decide = forced
        run_clip(blurry_content(192, 128, 1, seed=3), q=140)
    finally:
        IntraFrameEncoder._lr_decide = orig


def test_chroma_lr_engages_and_conforms():
    """Chroma restoration (RESTORE_WIENER planes, lr_uv_shift=1): noisy
    chroma must engage per-unit chroma Wiener and decode bit-exactly."""
    import numpy as np
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    rng = np.random.default_rng(7)
    w, h, n = 192, 128, 1
    yy, xx = np.mgrid[0 : h, 0 : w]
    base = (128 + 70 * np.sin(xx / 15.0) * np.cos(yy / 21.0)).astype(np.int32)
    y = np.clip(base + rng.integers(-8, 8, (h, w)), 0, 255).astype(np.uint8)
    cb = (120 + 50 * np.sin(xx[::2, ::2] / 9.0)).astype(np.int32)
    u = np.clip(cb + rng.integers(-14, 14, (h // 2, w // 2)), 0, 255).astype(np.uint8)
    v = np.clip(255 - cb + rng.integers(-14, 14, (h // 2, w // 2)), 0, 255).astype(np.uint8)

    engaged = []
    orig = IntraFrameEncoder._lr_decide_chroma

    def probe(self):
        orig(self)
        engaged.append(tuple(self.lr_types))

    IntraFrameEncoder._lr_decide_chroma = probe
    try:
        run_clip([(y, u, v)], q=160)
    finally:
        IntraFrameEncoder._lr_decide_chroma = orig
    assert any(t[1] == 2 or t[2] == 2 for t in engaged), engaged
