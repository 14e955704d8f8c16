"""Per-superblock CDEF (cdef_bits = 3) conformance.

Validates the full per-SB syntax path — the 8-pair strength table in the
frame header, the cdef_idx literal interleaved at read_cdef positions
(spec 5.11.56: first non-skip block of each 64x64 unit, after skip /
segment-id on key frames, between skip and is_inter on inter frames),
and the per-SB filter apply — against dav1d's decode (ref src/cdef.rs
cdef_filter_superblock, src/rdo.rs rdo_loop_decision).

The per-SB *decision* is RD-driven and on small synthetic clips the
frame-level mode usually wins, so these tests force the decision (the
same pattern as the forced Wiener-taps test): with _SB_HDR_BITS driven
hugely negative the search always selects per-SB mode and the kernel
gathers its true spatially-varying argmin map, keeping recon and
signaling consistent by construction.
"""

import contextlib

import numpy as np
import pytest

from tests.test_inter_conformance import run_clip

dav1d = pytest.importorskip("rav1e_tpu.utils.dav1d_oracle")


@contextlib.contextmanager
def forced_per_sb():
    """Force the per-SB CDEF decision by making the header-rate penalty
    hugely negative; clears the shape-keyed kernel caches on both entry
    and exit so patched kernels never leak into other tests."""
    import rav1e_tpu.ops.cdef_jax as cj
    import rav1e_tpu.ops.filter_chain_jax as fc

    orig = cj._SB_HDR_BITS
    cj._SB_HDR_BITS = -1e12
    cj._SEARCH_KERNELS.clear()
    cj._SEARCH_KERNELS_PACKED.clear()
    fc._KERNELS.clear()
    try:
        yield
    finally:
        cj._SB_HDR_BITS = orig
        cj._SEARCH_KERNELS.clear()
        cj._SEARCH_KERNELS_PACKED.clear()
        fc._KERNELS.clear()


def persb_content(w, h, n=1, seed=11):
    """Heterogeneous content: ringing-prone hard edges left, noise
    texture right — different 64x64 units argmin to different strengths."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    edges = np.where((xx * 3 + yy) % 48 < 24, 60, 200)
    tex = rng.integers(0, 256, (h, w))
    y = np.where(xx < w // 2, edges + rng.integers(-8, 8, (h, w)), tex)
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return [(y, u, v)] * n


def _probe_run(frames, q):
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    seen = []
    orig = IntraFrameEncoder._lr_decide

    def probe(self):
        seen.append(self.cdef_sb)
        orig(self)

    IntraFrameEncoder._lr_decide = probe
    try:
        with forced_per_sb():
            run_clip(frames, q=q)
    finally:
        IntraFrameEncoder._lr_decide = orig
    return seen


def test_per_sb_cdef_conforms():
    """Key frame: cdef_bits=3, per-SB literals, dav1d bit-exact."""
    seen = _probe_run(persb_content(384, 256), q=210)
    engaged = [sb for sb in seen if sb is not None]
    assert engaged, "per-SB CDEF did not engage under forced decision"
    bits, y_codes, uv_codes, idx_map = engaged[0]
    assert bits == 3 and len(y_codes) == 8 and len(uv_codes) == 8
    assert idx_map.shape == (4, 6)


def test_per_sb_cdef_inter_conforms():
    """Inter frames: cdef_idx between skip and is_inter; bit-exact."""
    seen = _probe_run(persb_content(384, 256, n=3), q=200)
    assert any(sb is not None for sb in seen), "per-SB CDEF never engaged"


def test_per_sb_recorder_path_conforms():
    """The recorder replay path (non-native pass A -> _emit_tiles_lr with
    the cdef_insert callback): force use_native off so pass B goes through
    RecordingEncoder.replay, and drop the device-search area gate so the
    per-SB search still runs on a small frame."""
    import rav1e_tpu.models.intra_frame as m
    from rav1e_tpu.models.intra_frame import IntraFrameEncoder

    seen = []
    orig_dec = IntraFrameEncoder._lr_decide
    orig_init = IntraFrameEncoder.__init__
    orig_gate = m.DEV_CDEF_MIN_AREA

    def probe(self):
        seen.append(self.cdef_sb)
        orig_dec(self)

    def no_native_init(self, *a, **kw):
        kw["use_native"] = False
        orig_init(self, *a, **kw)

    IntraFrameEncoder._lr_decide = probe
    IntraFrameEncoder.__init__ = no_native_init
    m.DEV_CDEF_MIN_AREA = 0
    try:
        with forced_per_sb():
            run_clip(persb_content(384, 256), q=210)
    finally:
        IntraFrameEncoder._lr_decide = orig_dec
        IntraFrameEncoder.__init__ = orig_init
        m.DEV_CDEF_MIN_AREA = orig_gate
    assert any(sb is not None for sb in seen), "per-SB CDEF never engaged"


def test_per_sb_varied_map_conforms():
    """A clip whose forced per-SB map is genuinely spatial (left SBs get
    strong strengths, noise-texture SBs get weak/none).  q must stay low
    enough that recon noise keeps correlating with the source noise; at
    very coarse q the argmin legitimately saturates to the strongest pair
    everywhere."""
    seen = _probe_run(persb_content(448, 192, seed=4), q=160)
    engaged = [sb for sb in seen if sb is not None]
    assert engaged
    maps = [sb[3] for sb in engaged]
    assert any(len(np.unique(m)) > 1 for m in maps), maps
