"""Default CDF table sanity tests (values are AV1-spec constants extracted
from system codec binaries; see tools/extract_cdfs.py)."""

import numpy as np
import pytest

from rav1e_tpu.entropy.cdf import CdfContext, default_tables


def test_tables_present():
    d = default_tables()
    for name in (
        "coeff_base",
        "coeff_base_eob",
        "coeff_br",
        "txb_skip",
        "eob_extra",
        "dc_sign",
        "eob_pt_16",
        "eob_pt_1024",
        "kf_y_mode",
        "uv_mode",
        "partition",
        "skip",
        "angle_delta",
        "tx_size",
        "delta_q",
        "mv_joint",
        "mv_class",
    ):
        assert name in d, name


def test_known_spec_values():
    """Spot-check values that are quoted in the AV1 spec / reference code."""
    d = default_tables()
    # Default skip cdf probabilities: 31671, 16515, 4576
    assert d["skip"][0][0] == 32768 - 31671
    assert d["skip"][1][0] == 32768 - 16515
    assert d["skip"][2][0] == 32768 - 4576
    # kf_y first entry
    assert d["kf_y_mode"][0][0][0] == 32768 - 15588
    # mv_joint
    assert d["mv_joint"][0][0] == 32768 - 4096
    # partition 8x8 ctx0 first value
    assert d["partition"][0][0] == 32768 - 19132


def test_rows_are_valid_icdfs():
    d = default_tables()
    for name, t in d.items():
        rows = t.reshape(-1, t.shape[-1])
        for r in rows:
            vals = r[:-1].astype(int)  # drop counter
            if not vals.any():
                continue
            nz = vals[vals > 0]
            assert all(nz[i] > nz[i + 1] for i in range(len(nz) - 1)), (name, r)
            assert r[-1] == 0, (name, "counter must start 0")


def test_cdf_context_q_binding():
    ctx_lo = CdfContext(base_q_idx=10)
    ctx_hi = CdfContext(base_q_idx=200)
    assert ctx_lo.coeff_base.shape == ctx_hi.coeff_base.shape == (5, 2, 42, 5)
    assert not np.array_equal(ctx_lo.coeff_base, ctx_hi.coeff_base)
    assert ctx_lo.kf_y_mode.shape == (5, 5, 14)
    # mutating a context must not corrupt the defaults
    ctx_lo.skip[0][0] = 1
    assert default_tables()["skip"][0][0] == 32768 - 31671


@pytest.mark.parametrize(
    "q,expect", [(0, 0), (20, 0), (21, 1), (60, 1), (61, 2), (120, 2), (121, 3), (255, 3)]
)
def test_q_context(q, expect):
    assert CdfContext.q_context(q) == expect
