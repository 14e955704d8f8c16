"""Bit-exactness of the device (JAX) kernels vs the numpy oracles —
the checkasm analog (SURVEY.md section 4.4) for the wavefront datapath:
inverse transforms, quantize/dequantize, edge build, all intra predictors
(including per-block dynamic angles) and the CFL helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from rav1e_tpu.ops import intra_jax as ij
from rav1e_tpu.ops import intra_np as ip
from rav1e_tpu.ops import quantize_np as qz
from rav1e_tpu.ops import transforms_jax as tj
from rav1e_tpu.ops import transforms_np as tn

RNG = np.random.default_rng(7)

ALL_DIMS = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
            (8, 16), (16, 8), (16, 32), (32, 16), (32, 64), (64, 32),
            (4, 16), (16, 4), (8, 32), (32, 8), (16, 64), (64, 16)]


def _valid(tt, w, h):
    vert, horz, _, _ = tn._TX1D[tt]
    if (vert == "adst" and h > 16) or (horz == "adst" and w > 16):
        return False
    if (vert == "id" and h > 32) or (horz == "id" and w > 32):
        return False
    return True


@pytest.mark.parametrize("dims", ALL_DIMS)
def test_inv_txfm_exact(dims):
    w, h = dims
    for tt in range(16):
        if not _valid(tt, w, h):
            continue
        x = RNG.integers(-(1 << 15), 1 << 15, (3, h, w)).astype(np.int32)
        if w == 64:
            x[..., :, 32:] = 0
        if h == 64:
            x[..., 32:, :] = 0
        got = np.asarray(tj.inv_txfm(jnp.asarray(x), tt, 8))
        for b in range(3):
            ref = tn.inverse_transform(x[b], tt, 8)
            assert np.array_equal(got[b], ref), (dims, tt)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_quant_dequant_exact(n):
    cf = RNG.integers(-(1 << 17), 1 << 17, (n, n)).astype(np.int32)
    sh = qz.tx_scale(n, n)
    lv_ref = qz.quantize(cf, 8000, 7800, n, n)
    lv = np.asarray(tj.quantize(jnp.asarray(cf), 8000, 7800, sh))
    assert np.array_equal(lv_ref, lv)
    dq_ref = qz.dequantize(lv_ref, 8000, 7800, n, n, 8)
    dq = np.asarray(tj.dequantize(jnp.asarray(lv), 8000, 7800, sh, 8))
    assert np.array_equal(dq_ref, dq)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_edges_and_predict_exact(n):
    rec = RNG.integers(0, 256, (256, 320)).astype(np.int32)
    recj = jnp.asarray(rec)
    B = 24
    ys = (RNG.integers(1, (256 - 2 * n) // n, B) * n).astype(np.int32)
    xs = (RNG.integers(1, (320 - 2 * n) // n, B) * n).astype(np.int32)
    has = RNG.integers(0, 2, B).astype(bool)
    hls = RNG.integers(0, 2, B).astype(bool)
    ntr = (RNG.integers(0, 2, B) * n).astype(np.int32)
    nbl = (RNG.integers(0, 2, B) * n).astype(np.int32)
    aj, lj = ij.build_edges_batch(recj, jnp.asarray(ys), jnp.asarray(xs), n, n,
                                  jnp.asarray(has), jnp.asarray(hls),
                                  jnp.asarray(ntr), jnp.asarray(nbl),
                                  317, 253, 8)
    an, ln = np.asarray(aj), np.asarray(lj)
    for t in range(B):
        a_ref, l_ref = ip.build_edges(rec, int(xs[t]), int(ys[t]), n, n,
                                      bool(has[t]), bool(hls[t]), 8,
                                      n_top_right=int(ntr[t]),
                                      n_bottom_left=int(nbl[t]),
                                      max_x=317, max_y=253)
        assert np.array_equal(an[t], a_ref)
        assert np.array_equal(ln[t], l_ref)
    stack = np.asarray(ij.predict_stack(aj, lj, n, n, jnp.asarray(has),
                                        jnp.asarray(hls), 8))
    for t in range(B):
        for mode in range(13):
            ref = ip.predict(mode, an[t], ln[t], n, n, bool(has[t]),
                             bool(hls[t]), 0, 8)
            assert np.array_equal(stack[t, mode], ref), (mode, t)
    for mode in ip.DIRECTIONAL_MODES:
        for d in (-3, 2):
            ang = jnp.full((B,), ip.MODE_ANGLE[mode] + 3 * d, jnp.int32)
            got = np.asarray(ij.dr_predict_batch(aj, lj, ang, n, n))
            for t in range(B):
                ref = ip.predict(mode, an[t], ln[t], n, n, bool(has[t]),
                                 bool(hls[t]), d, 8)
                assert np.array_equal(got[t], ref), (mode, d, t)


@pytest.mark.parametrize("n", [16, 32])
def test_predict_dirs_matmul_exact(n):
    """The one-matmul 56-variant directional path must equal intra_np
    across every (mode, delta) and availability combo."""
    rec = RNG.integers(0, 256, (256, 320)).astype(np.int32)
    B = 12
    ys = (RNG.integers(1, (256 - 2 * n) // n, B) * n).astype(np.int32)
    xs = (RNG.integers(1, (320 - 2 * n) // n, B) * n).astype(np.int32)
    has = RNG.integers(0, 2, B).astype(bool)
    hls = RNG.integers(0, 2, B).astype(bool)
    ntr = (RNG.integers(0, 2, B) * n).astype(np.int32)
    nbl = (RNG.integers(0, 2, B) * n).astype(np.int32)
    aj, lj = ij.build_edges_batch(jnp.asarray(rec), jnp.asarray(ys),
                                  jnp.asarray(xs), n, n, jnp.asarray(has),
                                  jnp.asarray(hls), jnp.asarray(ntr),
                                  jnp.asarray(nbl), 317, 253, 8)
    dirs = np.asarray(ij.predict_dirs(aj, lj, n))
    an, ln = np.asarray(aj), np.asarray(lj)
    for mi, mode in enumerate(ij.DIR_MODE_IDS):
        for dd, d in enumerate(range(-3, 4)):
            for t in range(B):
                ref = ip.predict(mode, an[t], ln[t], n, n, bool(has[t]),
                                 bool(hls[t]), d, 8)
                assert np.array_equal(dirs[t, mi, dd], ref), (mode, d, t)


def test_cfl_helpers_exact():
    for n in (8, 16):
        blk = RNG.integers(0, 256, (5, 2 * n, 2 * n)).astype(np.int32)
        acj = np.asarray(ij.cfl_ac_420_batch(jnp.asarray(blk)))
        for t in range(5):
            assert np.array_equal(acj[t], ip.cfl_ac_420(blk[t]))
        dc = RNG.integers(0, 256, (5, n, n)).astype(np.int32)
        al = np.asarray([3, -7, 0, 16, -16], np.int32)
        cj = np.asarray(ij.cfl_predict_batch(jnp.asarray(dc), jnp.asarray(acj),
                                             jnp.asarray(al), 8))
        for t in range(5):
            assert np.array_equal(cj[t], ip.cfl_predict(dc[t], acj[t],
                                                        int(al[t]), 8))
