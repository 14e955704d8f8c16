"""Native (C++) MSAC must be byte-identical to the python oracle."""

import random

import numpy as np
import pytest

from rav1e_tpu.ec.msac import MsacDecoder, MsacEncoder

native = pytest.importorskip("rav1e_tpu.ec.native")


def make_cdf(probs):
    acc = 32768
    icdf = []
    for p in probs:
        acc -= p
        icdf.append(acc)
    return np.array(icdf + [0], dtype=np.uint16)


def test_symbol_stream_parity():
    rng = random.Random(42)
    ops = []
    for _ in range(4000):
        kind = rng.choice(["sym", "bool", "lit"])
        if kind == "sym":
            ns = rng.choice([2, 3, 4, 8, 13])
            probs = [32768 // ns] * ns
            probs[0] += 32768 - sum(probs)
            ops.append(("sym", rng.randrange(ns), make_cdf(probs), rng.random() < 0.7))
        elif kind == "bool":
            ops.append(("bool", rng.randint(0, 1), rng.randint(64, 32700)))
        else:
            n = rng.randint(1, 12)
            ops.append(("lit", rng.randint(0, (1 << n) - 1), n))

    py = MsacEncoder()
    cc = native.NativeMsacEncoder()
    py_cdfs = {}
    cc_cdfs = {}
    for i, op in enumerate(ops):
        if op[0] == "sym":
            _, s, cdf, adapt = op
            key = cdf.tobytes()
            py_c = py_cdfs.setdefault((i, key), cdf.copy())
            cc_c = cc_cdfs.setdefault((i, key), cdf.copy())
            (py.symbol_adapt if adapt else py.symbol)(s, py_c)
            (cc.symbol_adapt if adapt else cc.symbol)(s, cc_c)
        elif op[0] == "bool":
            py.bool_(op[1], op[2])
            cc.bool_(op[1], op[2])
        else:
            py.literal(op[1], op[2])
            cc.literal(op[1], op[2])
    assert py.done() == cc.done()


def test_txb_parity():
    """Full tokenizer parity: python encode_txb vs native encode_txb."""
    from rav1e_tpu.entropy import coeffs as cf
    from rav1e_tpu.entropy.cdf import CdfContext
    from rav1e_tpu.models.intra_frame import scan_for

    rng = np.random.default_rng(5)
    for trial in range(24):
        w = int(rng.choice([4, 8, 16, 32]))
        ratios = [r for r in (h2 for h2 in (4, 8, 16, 32)) if 0.25 <= r / w <= 4]
        h = int(rng.choice(ratios))
        density = rng.choice([0.0, 0.05, 0.3, 0.9])
        levels = (rng.random((h, w)) < density) * rng.integers(-40, 40, (h, w))
        levels = levels.astype(np.int32)
        scan = scan_for(w, h)
        ptype = int(rng.integers(0, 2))
        txs = cf.tx_size_ctx(w, h)
        tctx = int(rng.integers(0, 7 if ptype == 0 else 13))
        dctx = int(rng.integers(0, 3))

        cdf_py = CdfContext(100)
        cdf_cc = CdfContext(100)
        py = MsacEncoder()
        cc = native.NativeMsacEncoder()
        cul_py, cat_py = cf.encode_txb(
            py, cdf_py, levels, scan, ptype, txs, cf.TX_CLASS_2D, tctx, dctx, adapt=True
        )
        cul_cc, cat_cc = cc.encode_txb(
            levels, scan, ptype, cf.TX_CLASS_2D, tctx, dctx, cdf_cc, txs, adapt=True
        )
        assert (cul_py, cat_py) == (cul_cc, cat_cc), trial
        assert py.done() == cc.done(), trial
        assert np.array_equal(cdf_py.coeff_base, cdf_cc.coeff_base), trial
        assert np.array_equal(cdf_py.txb_skip, cdf_cc.txb_skip), trial


def test_native_roundtrip_decodable():
    cc = native.NativeMsacEncoder()
    cdf = make_cdf([8192] * 4)
    syms = [0, 1, 2, 3, 0, 0, 1]
    c = cdf.copy()
    for s in syms:
        cc.symbol_adapt(s, c)
    data = cc.done()
    dec = MsacDecoder(data)
    c2 = cdf.copy()
    assert [dec.symbol_adapt(c2) for _ in syms] == syms
