"""MSAC round-trip tests: every symbol sequence encoded must decode back
exactly (reference analog: src/ec.rs inline tests)."""

import random

import numpy as np
import pytest

from rav1e_tpu.ec.msac import MsacDecoder, MsacEncoder, update_cdf


def make_cdf(probs):
    """probs: list of per-symbol probabilities summing to 32768 ->
    inverse-cdf table with trailing adaptation counter."""
    acc = 32768
    icdf = []
    for p in probs:
        acc -= p
        icdf.append(acc)
    assert icdf[-1] == 0
    return np.array(icdf + [0], dtype=np.uint16)


def test_bool_roundtrip():
    rng = random.Random(1234)
    bits = [rng.randint(0, 1) for _ in range(1000)]
    fs = [rng.choice([16384, 128 << 6, 30000, 1000]) for _ in bits]
    enc = MsacEncoder()
    for b, f in zip(bits, fs):
        enc.bool_(b, f)
    data = enc.done()
    dec = MsacDecoder(data)
    for b, f in zip(bits, fs):
        assert dec.bool_(f) == b


def test_literal_roundtrip():
    rng = random.Random(99)
    vals = [(rng.randint(0, (1 << n) - 1), n) for n in (1, 3, 8, 15) for _ in range(50)]
    enc = MsacEncoder()
    for v, n in vals:
        enc.literal(v, n)
    data = enc.done()
    dec = MsacDecoder(data)
    for v, n in vals:
        assert dec.literal(n) == v


@pytest.mark.parametrize("nsyms", [2, 3, 4, 8, 13, 16])
def test_symbol_roundtrip_static(nsyms):
    rng = random.Random(nsyms)
    # random cdf with every symbol >= 1/64 probability
    probs = [rng.randint(64, 4096) for _ in range(nsyms)]
    scale = sum(probs)
    probs = [max(64, p * 32768 // scale) for p in probs]
    probs[-1] = 32768 - sum(probs[:-1])
    assert probs[-1] > 0
    cdf = make_cdf(probs)
    syms = [rng.randrange(nsyms) for _ in range(2000)]
    enc = MsacEncoder()
    for s in syms:
        enc.symbol(s, cdf)
    data = enc.done()
    dec = MsacDecoder(data)
    for s in syms:
        assert dec.symbol(cdf) == s


@pytest.mark.parametrize("nsyms", [2, 4, 11, 16])
def test_symbol_roundtrip_adaptive(nsyms):
    """Encoder and decoder must adapt CDFs identically."""
    rng = random.Random(7 * nsyms)
    probs = [32768 // nsyms] * nsyms
    probs[0] += 32768 - sum(probs)
    enc_cdf = make_cdf(probs)
    dec_cdf = enc_cdf.copy()
    # skewed source so adaptation actually moves the cdf
    syms = [rng.choice([0] * 8 + list(range(nsyms))) for _ in range(3000)]
    enc = MsacEncoder()
    for s in syms:
        enc.symbol_adapt(s, enc_cdf)
    data = enc.done()
    dec = MsacDecoder(data)
    for s in syms:
        assert dec.symbol_adapt(dec_cdf) == s
    assert np.array_equal(enc_cdf, dec_cdf)


def test_adaptation_compresses_skewed_source():
    rng = random.Random(5)
    syms = [0 if rng.random() < 0.95 else 1 for _ in range(5000)]
    flat = make_cdf([16384, 16384])

    enc_static = MsacEncoder()
    for s in syms:
        enc_static.symbol(s, flat)
    static_len = len(enc_static.done())

    cdf = flat.copy()
    enc_adapt = MsacEncoder()
    for s in syms:
        enc_adapt.symbol_adapt(s, cdf)
    adapt_len = len(enc_adapt.done())
    assert adapt_len < static_len * 0.6


def test_update_cdf_matches_spec_shape():
    cdf = make_cdf([8192, 8192, 8192, 8192])
    before = cdf.copy()
    update_cdf(cdf, 0)
    # coding symbol 0 raises P(0), i.e. P(X<=0) up, so icdf[0]=32768-cum drops
    assert cdf[0] < before[0]
    assert cdf[4] == 1  # counter incremented
    update_cdf(cdf, 3)
    # symbol 3 prob up means P(X<=2) down, so icdf[2]=32768-P(X<=2) rises
    assert cdf[2] > before[2]


def test_empty_stream():
    enc = MsacEncoder()
    data = enc.done()
    assert isinstance(data, bytes)
