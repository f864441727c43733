"""Host-side validation of the stochastic-rounding bit arithmetic.

`ops/pallas/fused_step.py::_mk_ld_st("sr")` rounds f32 -> bf16 by adding
a uniform 16-bit integer to the f32 bit pattern and truncating the low
16 bits (pltpu.prng_random_bits has no interpret/CPU lowering, so the
kernel path itself is exercised only on real TPU — the b025_bf16sr
shedding validation). This file proves the BIT TRICK itself: a numpy
transliteration of the exact add/mask sequence is enumerated over all
2^16 random values and shown to be exactly unbiased, with the sign,
zero, and binade-carry edge cases the advisor flagged.
"""

import numpy as np


def sr_numpy(y: np.ndarray, r16: np.ndarray) -> np.ndarray:
    """Transliteration of fused_step.py's SR store:
    b = bitcast_u32(y); b = (b + (r & 0xFFFF)) & 0xFFFF0000; bf16(b).
    The result is returned as f32 (the top 16 bits of an f32 ARE its
    bf16 representation, so this is value-exact)."""
    b = np.asarray(y, np.float32).view(np.uint32)
    b = (b + (np.asarray(r16, np.uint32) & np.uint32(0xFFFF))) & np.uint32(
        0xFFFF0000
    )
    return b.view(np.float32)


def _exhaustive_mean(x: float) -> float:
    """E[sr(x)] over ALL 2^16 equiprobable random values (exact)."""
    r = np.arange(1 << 16, dtype=np.uint32)
    vals = sr_numpy(np.full(r.shape, x, np.float32), r)
    return float(np.mean(vals.astype(np.float64)))


def test_sr_exact_unbiasedness():
    """For any f32 x, the exhaustive mean over the 2^16 random values
    equals x exactly: P(round up) = low16/2^16 and the two candidate
    bf16 values bracket x at distance ulp * low16/2^16."""
    rng = np.random.default_rng(0)
    xs = np.concatenate(
        [
            rng.standard_normal(16).astype(np.float32),
            (rng.random(8).astype(np.float32) * 1e-6),
            (rng.standard_normal(8).astype(np.float32) * 1e6),
        ]
    )
    for x in xs:
        m = _exhaustive_mean(float(x))
        assert m == float(np.float64(np.float32(x))), (x, m)


def test_sr_negative_values_unbiased_and_bracketed():
    """Sign bit rides the top bits: adding to the bit pattern moves a
    negative value AWAY from zero; truncation moves it toward zero. The
    two outcomes must bracket x and stay exactly unbiased."""
    x = np.float32(-1.2345678)
    r = np.arange(1 << 16, dtype=np.uint32)
    vals = sr_numpy(np.full(r.shape, x, np.float32), r)
    lo, hi = vals.min(), vals.max()
    assert lo <= x <= hi
    assert np.unique(vals).size == 2  # exactly the two bf16 neighbours
    assert _exhaustive_mean(float(x)) == float(np.float64(x))


def test_sr_zero_and_exact_bf16_fixed_points():
    """x == 0 and any exactly-representable bf16 value must never move
    (low 16 bits are 0, so no carry for any r)."""
    r = np.arange(1 << 16, dtype=np.uint32)
    for x in (0.0, -0.0, 1.0, -2.5, 0.15625):
        vals = sr_numpy(np.full(r.shape, x, np.float32), r)
        assert np.all(vals == np.float32(x)), x


def test_sr_binade_carry():
    """Low bits near 0xFFFF just below a power of two: the carry must
    propagate through the mantissa into the exponent, landing exactly on
    the next binade (2.0), never on garbage."""
    x = np.uint32(0x3FFFFFFF).view(np.float32)  # 1.99999... (low=0xFFFF)
    r = np.arange(1 << 16, dtype=np.uint32)
    vals = sr_numpy(np.full(r.shape, x, np.float32), r)
    uniq = np.unique(vals)
    assert set(uniq.tolist()) <= {
        np.uint32(0x3FFF0000).view(np.float32),  # truncated (1.9921875)
        np.float32(2.0),  # carried into the exponent
    }
    assert np.float32(2.0) in uniq  # the carry really happens
    assert _exhaustive_mean(float(x)) == float(np.float64(x))


def test_sr_results_are_bf16_representable():
    """Every output bit pattern has zero low 16 bits (a valid bf16)."""
    rng = np.random.default_rng(1)
    y = rng.standard_normal(4096).astype(np.float32)
    r = rng.integers(0, 1 << 16, size=y.shape, dtype=np.uint32)
    out = sr_numpy(y, r)
    assert np.all((out.view(np.uint32) & np.uint32(0xFFFF)) == 0)
