"""Torus scalar ops vs direct big-integer models (C1, R1 of SURVEY.md §2)."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import torus as T


def test_t32_t64_roundtrip():
    xs = np.array([0, 1, -1, 2**31 - 1, -2**31, 12345678], np.int32)
    x64 = T.t32tot64(xs)
    assert np.array_equal(np.asarray(T.t64tot32(x64)), xs)


def test_dtot32_matches_reference_formula():
    ds = np.array([0.0, 0.25, -0.25, 0.5 - 2**-32, 1.75, -3.125])
    got = np.asarray(T.dtot32(ds))
    for d, g in zip(ds, got):
        expect = np.int32(np.int64((d - np.int64(d)) * 2**32))
        assert g == expect, (d, g, expect)


def test_mod_switch_from_torus32_pow2():
    msize = 4096
    phases = np.array([0, 1 << 20, -(1 << 20), 2**31 - 1, -2**31, 12345], np.int32)
    got = np.asarray(T.mod_switch_from_torus32(phases, msize))
    interv = ((1 << 63) // msize) * 2
    for p, g in zip(phases, got):
        temp = (int(np.uint32(p)) << 32) + interv // 2
        assert g == (temp // interv) % 2**64, (p, g)


def test_mod_switch_roundtrip_error():
    msize = 2048
    rng = np.random.default_rng(0)
    phases = rng.integers(-2**31, 2**31, 1000).astype(np.int32)
    m = np.asarray(T.mod_switch_from_torus32(phases, msize))
    back = np.asarray(T.mod_switch_to_torus32(m, msize))
    err = np.abs((back.astype(np.int64) - phases) % 2**32)
    err = np.minimum(err, 2**32 - err)
    assert err.max() <= 2**32 / (2 * msize) + 1


def test_approx_phase32():
    msize = 8
    # phase near 3/8 rounds to exactly 3/8
    phase = np.int32((3 << 29) + 12345)
    got = int(np.asarray(T.approx_phase32(phase, msize)))
    assert got == 3 << 29


def test_balanced_limbs_exact_32():
    rng = np.random.default_rng(1)
    x = rng.integers(-2**31, 2**31, 256).astype(np.int32)
    limbs = np.asarray(T.balanced_limbs(jnp.asarray(x), 4, 8))
    assert limbs.dtype == np.int8
    recon = np.zeros(256, np.int64)
    for i in range(4):
        recon += limbs[i].astype(np.int64) << (8 * i)
    assert np.array_equal(recon.astype(np.int32), x)
    assert np.abs(limbs.astype(np.int32)).max() <= 128


def test_balanced_limbs_exact_64():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**64, 256, dtype=np.uint64).astype(np.int64)
    limbs = np.asarray(T.balanced_limbs(jnp.asarray(x), 8, 8))
    recon = np.zeros(256, np.uint64)
    for i in range(8):
        recon += (limbs[i].astype(np.int64).astype(np.uint64)
                  << np.uint64(8 * i))
    assert np.array_equal(recon.astype(np.int64), x)


def test_signed_planes_exact():
    d = np.arange(-256, 256, dtype=np.int32)  # bgbit=9 digit range
    planes = np.asarray(T.signed_planes(jnp.asarray(d), 7, 2))
    recon = planes[0].astype(np.int32) + (planes[1].astype(np.int32) << 7)
    assert np.array_equal(recon, d)
    assert np.abs(planes).max() <= 64


def test_signed_planes_64bit_full_width():
    # regression: planes must not truncate int64 operands (key_times path)
    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**64, 64, dtype=np.uint64).astype(np.int64)
    planes = np.asarray(T.signed_planes(jnp.asarray(x), 7, 10))
    recon = np.zeros(64, np.int64)
    for i in range(10):
        recon += planes[i].astype(np.int64) << (7 * i)
    assert np.array_equal(recon, x)
