"""High-precision anticyclic FFT study tests — mirrors the reference's own
checks (high-precision-anticyclic-fft/src/code.cpp:516-638): twiddle
identities, HP arithmetic vs exact bigints, round-trip, and the negacyclic
product vs an exact oracle at several precisions."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops import hpfft
from tfhe_tpu.ops.hpfft import (FRAC_LIMBS, LIMB_BITS, hp_add, hp_from_int,
                                hp_from_t64, hp_ifft, hp_fft, hp_mul, hp_neg,
                                hp_negacyclic_mul, hp_rshift, hp_sub,
                                hp_to_float, hp_to_t64)


def hp_to_bigint(a):
    """HP array -> signed python ints of the raw 2^-64-scaled value."""
    a = np.asarray(a)
    limbs = a.shape[-1]
    flat = a.reshape(-1, limbs)
    mod = 1 << (LIMB_BITS * limbs)
    out = []
    for row in flat:
        u = 0
        for i in reversed(range(limbs)):
            u = (u << LIMB_BITS) | int(row[i])
        out.append(u - mod if u >= mod // 2 else u)
    return out


def bigint_to_hp(vals, limbs):
    mod = 1 << (LIMB_BITS * limbs)
    rows = []
    for v in vals:
        u = v % mod
        rows.append([(u >> (LIMB_BITS * i)) & hpfft.LIMB_MASK
                     for i in range(limbs)])
    return jnp.asarray(np.array(rows, np.int64))


@pytest.mark.parametrize("limbs", [6, 8])
def test_hp_arithmetic_matches_bigints(limbs):
    import random
    r = random.Random(0)
    mod = 1 << (LIMB_BITS * limbs)
    half = mod // 2
    av = [r.randrange(-half, half) for _ in range(64)]
    bv = [r.randrange(-half, half) for _ in range(64)]
    a, b = bigint_to_hp(av, limbs), bigint_to_hp(bv, limbs)

    def wrap(v):
        u = v % mod
        return u - mod if u >= half else u

    assert hp_to_bigint(hp_add(a, b)) == [wrap(x + y) for x, y in zip(av, bv)]
    assert hp_to_bigint(hp_sub(a, b)) == [wrap(x - y) for x, y in zip(av, bv)]
    assert hp_to_bigint(hp_neg(a)) == [wrap(-x) for x in av]
    # intmul_ref semantics: signed product >> 64, floor, wrapped
    want = [wrap((x * y) >> 64) for x, y in zip(av, bv)]
    assert hp_to_bigint(hp_mul(a, b)) == want


def test_hp_rshift():
    import random
    r = random.Random(1)
    limbs = 6
    vals = [r.randrange(-2**90, 2**90) for _ in range(32)]
    a = bigint_to_hp(vals, limbs)
    for s in (1, 5, 10, 16, 37):
        got = hp_to_bigint(hp_rshift(a, s))
        assert got == [v >> s for v in vals], s


def test_t64_round_trip():
    r = np.random.default_rng(2)
    x = r.integers(-2**63, 2**63, 64, dtype=np.int64)
    assert np.array_equal(np.asarray(hp_to_t64(hp_from_t64(x, 6))), x)


def test_twiddle_identities():
    """c^2 + s^2 = 1 and omega * ombar = 1 (code.cpp:528-543,563-572)."""
    n = 128
    ci, si = hpfft._twiddle_ints(n)
    for i in range(n):
        # |c^2+s^2 - 2^128| small: <= ~2^65 (half-ulp rounding each)
        err = ci[i] ** 2 + si[i] ** 2 - (1 << 128)
        assert abs(err) < (1 << 66), (i, err)


@pytest.mark.parametrize("limbs", [6, 8])
def test_round_trip(limbs):
    """FFT(iFFT(x)) == x to within the reference's very_close tolerance
    (|diff| < 10^4 ulps of 2^-64, code.cpp:234-241)."""
    r = np.random.default_rng(3)
    N = 64
    x = r.integers(-2**62, 2**62, (3, N), dtype=np.int64)
    re, im = hp_ifft(x, limbs)
    back = np.asarray(hp_fft(re, im))
    diff = (back - x).astype(np.int64)
    assert np.abs(diff).max() < 10000, np.abs(diff).max()


def test_ifft_matches_float_oracle():
    """Slot values of the transform equal naive evaluations at odd roots,
    as multisets (the butterflies emit bit-reversed block order)."""
    r = np.random.default_rng(4)
    N = 32
    x = r.integers(-2**62, 2**62, N, dtype=np.int64)
    re, im = hp_ifft(x, 6)
    got = hp_to_float(re) + 1j * hp_to_float(im)
    want = hpfft.naive_eval(x)              # all N odd roots
    # pair each emitted slot with its nearest oracle evaluation; require a
    # tight match and that the N/2 slots cover N/2 conjugate-distinct roots
    dist = np.abs(got[:, None] - want[None, :])
    nearest = dist.argmin(axis=1)
    classes = {min(int(k), N - 1 - int(k)) for k in nearest}
    assert len(classes) == N // 2, "slots don't cover all conjugate pairs"
    scale = np.abs(want).max()
    assert dist[np.arange(N // 2), nearest].max() < 1e-9 * scale


@pytest.mark.parametrize("limbs", [6, 8])
def test_negacyclic_product_vs_exact(limbs):
    """int x torus64 negacyclic product through the HP FFT matches the
    exact bigint convolution to a few-thousand-ulp tolerance — the
    precision-study headline measurement (H4)."""
    r = np.random.default_rng(5)
    N = 64
    a = r.integers(-64, 64, N).astype(np.int64)
    b = r.integers(-2**63, 2**63, N, dtype=np.int64)
    # exact negacyclic product mod 2^64
    exact = np.zeros(N, object)
    for i in range(N):
        for j in range(N):
            k = i + j
            v = int(a[i]) * int(b[j])
            if k < N:
                exact[k] += v
            else:
                exact[k - N] -= v
    exact = np.array([((v + 2**63) % 2**64) - 2**63 for v in exact],
                     dtype=np.int64)
    got = np.asarray(hp_negacyclic_mul(a, b, limbs))
    diff = got - exact                       # int64 wrap = torus distance
    tol = 20000 * N // 16
    assert np.abs(diff).max() < tol, np.abs(diff).max()


def test_gmp_sweep_params_match_reference_derivation():
    """bench_fft_gmp.cpp:16-25 at its default ALPHA_BITS=60 and two sweep
    points: MIN_N=1000*ALPHA/35, N=2^ceil(log2), FPREC=ALPHA+4, IPREC=FPREC/2."""
    from tfhe_tpu.ops.hpfft import gmp_sweep_params
    p = gmp_sweep_params(60)
    assert (p["min_n"], p["N"], p["fprec"], p["iprec"]) == (1714, 2048, 64, 32)
    p = gmp_sweep_params(35)
    assert (p["min_n"], p["N"], p["fprec"], p["iprec"]) == (1000, 1024, 39, 19)
    p = gmp_sweep_params(120)
    assert p["N"] == 4096 and p["limbs"] == 12
