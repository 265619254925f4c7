"""Anticyclic FFT engines (C13/C14/H-series parity): round-trips, product
identities, and double-float precision measurement — the analog of the
reference's spqlios-bench/model equivalence tests (spqlios-bench.cpp:42-102)
and high-precision FFT study (code.cpp:516-638)."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ops import fft, poly


def test_roundtrip_c128():
    N = 128
    rng = np.random.default_rng(0)
    a = rng.integers(-2**20, 2**20, (3, N)).astype(np.float64)
    ahat = fft.negacyclic_fft(a, precision="highest")
    back = np.asarray(fft.negacyclic_ifft(ahat, N))
    assert np.abs(back - a).max() < 1e-6


def test_fft_product_matches_negacyclic():
    N = 64
    rng = np.random.default_rng(1)
    a = rng.integers(-64, 64, N).astype(np.float64)
    b = rng.integers(-2**18, 2**18, N).astype(np.float64)
    ah = fft.negacyclic_fft(a, precision="highest")
    bh = fft.negacyclic_fft(b, precision="highest")
    prod = np.asarray(fft.negacyclic_ifft(ah * bh, N))
    expect = np.asarray(poly.negacyclic_mul_exact(
        jnp.asarray(a, jnp.int32), jnp.asarray(b.astype(np.int32))))
    assert np.abs(np.round(prod) - expect).max() == 0


def test_twiddle_properties():
    # c^2 + s^2 = 1 and w^i * conj(w^i) = 1 (code.cpp:528-543, 563-572)
    N = 256
    w = np.exp(1j * np.pi * np.arange(N) / N)
    assert np.abs(np.abs(w) - 1).max() < 1e-15


def test_dd_arithmetic_exactness():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1e6, 1e6, 1000)
    y = rng.uniform(-1e6, 1e6, 1000)
    xh, xl = fft.dd_from_f64(x)
    yh, yl = fft.dd_from_f64(y)
    # measure the OPERATIONS' error against the dd-representable inputs
    # (dd_from_f64 itself rounds at ~2^-48; cancellation amplifies that)
    xdd = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    ydd = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    sh, sl = fft.dd_add(xh, xl, yh, yl)
    got = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
    # sloppy-dd addition: error bounded relative to the INPUT magnitude
    # (cancellation doesn't re-normalize) — the right model for FFT sums
    scale = np.maximum(np.abs(xdd), np.abs(ydd))
    err = np.abs(got - (xdd + ydd)) / np.maximum(scale, 1e-30)
    assert err.max() < 2**-44
    ph, pl = fft.dd_mul(xh, xl, yh, yl)
    got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    err = np.abs(got - xdd * ydd) / np.maximum(np.abs(xdd * ydd), 1e-30)
    assert err.max() < 2**-44


def test_dd_fft_roundtrip_and_precision():
    """Forward dd-FFT -> pointwise -> inverse recovers exact integer
    negacyclic products on torus32-scale data (the reference relies on f64
    for this; dd-f32 has ~49-bit mantissa)."""
    N = 128
    rng = np.random.default_rng(3)
    a = rng.integers(-64, 64, N)                        # gadget-digit scale
    b = rng.integers(-2**31, 2**31, N)                  # torus32 scale
    ah = fft.negacyclic_fft_dd(a.astype(np.float64))
    bh = fft.negacyclic_fft_dd(b.astype(np.float64))
    # pointwise dd-complex product
    pr_h, pr_l, pi_h, pi_l = fft._dd_cmul(*ah, *bh)
    prod = fft.negacyclic_ifft_dd((pr_h, pr_l, pi_h, pi_l), N)
    expect = np.asarray(poly.negacyclic_mul_exact(
        jnp.asarray(a, jnp.int32), jnp.asarray(b.astype(np.int32))))
    # compare modulo 2^32 after rounding
    got = np.round(prod).astype(np.int64).astype(np.uint64).astype(np.uint32)
    want = expect.astype(np.uint32)
    assert np.array_equal(got, want), np.abs(
        got.astype(np.int64) - want.astype(np.int64)).max()
