"""Native C++ library vs JAX implementations (independent oracle pair —
the asm-vs-model equivalence idea of spqlios-bench.cpp:42-102, with exact
equality where both sides are exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.utils import native
from tfhe_tpu.ops import poly
from tfhe_tpu.ops.decomp import decompose_torus_poly
from tfhe_tpu.params import TGswParams, TLweParams

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native library unavailable")


def test_negacyclic_mul32_matches_jax():
    rng = np.random.default_rng(0)
    N = 128
    a = rng.integers(-128, 128, N).astype(np.int32)
    b = rng.integers(-2**31, 2**31, N).astype(np.int32)
    got = native.negacyclic_mul32(a, b)
    want = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)


def test_negacyclic_mul64_matches_jax():
    rng = np.random.default_rng(1)
    N = 64
    a = rng.integers(-256, 256, N).astype(np.int32)
    b = rng.integers(0, 2**64, N, dtype=np.uint64).astype(np.int64)
    got = native.negacyclic_mul64(a, b)
    want = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)


def test_anticyclic_fft_matches_python():
    from tfhe_tpu.ops import fft
    rng = np.random.default_rng(2)
    N = 256
    a = rng.integers(-2**20, 2**20, N).astype(np.int32)
    re, im = native.anticyclic_fft(a)
    ref = np.asarray(fft.negacyclic_fft(a.astype(np.float64), precision="highest"))
    assert np.abs(re - ref.real).max() < 1e-3 * np.abs(ref).max() / 1e3 + 1e-2
    assert np.allclose(re, ref.real, rtol=1e-9, atol=1e-3)
    assert np.allclose(im, ref.imag, rtol=1e-9, atol=1e-3)


def _fft_product(a, b):
    are, aim = native.anticyclic_fft(a)
    bre, bim = native.anticyclic_fft(b)
    return native.anticyclic_ifft_t64(are * bre - aim * bim,
                                      are * bim + aim * bre)


def test_fft_product_exact_at_small_scale():
    """Where intermediate magnitudes stay under ~2^44, the f64 pipeline
    rounds to the exact integer product."""
    rng = np.random.default_rng(3)
    N = 1024
    a = rng.integers(-256, 256, N).astype(np.int32)
    b = rng.integers(-2**12, 2**12, N).astype(np.int64)
    got = _fft_product(a, b)
    want = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)


def test_fft_product_error_bounded_like_reference():
    """At torus-scale magnitudes the f64 pipeline is approximate — same as
    the reference spqlios path (measured ~2^7-2^10 absolute error there).
    The exact MXU engines don't have this error; this quantifies the FFT
    backend's contract."""
    rng = np.random.default_rng(3)
    N = 1024
    a = rng.integers(-256, 256, N).astype(np.int32)
    b = rng.integers(-2**20, 2**20, N).astype(np.int64)
    got = _fft_product(a, b)
    want = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    err = np.abs(got - want).max()
    assert err < 2**12, err


def test_decompose64_matches_jax():
    ring = TLweParams(N=64, k=1, bits=64)
    p = TGswParams(l=4, bgbit=9, tlwe=ring)
    rng = np.random.default_rng(4)
    x = rng.integers(0, 2**64, 64, dtype=np.uint64).astype(np.int64)
    got = native.decompose64(x, p.l, p.bgbit, p.offset)
    want = np.asarray(decompose_torus_poly(jnp.asarray(x), p))
    assert np.array_equal(got, np.moveaxis(want, -2, 0))
