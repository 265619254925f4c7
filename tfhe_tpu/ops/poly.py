"""Negacyclic polynomial operations over Z[X]/(X^N+1), batched.

All functions act on the LAST axis (length N) and broadcast over leading
axes, so the same code serves single polynomials, TRLWE samples (k+1, N) and
whole ciphertext batches (B, k+1, N).

TPU design notes:
  * rotations by data-dependent amounts are expressed as log2(2N) statically
    sliced rolls gated by `jnp.where` on the exponent's bits — no gathers and
    no dynamic shapes, so everything stays vectorized on the VPU;
  * the exact O(N^2) product here is the differential-testing oracle
    (the analog of the reference's Karatsuba fallback,
    poc_CircuitBootstrapping.cpp:285-316); the production engines live in
    tfhe_tpu.ops.engine.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def negacyclic_shift(x, r: int):
    """X^r * x for a STATIC exponent r in [0, 2N).

    (X^r u)[i] = u[i-r] for i>=r, -u[i-r+N] for i<r; X^(N+p) = -X^p.
    Matches torusPolynomialMulByXai (numeric_functions.cpp:327-347).
    """
    N = x.shape[-1]
    r = r % (2 * N)
    sign = 1
    if r >= N:
        r -= N
        sign = -1
    if r == 0:
        return sign * x
    out = jnp.concatenate([-x[..., N - r:], x[..., :N - r]], axis=-1)
    return sign * out


def mul_by_xai(power, x, two_n: int | None = None):
    """X^power * x with a PER-BATCH exponent `power` (int array broadcastable
    against x's leading axes), power in [0, 2N).

    Implemented as a bit-decomposed chain of static negacyclic rolls selected
    by `jnp.where` — the TPU-native replacement for the reference's
    per-exponent branchy copy loops (numeric_functions.cpp:327-347).
    """
    N = x.shape[-1]
    two_n = two_n or 2 * N
    nbits = (two_n - 1).bit_length()
    power = jnp.asarray(power, jnp.int32)
    cond_shape = power.shape + (1,) * (x.ndim - power.ndim)
    out = x
    for w in range(nbits):
        rolled = negacyclic_shift(out, 1 << w)
        bit = ((power >> w) & 1).astype(bool).reshape(cond_shape)
        out = jnp.where(bit, rolled, out)
    return out


def mul_by_xai_minus_one(power, x, two_n: int | None = None):
    """(X^power - 1) * x, per-batch exponent.  The CMux pre-rotation
    (tlwe_functions.cpp:209-213 -> numeric_functions.cpp:304-323)."""
    return mul_by_xai(power, x, two_n) - x


def negacyclic_matrix(poly, dtype=None):
    """Dense negacyclic multiplication matrix M with (a @ M) = a *neg* poly.

    M[t, i] = sign * poly[(i - t) mod N] with sign = -1 iff (i - t) wraps.
    Used by the matmul engine's key preparation and by tests.
    """
    poly = jnp.asarray(poly)
    N = poly.shape[-1]
    doubled = jnp.concatenate([poly, -poly], axis=-1)
    idx = (np.arange(N)[None, :] - np.arange(N)[:, None]) % (2 * N)  # (t, i)
    out = jnp.take(doubled, jnp.asarray(idx), axis=-1)
    return out.astype(dtype) if dtype is not None else out


def negacyclic_mul_exact(a_int, b_torus):
    """Exact negacyclic product of an integer polynomial with a torus
    polynomial, with native wrap in b's dtype.  O(N^2) oracle — the analog of
    the reference's exact Karatsuba path (poc_karatsuba.cpp:60-94).

    a_int: (..., N) integer; b_torus: (..., N) int32/int64 (broadcastable).
    """
    b = jnp.asarray(b_torus)
    M = negacyclic_matrix(b)                      # (..., N, N)
    a = jnp.asarray(a_int).astype(b.dtype)
    return jnp.einsum("...t,...ti->...i", a, M)


def sample_extract(tlwe_av, index: int = 0):
    """Extract the LWE sample of coefficient `index` from a TRLWE sample
    (tLweExtractLweSampleIndex, tlwe_functions.cpp:351-362).

    tlwe_av: (..., k+1, N) with b = [..., k, :].  Returns (..., k*N + 1) with
    the LWE b stored last (the library's b=&a[n] layout, poc_types.h:137).
    """
    N = tlwe_av.shape[-1]
    k = tlwe_av.shape[-2] - 1
    a, b = tlwe_av[..., :k, :], tlwe_av[..., k, :]
    # a_out[i*N + j] = a[i, index-j] for j<=index ; -a[i, N+index-j] for j>index
    rev = jnp.flip(a, axis=-1)                    # rev[i, j] = a[i, N-1-j]
    rolled = jnp.roll(rev, index + 1, axis=-1)    # rolled[i, j] = a[i, (index-j) mod N]
    j = np.arange(N)
    sign = jnp.asarray(np.where(j <= index, 1, -1), tlwe_av.dtype)
    a_out = (rolled * sign).reshape(*tlwe_av.shape[:-2], k * N)
    return jnp.concatenate([a_out, b[..., index:index + 1]], axis=-1)


# ---------------------------------------------------------------------------
# R2 convenience op set (numeric_functions.cpp:140-460): scalar mul-adds and
# norms.  clear/uniform/copy are plain jnp array ops and need no wrappers.
# ---------------------------------------------------------------------------

def add_mul_z(accum, p, x):
    """accum + p * x with native torus wrap (torusPolynomialAddMulZTo,
    numeric_functions.cpp:316-322).  p: integer scalar or (...,1) array."""
    accum = jnp.asarray(accum)
    return accum + jnp.asarray(p).astype(accum.dtype) * jnp.asarray(x).astype(accum.dtype)


def sub_mul_z(accum, p, x):
    """accum - p * x with native torus wrap (torusPolynomialSubMulZTo,
    numeric_functions.cpp:324-330)."""
    accum = jnp.asarray(accum)
    return accum - jnp.asarray(p).astype(accum.dtype) * jnp.asarray(x).astype(accum.dtype)


def int_norm_sq2(x):
    """Euclidean norm^2 of integer polynomials, per-polynomial over the last
    axis (intPolynomialNormSq2/Norm2sq, numeric_functions.cpp:361-371,437-446)."""
    x = jnp.asarray(x, jnp.float64)
    return jnp.sum(x * x, axis=-1)


def int_norm_infty_dist(a, b):
    """max |a - b| over the last axis (intPolynomialNormInftyDist,
    numeric_functions.cpp:449-461)."""
    d = jnp.asarray(a, jnp.int64) - jnp.asarray(b, jnp.int64)
    return jnp.max(jnp.abs(d).astype(jnp.float64), axis=-1)


def torus_norm_infty_dist(a, b):
    """max |t2double(a - b)| over the last axis with the wrap-aware
    difference (torusPolynomialNormInftyDist, numeric_functions.cpp:419-428)."""
    a = jnp.asarray(a)
    d = a - jnp.asarray(b).astype(a.dtype)            # native wrap
    bits = 32 if a.dtype == jnp.int32 else 64
    t = d.astype(jnp.float64) / 2.0**bits
    return jnp.max(jnp.abs(t), axis=-1)


def mul_fft(a_int, b_torus, precision: str = "auto"):
    """Approximate negacyclic product through the evaluation domain
    (torusPolynomialMultFFT, numeric_functions.cpp:140-148) — the FFTEngine
    path as a one-shot convenience.  For exact products use
    negacyclic_mul_exact or the integer engines."""
    import jax
    b = jnp.asarray(b_torus)
    N = b.shape[-1]
    bits = 32 if b.dtype == jnp.int32 else 64
    a = jnp.asarray(a_int)
    if precision == "auto":
        precision = "f64" if jax.default_backend() == "cpu" else "dd"
    if precision == "f64":
        from tfhe_tpu.ops.fft import negacyclic_fft, negacyclic_ifft
        ha = negacyclic_fft(a, precision="highest")
        hb = negacyclic_fft(b, precision="highest")
        y = negacyclic_ifft(ha * hb, N)
        m = jnp.float64(2.0**bits)
        w = jnp.round(y) - m * jnp.round(y / m)
        return w.astype(jnp.int64).astype(b.dtype)
    from tfhe_tpu.ops.fft import (negacyclic_fft_dd_dev, _dd_cmul,
                                  negacyclic_ifft_dd_dev)
    xa = negacyclic_fft_dd_dev(a)
    xb = negacyclic_fft_dd_dev(b)
    parts = _dd_cmul(xa[0], xa[1], xa[2], xa[3], xb[0], xb[1], xb[2], xb[3])
    return negacyclic_ifft_dd_dev(parts, N, bits)


def add_mul_fft(accum, a_int, b_torus, precision: str = "auto"):
    """accum + a (*) b via the FFT path (torusPolynomialAddMulRFFT,
    numeric_functions.cpp:149-160)."""
    accum = jnp.asarray(accum)
    return accum + mul_fft(a_int, b_torus, precision).astype(accum.dtype)


def sub_mul_fft(accum, a_int, b_torus, precision: str = "auto"):
    """accum - a (*) b via the FFT path (torusPolynomialSubMulRFFT,
    numeric_functions.cpp:161-172)."""
    accum = jnp.asarray(accum)
    return accum - mul_fft(a_int, b_torus, precision).astype(accum.dtype)
