"""Batched TRLWE (TLWE over the ring) — R5 of SURVEY.md §2
(tlwe_functions.cpp:14-379).

Layout: a TRLWE batch is one int array (..., k+1, N), b = [..., k, :]
(poc_types.h:164-184).  Encryption/phase use the same negacyclic engines as
the hot path: the binary key polynomial is prepared once (single int8 limb,
key_bits=8) and s (*) a runs as an exact MXU product with the full-width
torus polynomial split into base-2^7 planes.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.params import TLweParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.ops.engine import EngineConfig, make_engine
from tfhe_tpu.ops import poly


def _host_key_times_fft(key, x, bits):
    """Exact sum_i s_i (*) x[..., i, :] on the host via numpy real FFTs.

    Keygen fast path (concrete arrays only): with a BINARY key the true
    integer convolution coefficients are bounded by N * 2^32 <= 2^43
    (per 32-bit limb), far inside float64's 2^53 exact-integer range, and
    the length-2N cyclic FFT's rounding error (~2^43 * 11 * 2^-52 ~ 2e-2)
    stays below the 0.5 rounding threshold — so rint() recovers the exact
    product.  ~30x faster than driving the int8-limb matmul engine on
    CPU for the 327,840 privKS encryptions (circuit.PrivKeySwitchKey).
    """
    try:                                 # scipy: multithreaded pocketfft
        import scipy.fft as _fft
        _kw = {"workers": -1}
    except ImportError:                  # pragma: no cover
        _fft, _kw = np.fft, {}
    key = np.asarray(key)
    k, N = key.shape
    # exactness bound: the true convolution coefficients are bounded by
    # (#nonzero key coords) * 2^32 per 32-bit limb; with binary keys that is
    # k*N * 2^32, which must sit far enough inside float64's 2^53 exact
    # range for the FFT rounding (~coeff * 11 * 2^-52) to stay below 0.5.
    assert k * N <= 4096, "FFT fast path exactness bound needs k*N <= 4096"
    sf = _fft.rfft(key.astype(np.float64), 2 * N, axis=-1, **_kw)  # (k, N+1)

    def conv(limb):                      # limb: (..., k, N) float64
        xf = _fft.rfft(limb, 2 * N, axis=-1, **_kw)
        cf = np.einsum("...kn,kn->...n", xf, sf)
        c = _fft.irfft(cf, 2 * N, axis=-1, **_kw)
        c = np.rint(c[..., :N] - c[..., N:]).astype(np.int64)  # negacyclic
        return c

    if bits == 32:
        return conv(x.astype(np.int32).astype(np.float64)).astype(np.int32)
    xu = x.astype(np.int64).astype(np.uint64)
    lo = conv((xu & np.uint64(0xFFFFFFFF)).astype(np.float64)).astype(np.uint64)
    hi = conv((xu >> np.uint64(32)).astype(np.float64)).astype(np.uint64)
    return (lo + (hi << np.uint64(32))).astype(np.int64)


@dataclasses.dataclass
class TLweKey:
    params: TLweParams
    key: np.ndarray                 # (k, N) int32 bits
    _prep: dict | None = None       # engine-prepared form of the key
    _eng: object | None = None

    @staticmethod
    def generate(params: TLweParams, rng: TfheRng) -> "TLweKey":
        return TLweKey(params, np.asarray(rng.bit((params.k, params.N)), np.int32))

    @staticmethod
    def from_bits(params: TLweParams, bits) -> "TLweKey":
        return TLweKey(params, np.asarray(bits, np.int32).reshape(params.k, params.N))

    def engine(self, backend: str = "matmul"):
        """Engine computing sum_i s_i (*) x_i for this key (prepared once)."""
        if self._prep is None:
            cfg = EngineConfig(N=self.params.N, out_bits=self.params.bits,
                               digit_bits=self.params.bits, key_bits=8)
            eng = make_engine(cfg, backend)
            kp = jnp.asarray(self.key, jnp.int32)[:, None, :]   # (k, 1, N)
            object.__setattr__(self, "_prep", eng.prepare(kp))
            object.__setattr__(self, "_eng", eng)
        return self._eng, self._prep

    def key_times(self, x):
        """sum_i s_i (*) x[..., i, :] for x (..., k, N) torus.

        Concrete BINARY keys within the FFT exactness bound take the host
        fast path; anything else (tracers, non-binary keys from from_bits,
        rings with k*N > 4096) uses the exact limb-matmul engine."""
        key = np.asarray(self.key)
        if (not isinstance(x, jax.core.Tracer)
                and key.min() >= 0 and key.max() <= 1
                and key.shape[0] * key.shape[1] <= 4096):
            return jnp.asarray(_host_key_times_fft(
                key, np.asarray(x), self.params.bits))
        eng, prep = self.engine()
        return eng.accumulate(x, prep)[..., 0, :]


def _noise(params: TLweParams, rng: TfheRng, shape, stdev):
    if params.bits == 32:
        return rng.gaussian32(np.int32(0), stdev, shape)
    return rng.gaussian64(np.int64(0), stdev, shape)


def _uniform(params: TLweParams, rng: TfheRng, shape):
    return rng.uniform32(shape) if params.bits == 32 else rng.uniform64(shape)


def encrypt_zero(key: TLweKey, rng: TfheRng, batch_shape=(), stdev=None,
                 coarse_bits: int = 0):
    """TLWE(0): b = e + sum s_i (*) a_i (tLweSymEncryptZero,
    tlwe_functions.cpp:60-73).  Returns (..., k+1, N).

    coarse_bits > 0 mod-switches the sample to the 2^(bits-coarse_bits)
    lattice AT GENERATION: the mask is drawn from the coarse lattice and b
    is rounded onto it, so every coefficient is an exact multiple of
    2^coarse_bits.  This is the sound way to shrink key material (e.g. to 3
    int8 limbs): rounding b costs uniform +-2^(coarse_bits-1) extra noise on
    the PHASE only — unlike truncating a finished sample, whose mask error
    re-enters the phase convolved with the secret key, a (1+kN)x variance
    amplification (measured: 2^-5.2 vs 2^-9.7 rms through a 630-step blind
    rotation).  Security is that of LWE at modulus 2^(bits-coarse_bits),
    where the relative noise rate is 2^coarse_bits larger — e.g. the
    standard gate-bootstrap key at coarse_bits=8 is n=1024 LWE with
    alpha=2^-17 at q=2^24, far above the ~2^-31 minimum-noise curve
    (misc/params.html:9-14)."""
    p = key.params
    stdev = p.stdev if stdev is None else stdev
    a = jnp.asarray(_uniform(p, rng, batch_shape + (p.k, p.N)))
    e = jnp.asarray(_noise(p, rng, batch_shape + (p.N,), stdev))
    if coarse_bits:
        udt = jnp.uint32 if p.bits == 32 else jnp.uint64
        a = ((a.astype(udt) >> coarse_bits) << coarse_bits).astype(a.dtype)
        b = e + key.key_times(a)
        half = 1 << (coarse_bits - 1)
        b = (((b.astype(udt) + half) >> coarse_bits) << coarse_bits).astype(b.dtype)
    else:
        b = e + key.key_times(a)
    return jnp.concatenate([a, b[..., None, :]], axis=-2)


def encrypt_poly(key: TLweKey, messages, rng: TfheRng, stdev=None):
    """TLWE of torus polynomials (..., N) (tLweSymEncrypt,
    tlwe_functions.cpp:75-82)."""
    messages = jnp.asarray(messages)
    c = encrypt_zero(key, rng, tuple(messages.shape[:-1]), stdev)
    return c.at[..., key.params.k, :].add(messages)


def encrypt_scalar(key: TLweKey, mu, rng: TfheRng, batch_shape=(), stdev=None):
    """TLWE with constant-coefficient message mu (tLweSymEncryptT,
    tlwe_functions.cpp:84-88)."""
    c = encrypt_zero(key, rng, batch_shape, stdev)
    return c.at[..., key.params.k, 0].add(mu)


def tlwe_phase(samples, key: TLweKey):
    """phi = b - sum s_i (*) a_i (tLwePhase, tlwe_functions.cpp:92-99)."""
    samples = jnp.asarray(samples)
    k = key.params.k
    a, b = samples[..., :k, :], samples[..., k, :]
    return b - key.key_times(a)


def noiseless_trivial_poly(mu, k: int):
    """(0, mu) (tLweNoiselessTrivial, tlwe_functions.cpp:146-152)."""
    mu = jnp.asarray(mu)
    a = jnp.zeros(mu.shape[:-1] + (k, mu.shape[-1]), mu.dtype)
    return jnp.concatenate([a, mu[..., None, :]], axis=-2)


def mul_by_xai_minus_one(power, samples):
    """(X^power - 1) * sample across all k+1 polynomials
    (tLweMulByXaiMinusOne, tlwe_functions.cpp:209-213)."""
    return poly.mul_by_xai_minus_one(power, samples)


def extract_lwe(samples, index: int = 0):
    """TRLWE -> LWE at coefficient `index` (tlwe_functions.cpp:351-362)."""
    return poly.sample_extract(samples, index)
