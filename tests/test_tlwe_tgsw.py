"""TRLWE / TRGSW semantics (R5, R6, C10): phases, external product, CMux."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import TLweParams, TGswParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import tlwe, tgsw
from tfhe_tpu.ops import poly


def test_tlwe_encrypt_phase_roundtrip_32():
    p = TLweParams(N=64, k=1, stdev=2.0**-20, bits=32)
    rng = TfheRng(0)
    key = tlwe.TLweKey.generate(p, rng)
    msg = np.zeros((3, 64), np.int32)
    msg[:, 0] = [1 << 29, -(1 << 30), 1 << 28]
    ct = tlwe.encrypt_poly(key, jnp.asarray(msg), rng)
    ph = np.asarray(tlwe.tlwe_phase(ct, key))
    err = np.abs(ph.astype(np.int64) - msg)
    assert err.max() < 2**14


def test_tlwe_encrypt_phase_roundtrip_64():
    p = TLweParams(N=32, k=1, stdev=2.0**-40, bits=64)
    rng = TfheRng(1)
    key = tlwe.TLweKey.generate(p, rng)
    ct = tlwe.encrypt_scalar(key, np.int64(1) << 60, rng, (2,))
    ph = np.asarray(tlwe.tlwe_phase(ct, key))
    err = np.abs(ph.astype(np.float64) - np.array([[1 << 60] + [0] * 31] * 2))
    assert err.max() < 2**26


def test_key_times_matches_naive():
    p = TLweParams(N=32, k=2, stdev=0.0, bits=32)
    rng = TfheRng(2)
    key = tlwe.TLweKey.generate(p, rng)
    a = rng.uniform32((5, 2, 32))
    got = np.asarray(key.key_times(jnp.asarray(a)))
    expect = np.zeros((5, 32), np.int64)
    for i in range(2):
        prod = np.asarray(poly.negacyclic_mul_exact(
            jnp.asarray(key.key[i]), jnp.asarray(a[:, i])))
        expect += prod
    assert np.array_equal(got, expect.astype(np.int32))


def _phase_err(ph, expect):
    d = (np.asarray(ph).astype(np.int64) - np.asarray(expect).astype(np.int64))
    return np.abs(d).max()


def test_external_product_32():
    ring = TLweParams(N=64, k=1, stdev=0.0, bits=32)
    p = TGswParams(l=3, bgbit=7, tlwe=ring)
    rng = TfheRng(3)
    key = tlwe.TLweKey.generate(ring, rng)

    msg = np.zeros((64,), np.int32)
    msg[0] = 1 << 29
    msg[5] = -(1 << 28)
    v = tlwe.encrypt_poly(key, jnp.asarray(msg)[None], rng)   # (1, k+1, N)

    for bit in (0, 1):
        gsw = tgsw.encrypt(key, np.array([bit]), p, rng)       # (1, ...)
        eng, prep = tgsw.prepare(gsw[0], p, "matmul")
        out = tgsw.external_product(v, prep, p, "matmul")
        ph = tlwe.tlwe_phase(out, key)
        # phase should be bit * msg up to decomposition tail
        # eps = 2^(32 - l*bgbit - 1) amplified by ~(1 + N)
        assert _phase_err(ph, bit * msg[None]) < 2**(32 - 21) * 70, bit


def test_cmux_selects():
    ring = TLweParams(N=64, k=1, stdev=0.0, bits=32)
    p = TGswParams(l=3, bgbit=7, tlwe=ring)
    rng = TfheRng(4)
    key = tlwe.TLweKey.generate(ring, rng)
    m0 = np.zeros(64, np.int32); m0[0] = 1 << 29
    m1 = np.zeros(64, np.int32); m1[0] = -(1 << 29)
    d0 = tlwe.noiseless_trivial_poly(jnp.asarray(m0)[None], 1)
    d1 = tlwe.noiseless_trivial_poly(jnp.asarray(m1)[None], 1)
    for bit in (0, 1):
        gsw = tgsw.encrypt(key, np.array([bit]), p, rng)
        _, prep = tgsw.prepare(gsw[0], p, "matmul")
        out = tgsw.cmux(prep, d1, d0, p, "matmul")
        ph = tlwe.tlwe_phase(out, key)
        want = m1 if bit else m0
        assert _phase_err(ph, want[None]) < 2**13, bit


def test_external_product_64():
    ring = TLweParams(N=64, k=1, stdev=0.0, bits=64)
    p = TGswParams(l=4, bgbit=9, tlwe=ring)
    rng = TfheRng(5)
    key = tlwe.TLweKey.generate(ring, rng)
    msg = np.zeros((64,), np.int64)
    msg[0] = np.int64(1) << 60
    v = tlwe.encrypt_poly(key, jnp.asarray(msg)[None], rng)
    for bit in (0, 1):
        gsw = tgsw.encrypt(key, np.array([bit]), p, rng)
        _, prep = tgsw.prepare(gsw[0], p, "conv")
        out = tgsw.external_product(v, prep, p, "conv")
        ph = tlwe.tlwe_phase(out, key)
        assert _phase_err(ph, bit * msg[None]) < 2**(64 - 37) * 70, bit


def test_host_keygen_fft_path_exact():
    """The numpy-FFT keygen fast path (tlwe._host_key_times_fft) is
    bit-identical to the exact limb-matmul engine for binary keys at both
    torus widths, including the 64-bit hi/lo-limb recombination."""
    import numpy as np
    import jax.numpy as jnp
    from tfhe_tpu.params import TLweParams
    from tfhe_tpu import tlwe
    from tfhe_tpu.rng import TfheRng

    for bits, N, k in [(32, 256, 1), (32, 128, 2), (64, 256, 1)]:
        p = TLweParams(N=N, k=k, stdev=0.0, bits=bits)
        key = tlwe.TLweKey.generate(p, TfheRng(1))
        r = np.random.default_rng(0)
        dt = np.int32 if bits == 32 else np.int64
        x = r.integers(-2**(bits - 1), 2**(bits - 1), (5, k, N)).astype(dt)
        fast = np.asarray(tlwe._host_key_times_fft(key.key, x, bits))
        eng, prep = key.engine()
        slow = np.asarray(eng.accumulate(jnp.asarray(x), prep))[..., 0, :]
        assert fast.dtype == slow.dtype
        assert np.array_equal(fast, slow), (bits, N, k)
