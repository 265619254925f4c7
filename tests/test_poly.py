"""Negacyclic polynomial ops vs numpy big-int models (C11, R2)."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ops import poly


def np_negacyclic(a, b, mod_bits=32):
    """Exact negacyclic product via numpy object/int64 arithmetic."""
    N = len(a)
    full = np.convolve(a.astype(object), b.astype(object))
    res = np.zeros(N, dtype=object)
    res[: N] += full[: N]
    res[: N - 1] -= full[N:]
    m = 2**mod_bits
    res = np.array([((int(v) + m // 2) % m) - m // 2 for v in res])
    return res.astype(np.int32 if mod_bits == 32 else np.int64)


def test_negacyclic_shift_static():
    N = 16
    rng = np.random.default_rng(0)
    x = rng.integers(-2**31, 2**31, N).astype(np.int32)
    for r in [0, 1, 5, N - 1, N, N + 3, 2 * N - 1]:
        a = np.zeros(N, object)
        a[r % N] = 1 if (r % (2 * N)) < N else -1
        expect = np_negacyclic(a, x)
        got = np.asarray(poly.negacyclic_shift(jnp.asarray(x), r))
        assert np.array_equal(got, expect), r


def test_mul_by_xai_batched():
    N = 32
    rng = np.random.default_rng(1)
    B = 9
    x = rng.integers(-2**31, 2**31, (B, N)).astype(np.int32)
    powers = rng.integers(0, 2 * N, B).astype(np.int32)
    got = np.asarray(poly.mul_by_xai(jnp.asarray(powers), jnp.asarray(x)))
    for b in range(B):
        a = np.zeros(N, object)
        r = int(powers[b])
        a[r % N] = 1 if r < N else -1
        assert np.array_equal(got[b], np_negacyclic(a, x[b])), b


def test_mul_by_xai_minus_one_matches_reference_semantics():
    # torusPolynomialMulByXaiMinusOne (numeric_functions.cpp:304-323)
    N = 8
    x = np.arange(1, N + 1).astype(np.int32)
    for a in range(2 * N):
        got = np.asarray(poly.mul_by_xai_minus_one(
            jnp.asarray(np.int32(a)), jnp.asarray(x)))
        out = np.zeros(N, np.int32)
        if a < N:
            for i in range(a):
                out[i] = -x[i - a + N] - x[i]
            for i in range(a, N):
                out[i] = x[i - a] - x[i]
        else:
            aa = a - N
            for i in range(aa):
                out[i] = x[i - aa + N] - x[i]
            for i in range(aa, N):
                out[i] = -x[i - aa] - x[i]
        assert np.array_equal(got, out), a


def test_negacyclic_mul_exact_32():
    N = 64
    rng = np.random.default_rng(2)
    a = rng.integers(-128, 128, N).astype(np.int32)
    b = rng.integers(-2**31, 2**31, N).astype(np.int32)
    got = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, np_negacyclic(a, b))


def test_negacyclic_mul_exact_64():
    N = 32
    rng = np.random.default_rng(3)
    a = rng.integers(-256, 256, N).astype(np.int32)
    b = rng.integers(0, 2**64, N, dtype=np.uint64).astype(np.int64)
    got = np.asarray(poly.negacyclic_mul_exact(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, np_negacyclic(a, b, mod_bits=64))


def test_sample_extract():
    # tLweExtractLweSampleIndex (tlwe_functions.cpp:351-362), index 0
    N, k = 16, 1
    rng = np.random.default_rng(4)
    av = rng.integers(-2**31, 2**31, (k + 1, N)).astype(np.int32)
    got = np.asarray(poly.sample_extract(jnp.asarray(av), 0))
    expect_a = np.zeros(k * N, np.int32)
    expect_a[0] = av[0, 0]
    for j in range(1, N):
        expect_a[j] = -av[0, N - j]
    assert np.array_equal(got[:-1], expect_a)
    assert got[-1] == av[k, 0]


# ---------------------------------------------------------------------------
# R2 convenience op set (added round 2)
# ---------------------------------------------------------------------------

def test_add_sub_mul_z_wraps():
    import numpy as np
    import jax.numpy as jnp
    from tfhe_tpu.ops import poly
    a = jnp.asarray(np.array([2**31 - 1, -5], np.int32))
    x = jnp.asarray(np.array([1, 1], np.int32))
    got = np.asarray(poly.add_mul_z(a, 3, x))
    want = (np.array([2**31 - 1, -5], np.int64) + 3) % 2**32
    np.testing.assert_array_equal(got.astype(np.uint32), want.astype(np.uint32))
    back = np.asarray(poly.sub_mul_z(jnp.asarray(got), 3, x))
    np.testing.assert_array_equal(back, np.asarray(a))


def test_norms_match_reference_semantics():
    import numpy as np
    from tfhe_tpu.ops import poly
    r = np.random.default_rng(0)
    a = r.integers(-100, 100, (3, 16)).astype(np.int32)
    b = r.integers(-100, 100, (3, 16)).astype(np.int32)
    np.testing.assert_allclose(np.asarray(poly.int_norm_sq2(a)),
                               (a.astype(np.float64) ** 2).sum(-1))
    np.testing.assert_allclose(np.asarray(poly.int_norm_infty_dist(a, b)),
                               np.abs(a - b).max(-1))
    t1 = r.integers(-2**31, 2**31, (16,)).astype(np.int32)
    t2 = (t1 + 7).astype(np.int32)
    d = np.asarray(poly.torus_norm_infty_dist(t1, t2))
    np.testing.assert_allclose(d, 7 / 2.0**32)


def test_mul_fft_matches_exact_small():
    import numpy as np
    import jax.numpy as jnp
    from tfhe_tpu.ops import poly
    r = np.random.default_rng(1)
    a = r.integers(-64, 65, (2, 64)).astype(np.int32)
    b = r.integers(-2**31, 2**31, (2, 64)).astype(np.int32)
    want = np.asarray(poly.negacyclic_mul_exact(a, jnp.asarray(b)))
    got = np.asarray(poly.mul_fft(a, b))
    diff = (got.astype(np.int64) - want.astype(np.int64)).astype(np.int32)
    assert np.abs(diff).max() <= 4
    acc = jnp.asarray(r.integers(-2**31, 2**31, (2, 64)).astype(np.int32))
    gadd = np.asarray(poly.add_mul_fft(acc, a, b))
    gsub = np.asarray(poly.sub_mul_fft(acc, a, b))
    np.testing.assert_array_equal(gadd, np.asarray(acc) + got)
    np.testing.assert_array_equal(gsub, np.asarray(acc) - got)
