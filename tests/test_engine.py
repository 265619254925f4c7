"""Engine equivalence: matmul / conv backends vs the exact naive oracle
(the analog of the reference's FFT-vs-Karatsuba differential tests,
test_parallel_multiplications.cpp:126-132 — but required to match exactly,
not within +-1, because our backends are exact integer arithmetic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.engine import EngineConfig, make_engine


def _rand_case(rng, N, bits, digit_bits, B, J, U):
    dt = np.int32 if bits == 32 else np.int64
    half = 1 << (digit_bits - 1)
    x = rng.integers(-half, half, (B, J, N)).astype(np.int32)
    if bits == 32:
        key = rng.integers(-2**31, 2**31, (J, U, N)).astype(np.int32)
    else:
        key = rng.integers(0, 2**64, (J, U, N), dtype=np.uint64).astype(np.int64)
    return x, key, dt


@pytest.mark.parametrize("backend", ["matmul", "onthefly", "conv", "conv_bf16"])
@pytest.mark.parametrize("bits,digit_bits", [(32, 8), (32, 7), (64, 9)])
def test_backend_matches_naive(backend, bits, digit_bits):
    N, B, J, U = 64, 3, 4, 2
    cfg = EngineConfig(N=N, out_bits=bits, digit_bits=digit_bits)
    rng = np.random.default_rng(42)
    x, key, dt = _rand_case(rng, N, bits, digit_bits, B, J, U)

    oracle = make_engine(cfg, "naive")
    ref = np.asarray(oracle.accumulate(jnp.asarray(x),
                                       oracle.prepare(jnp.asarray(key))))
    eng = make_engine(cfg, backend)
    got = np.asarray(eng.accumulate(jnp.asarray(x), eng.prepare(jnp.asarray(key))))
    assert got.dtype == ref.dtype == dt
    assert np.array_equal(got, ref)


def test_naive_engine_is_negacyclic():
    # cross-check the oracle itself against a scalar python model
    N, J, U = 16, 2, 1
    cfg = EngineConfig(N=N, out_bits=32, digit_bits=8)
    rng = np.random.default_rng(7)
    x = rng.integers(-128, 128, (1, J, N)).astype(np.int32)
    key = rng.integers(-2**31, 2**31, (J, U, N)).astype(np.int32)
    eng = make_engine(cfg, "naive")
    got = np.asarray(eng.accumulate(jnp.asarray(x), eng.prepare(jnp.asarray(key))))
    expect = np.zeros((U, N), np.int64)
    for j in range(J):
        full = np.convolve(x[0, j].astype(object), key[j, 0].astype(object))
        res = np.zeros(N, dtype=object)
        res[:N] += full[:N]
        res[: N - 1] -= full[N:]
        expect[0] += np.array([int(v) % 2**32 for v in res], np.uint64).astype(np.int64)
    expect = (expect % 2**32).astype(np.uint32).astype(np.int32)
    assert np.array_equal(got[0], expect)


def test_engine_batch_shapes():
    cfg = EngineConfig(N=32, out_bits=32, digit_bits=8)
    eng = make_engine(cfg, "matmul")
    rng = np.random.default_rng(3)
    key = rng.integers(-2**31, 2**31, (3, 2, 32)).astype(np.int32)
    prep = eng.prepare(jnp.asarray(key))
    x = rng.integers(-128, 128, (5, 4, 3, 32)).astype(np.int32)  # extra leading dims
    out = eng.accumulate(jnp.asarray(x), prep)
    assert out.shape == (5, 4, 2, 32)


# ---------------------------------------------------------------------------
# Nussbaumer engine (ops/nussbaumer.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N", [64, 128, 256])
@pytest.mark.parametrize("bits,digit_bits", [(32, 7), (32, 8), (64, 9)])
def test_nussbaumer_exact_when_key_divisible(N, bits, digit_bits):
    """With key coefficients divisible by 2m the 1/2m fold is exact and the
    engine must match the naive oracle BIT-EXACTLY."""
    from tfhe_tpu.ops.nussbaumer import split_mr
    B, J, U = 3, 4, 2
    m, r = split_mr(N)
    cfg = EngineConfig(N=N, out_bits=bits, digit_bits=digit_bits)
    rng = np.random.default_rng(5)
    x, key, dt = _rand_case(rng, N, bits, digit_bits, B, J, U)
    key = (key >> np.uint8(m.bit_length())) << np.uint8(m.bit_length())  # multiple of 2m

    oracle = make_engine(cfg, "naive")
    ref = np.asarray(oracle.accumulate(jnp.asarray(x),
                                       oracle.prepare(jnp.asarray(key))))
    eng = make_engine(cfg, "nussbaumer")
    got = np.asarray(eng.accumulate(jnp.asarray(x), eng.prepare(jnp.asarray(key))))
    assert got.dtype == ref.dtype == dt
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("N,bits,digit_bits", [(64, 32, 7), (256, 32, 7), (128, 64, 9)])
def test_nussbaumer_fold_error_bounded(N, bits, digit_bits):
    """Random keys: output differs from exact only by the key-rounding fold
    a (*) eps with |eps| <= m — check the worst coefficient against the hard
    bound J*N*max|digit|*m and a 6-sigma statistical bound."""
    from tfhe_tpu.ops.nussbaumer import split_mr
    B, J, U = 4, 4, 2
    m, r = split_mr(N)
    cfg = EngineConfig(N=N, out_bits=bits, digit_bits=digit_bits)
    rng = np.random.default_rng(11)
    x, key, dt = _rand_case(rng, N, bits, digit_bits, B, J, U)

    oracle = make_engine(cfg, "naive")
    ref = np.asarray(oracle.accumulate(jnp.asarray(x),
                                       oracle.prepare(jnp.asarray(key))))
    eng = make_engine(cfg, "nussbaumer")
    got = np.asarray(eng.accumulate(jnp.asarray(x), eng.prepare(jnp.asarray(key))))
    err = (got - ref).astype(np.int64 if bits == 32 else np.int64)
    half = 1 << (digit_bits - 1)
    var = J * N * (half**2 / 3) * ((2 * m) ** 2 / 12)
    assert np.abs(err).max() <= 6 * np.sqrt(var)
    assert np.abs(err).max() > 0 or m == 1   # rounding is really happening


@pytest.mark.parametrize("backend", ["matmul", "onthefly", "conv"])
def test_key_limb_truncation_bounded(backend):
    """key_limbs=3 rounds keys to the top 24 bits: result differs from exact
    by sum digit*eps with |eps| <= 2^7 — hard 6-sigma statistical bound."""
    N, B, J, U = 64, 4, 6, 2
    cfg = EngineConfig(N=N, out_bits=32, digit_bits=7, key_limbs=3)
    rng = np.random.default_rng(9)
    x, key, dt = _rand_case(rng, N, 32, 7, B, J, U)
    key[0, 0, 0] = -2**31          # clamp edge
    key[0, 0, 1] = 2**31 - 1

    oracle = make_engine(EngineConfig(N=N, out_bits=32, digit_bits=7), "naive")
    ref = np.asarray(oracle.accumulate(jnp.asarray(x),
                                       oracle.prepare(jnp.asarray(key))))
    eng = make_engine(cfg, backend)
    got = np.asarray(eng.accumulate(jnp.asarray(x), eng.prepare(jnp.asarray(key))))
    err = np.abs((got - ref).astype(np.int64))
    var = J * N * (64**2 / 3) * (2.0**16 / 12)
    assert err.max() <= 6 * np.sqrt(var)
    assert err.max() > 0


def test_noise_helpers():
    from tfhe_tpu.params import GATE_MXU, GATE_DEFAULT
    from tfhe_tpu.noise import (key_truncation_variance,
                                nussbaumer_fold_variance,
                                gate_bootstrap_variances)
    g = gate_bootstrap_variances(GATE_MXU)
    tv = key_truncation_variance(GATE_MXU)
    assert key_truncation_variance(GATE_DEFAULT) == 0.0
    # truncation must stay a modest fraction of the bk term it mimics
    assert 0 < tv < 0.5 * g.tbk1
    fv = nussbaumer_fold_variance(GATE_DEFAULT)
    assert 0 < fv < 0.25 * g.final_variance
