"""FFTEngine (evaluation-domain product backend) — error envelope vs the
exact integer oracle, C12/C13 parity (VERDICT r1 item 7).

The reference's spqlios FFT path carries bounded rounding error (its torus64
circuit-bootstrap products stay within ~2^7 absolute of exact — the margin
the noise budget absorbs).  These tests pin our envelopes:
  f64 path (CPU, the direct analog):   <= 2^4  on torus32 gate shapes
  dd  path (f32x2, jittable on TPU):   <= 2^8  on torus32 gate shapes
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.engine import EngineConfig, make_engine
from tfhe_tpu.ops import fft


def _rand_case(rng, N, J, U, digit_mag):
    key = rng.integers(-2**31, 2**31, (J, U, N)).astype(np.int32)
    x = rng.integers(-digit_mag, digit_mag + 1, (4, J, N)).astype(np.int32)
    return key, x


@pytest.mark.parametrize("N,J,U", [(1024, 6, 2), (512, 9, 3)])
@pytest.mark.parametrize("backend,bound", [("fft_f64", 2.0**4),
                                           ("fft_dd", 2.0**8)])
def test_fft_engine_error_envelope(N, J, U, backend, bound):
    cfg = EngineConfig(N=N, out_bits=32, digit_bits=7)
    rng = np.random.default_rng(0)
    key, x = _rand_case(rng, N, J, U, 64)

    exact = make_engine(cfg, "naive")
    want = np.asarray(exact.accumulate(x, exact.prepare(key)))

    eng = make_engine(cfg, backend)
    got = np.asarray(eng.accumulate(x, eng.prepare(key)))
    assert got.shape == want.shape and got.dtype == want.dtype
    # compare mod 2^32 with centred representative
    diff = (got.astype(np.int64) - want.astype(np.int64)).astype(np.int32)
    assert np.abs(diff).max() <= bound, np.abs(diff).max()


def test_fft_engine_roundtrip_dd():
    """dd forward/inverse round-trips integers exactly at torus32 scale."""
    rng = np.random.default_rng(1)
    a = rng.integers(-2**31, 2**31, (3, 512)).astype(np.int32)
    hat = fft.negacyclic_fft_dd_dev(a)
    back = np.asarray(fft.negacyclic_ifft_dd_dev(hat, 512, 32))
    np.testing.assert_array_equal(back, a)


def test_fft_engine_jits_dd():
    """The dd path is jittable; under jit XLA may fuse mul+add into fma,
    perturbing the error-free transforms — so assert the ENVELOPE (vs the
    exact oracle), not bit-equality with the eager run."""
    cfg = EngineConfig(N=256, out_bits=32, digit_bits=7)
    eng = make_engine(cfg, "fft_dd")
    rng = np.random.default_rng(2)
    key, x = _rand_case(rng, 256, 4, 2, 64)
    prep = eng.prepare(key)
    got = np.asarray(jax.jit(lambda x: eng.accumulate(x, prep))(x))
    exact = make_engine(cfg, "naive")
    want = np.asarray(exact.accumulate(x, exact.prepare(key)))
    diff = (got.astype(np.int64) - want.astype(np.int64)).astype(np.int32)
    assert np.abs(diff).max() <= 2.0**8, np.abs(diff).max()


def test_fft_engine_rejects_unsupported():
    with pytest.raises(ValueError):
        make_engine(EngineConfig(N=256, out_bits=64, digit_bits=9), "fft_dd")
