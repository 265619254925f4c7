"""LWE encrypt/phase/keyswitch (R3) against scalar models."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import LweParams, KeySwitchParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe


def test_encrypt_phase_roundtrip():
    params = LweParams(n=64, stdev=2.0**-20)
    rng = TfheRng(0)
    key = lwe.LweKey.generate(params, rng)
    msgs = np.array([3 << 29, 1 << 30, -(1 << 29), 0], np.int32)
    ct = lwe.encrypt(key, msgs, rng)
    ph = np.asarray(lwe.phase(ct, key))
    err = np.abs(ph.astype(np.int64) - msgs)
    assert err.max() < 2**22  # noise ~2^-20 of torus = 2^12, margin for sum

    dec = np.asarray(lwe.decrypt(ct, key, 8))
    assert np.array_equal(dec, msgs)


def test_encrypt_matches_reference_formula():
    # b = m + e + sum a_i s_i, deterministic under false_random
    params = LweParams(n=8, stdev=0.0)
    rng = TfheRng(0, false_random=True)
    key = lwe.LweKey.generate(params, rng)
    assert (key.key == 1).all()
    ct = np.asarray(lwe.encrypt(key, np.int32(5), rng))
    a = np.full(8, np.uint32(0xCCCCCCCC).astype(np.int32))
    expect_b = np.int32(5) + a.astype(np.int64).sum().astype(np.int32)
    assert np.array_equal(ct[:8], a)
    assert ct[8] == expect_b


def test_keyswitch_preserves_phase():
    rng = TfheRng(1)
    in_params = LweParams(n=128, stdev=0.0)
    out_params = LweParams(n=64, stdev=0.0)
    ks = KeySwitchParams(t=8, basebit=2, stdev=2.0**-25)
    in_key = lwe.LweKey.generate(in_params, rng)
    out_key = lwe.LweKey.generate(out_params, rng)
    ksk = lwe.KeySwitchKey.generate(in_key, out_key, ks, rng)

    msgs = np.array([3 << 29, -(1 << 30), 0, 1 << 28], np.int32)
    ct = lwe.encrypt(in_key, msgs, rng, 2.0**-25)
    switched = lwe.keyswitch(ct, ksk)
    ph = np.asarray(lwe.phase(switched, out_key))
    err = np.abs(ph.astype(np.int64) - msgs)
    # error: ks noise (n*t*stdev) + decomposition tail (n * 2^-17)
    assert err.max() < 2**18, err


def test_keyswitch_matches_scalar_model():
    """One-hot matmul == the reference's digit scatter-subtract loop."""
    rng = TfheRng(2)
    in_params = LweParams(n=32, stdev=0.0)
    out_params = LweParams(n=16, stdev=0.0)
    ks = KeySwitchParams(t=6, basebit=2, stdev=2.0**-20)
    in_key = lwe.LweKey.generate(in_params, rng)
    out_key = lwe.LweKey.generate(out_params, rng)
    ksk = lwe.KeySwitchKey.generate(in_key, out_key, ks, rng)

    ct = np.asarray(lwe.encrypt(in_key, np.int32(3 << 29), rng, 2.0**-20))
    got = np.asarray(lwe.keyswitch(ct[None], ksk))[0]

    # scalar reference loop (lweKeySwitchTranslate_fromArray)
    table = ksk.raw
    res = np.zeros(17, np.int32)
    res[16] = ct[32]
    prec_offset = np.uint32(1 << (32 - (1 + ks.basebit * ks.t)))
    for i in range(32):
        aibar = np.uint32(ct[i].astype(np.uint32) + prec_offset)
        for j in range(ks.t):
            aij = (aibar >> np.uint32(32 - (j + 1) * ks.basebit)) & np.uint32(ks.base - 1)
            if aij != 0:
                res = (res.astype(np.int64) - table[i, j, aij].astype(np.int64)).astype(np.int32)
    assert np.array_equal(got, res)
