"""End-to-end gate bootstrapping on toy parameters (R4 + gate API)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import GATE_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe
from tfhe_tpu.boot import gate


@pytest.fixture(scope="module")
def keys():
    rng = TfheRng(123)
    sk = gate.SecretKey.generate(GATE_TOY, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="matmul")
    return sk, ck


def test_bootstrap_refreshes_sign(keys):
    sk, ck = keys
    rng = TfheRng(7)
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    ct = gate.encrypt_bool(sk, bits, rng)
    out = gate.bootstrap(ct, ck.data, GATE_TOY, backend=ck.backend)
    dec = gate.decrypt_bool(sk, out)
    assert np.array_equal(dec, bits.astype(bool))
    # phases should be close to +-1/8 (refreshed noise)
    ph = np.asarray(lwe.phase(out, sk.lwe_key)).astype(np.int64)
    want = np.where(bits, gate.MU_BOOL, -gate.MU_BOOL)
    assert np.abs(ph - want).max() < 2**26


@pytest.mark.parametrize("g,table", [
    (gate.gate_nand, [1, 1, 1, 0]),
    (gate.gate_and,  [0, 0, 0, 1]),
    (gate.gate_or,   [0, 1, 1, 1]),
    (gate.gate_nor,  [1, 0, 0, 0]),
    (gate.gate_xor,  [0, 1, 1, 0]),
    (gate.gate_xnor, [1, 0, 0, 1]),
    (gate.gate_andny, [0, 1, 0, 0]),   # (NOT x) AND y
    (gate.gate_andyn, [0, 0, 1, 0]),   # x AND (NOT y)
    (gate.gate_orny,  [1, 1, 0, 1]),   # (NOT x) OR y
    (gate.gate_oryn,  [1, 0, 1, 1]),   # x OR (NOT y)
])
def test_binary_gates(keys, g, table):
    sk, ck = keys
    rng = TfheRng(11)
    xs = np.array([0, 0, 1, 1])
    ys = np.array([0, 1, 0, 1])
    cx = gate.encrypt_bool(sk, xs, rng)
    cy = gate.encrypt_bool(sk, ys, rng)
    out = g(ck.data, cx, cy, GATE_TOY, backend=ck.backend)
    assert np.array_equal(gate.decrypt_bool(sk, out), np.array(table, bool))


def test_not_is_free(keys):
    sk, _ = keys
    rng = TfheRng(13)
    bits = np.array([0, 1])
    ct = gate.encrypt_bool(sk, bits, rng)
    assert np.array_equal(gate.decrypt_bool(sk, gate.gate_not(ct)), ~bits.astype(bool))


def test_mux(keys):
    sk, ck = keys
    rng = TfheRng(17)
    cs = np.array([0, 0, 1, 1, 0, 1])
    xs = np.array([0, 1, 0, 1, 1, 0])
    ys = np.array([1, 0, 1, 0, 0, 1])
    cc = gate.encrypt_bool(sk, cs, rng)
    cx = gate.encrypt_bool(sk, xs, rng)
    cy = gate.encrypt_bool(sk, ys, rng)
    out = gate.gate_mux(ck.data, cc, cx, cy, GATE_TOY, backend=ck.backend)
    want = np.where(cs, xs, ys).astype(bool)
    assert np.array_equal(gate.decrypt_bool(sk, out), want)


def test_bootstrap_conv_backend_bit_exact_vs_matmul(keys):
    """Same key randomness -> conv and matmul cloud keys produce IDENTICAL
    ciphertexts (both backends are exact integer arithmetic)."""
    sk, _ = keys
    ck_conv = gate.CloudKey.generate(sk, TfheRng(555), backend="conv")
    ck_mm = gate.CloudKey.generate(sk, TfheRng(555), backend="matmul")
    rng = TfheRng(19)
    bits = np.array([1, 0, 1])
    ct = gate.encrypt_bool(sk, bits, rng)
    out_conv = gate.bootstrap(ct, ck_conv.data, GATE_TOY, backend="conv")
    out_mm = gate.bootstrap(ct, ck_mm.data, GATE_TOY, backend="matmul")
    assert np.array_equal(np.asarray(out_conv), np.asarray(out_mm))
    assert np.array_equal(gate.decrypt_bool(sk, out_conv), bits.astype(bool))


def test_small_batch_pad_bit_identical(keys, monkeypatch):
    """blind_rotate pads sub-granule batches up to the fused-kernel tile
    (64) on TPU so B=1..63 latency stays on the Pallas path; the pad rows
    must not perturb the real rows.  Forced on under CPU here: a 3-row
    batch through the padded path must equal the unpadded result bit for
    bit."""
    sk, ck = keys
    rng = TfheRng(31)
    bits = np.array([1, 0, 1])
    ct = gate.encrypt_bool(sk, bits, rng)
    ref = np.asarray(gate.bootstrap(ct, ck.data, GATE_TOY,
                                    backend=ck.backend))
    monkeypatch.setenv("TFHE_FORCE_PAD", "1")
    out = np.asarray(gate.bootstrap(ct, ck.data, GATE_TOY,
                                    backend=ck.backend))
    assert np.array_equal(out, ref)
    assert np.array_equal(gate.decrypt_bool(sk, jnp.asarray(out)),
                          bits.astype(bool))
