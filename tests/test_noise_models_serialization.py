"""Noise calculators (C25), boolean circuit models, LUT trees, and key
serialization."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import CB_ACTIVE, GATE_DEFAULT, GATE_TOY, TGswParams, TLweParams
from tfhe_tpu import noise
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import tlwe, tgsw


def test_circuit_noise_matches_js_worksheet():
    """Values for the active block, cross-checked by evaluating the JS
    formulas (misc/params.html:100-127) by hand."""
    r = noise.circuit_bootstrap_variances(CB_ACTIVE)
    # tmodswitch = (500+1)/(16*2048^2)
    assert abs(r.tmodswitch - 501 / (16 * 2048**2)) < 1e-12
    # tpreks1 = 1024 * 6 * 2^-28
    assert abs(r.tpreks1 - 1024 * 6 * 2.0**-28) < 1e-12
    # tbk1 = 500*2*4*2048*(2^8)^2*2^-88
    assert abs(r.tbk1 - 500 * 2 * 4 * 2048 * 2.0**16 * 2.0**-88) < 1e-20
    assert r.final_variance < r.max_bootstrappable_variance
    assert r.max_lvl1_depth > 1


def test_gate_noise_default_params_bootstrappable():
    r = noise.gate_bootstrap_variances(GATE_DEFAULT)
    assert r.bootstrappable
    # gate error probability should be cryptographically negligible
    assert r.log2_err_gate < -30


def test_shared_rotation_penalty_gates_the_optimization():
    # For the active block the 2^(2*bgbit1) amplification of the rotation
    # noise (dominated by the decomposition tail tbk2) grows TRGSW row
    # variance ~10^4x -> circuit_bootstrap(shared_rotation=None) must fall
    # back to the reference's per-level rotations.
    from tfhe_tpu.params import CB_TOY
    assert noise.shared_rotation_penalty(CB_ACTIVE) > noise.SHARED_ROTATION_MAX_PENALTY
    assert noise.shared_rotation_penalty(CB_TOY) > 1.0  # not free even on toy


def test_boolean_circuit_adder_batched():
    """B parallel adder instances through the consolidated runtime
    (instance axis multiplies every wave's bootstrap width)."""
    from tfhe_tpu.boot import gate
    from tfhe_tpu.runtime import scheduler
    rng = TfheRng(31)
    sk = gate.SecretKey.generate(GATE_TOY, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    circ, outs = scheduler.ripple_carry_adder(3)

    xs = np.array([3, 5, 7])
    ys = np.array([4, 2, 1])
    B = len(xs)
    bits = np.zeros((B, 6), np.int64)
    for i in range(3):
        bits[:, i] = (xs >> i) & 1
        bits[:, 3 + i] = (ys >> i) & 1
    cts = np.stack([np.asarray(gate.encrypt_bool(sk, bits[b], rng))
                    for b in range(B)])                   # (B, 6, n+1)
    inp = jnp.moveaxis(jnp.asarray(cts), 0, 1)            # (6, B, n+1)
    out = scheduler.evaluate(circ, inp, ck.data, GATE_TOY, outs,
                             backend="onthefly")          # (4, B, n+1)
    dec = np.stack([gate.decrypt_bool(sk, out[:, b]) for b in range(B)])
    got = sum(dec[:, i].astype(int) << i for i in range(4))
    assert np.array_equal(got, xs + ys)


def test_lut_tree():
    from tfhe_tpu.models import lut
    ring = TLweParams(N=64, k=1, stdev=0.0, bits=32)
    p = TGswParams(l=3, bgbit=7, tlwe=ring)
    rng = TfheRng(33)
    key = tlwe.TLweKey.generate(ring, rng)
    values = np.array([1, 2, 3, 4, 5, 6, 7, 0], np.int32) << 28
    for index in (0, 3, 6):
        sel_bits = [(index >> j) & 1 for j in range(3)]
        sels = []
        for b in sel_bits:
            g = tgsw.encrypt(key, np.array([b]), p, rng)
            sels.append(tgsw.prepare(g[0], p, "matmul")[1])
        out = lut.eval_lut(sels, values, p, "matmul")
        ph = np.asarray(tlwe.tlwe_phase(out[None], key))[0]
        assert abs(int(ph[0]) - int(values[index])) < 2**16, index


def test_lut_tree_production_geometry():
    """eval_lut_batch at the PRODUCTION lvl1 output geometry of the CB
    pipeline (CB_MXU/CB_ACTIVE tgsw_lvl1: N=1024, l=2, Bg=2^8) with
    synthetic noisy TRGSW selectors — the LUT side of BASELINE config 4
    without the (hardware-benched) circuit bootstrap in front
    (tools/cb_lut_bench.py drives the full composition on the chip)."""
    from tfhe_tpu.models import lut
    from tfhe_tpu.params import CB_MXU
    p = CB_MXU.tgsw_lvl1
    rng = TfheRng(44)
    key = tlwe.TLweKey.generate(p.tlwe, rng)
    r = np.random.default_rng(9)
    K, NI = 3, 4
    # 4-bit message space (amplitude grid 2^28): the tree noise at this
    # gadget (l*bgbit=16 tail over K levels) is ~2^24-2^25, so coarse-grid
    # messages decode exactly while full-torus equality would not
    values = (r.integers(0, 16, 1 << K).astype(np.int32) << 28)
    idx = r.integers(0, 1 << K, NI)
    bits = ((idx[:, None] >> np.arange(K)[None, :]) & 1).reshape(-1)
    gsw = tgsw.encrypt(key, bits.astype(np.int32), p, rng, stdev=2.0**-25)
    sel = np.asarray(gsw).reshape(NI, K, *gsw.shape[1:])
    out = lut.eval_lut_batch(sel, values, p, backend="conv")
    ph = np.asarray(tlwe.tlwe_phase(out, key))[:, 0]
    dec = ((ph.astype(np.int64) + (1 << 27)) >> 28) & 15
    np.testing.assert_array_equal(dec, (values[idx] >> 28) & 15)
    err = np.abs(((ph.astype(np.int64) - values[idx].astype(np.int64)
                   + 2**31) % 2**32) - 2**31)
    assert err.max() < 2**27, err.max()      # noise margin


def test_serialization_roundtrip(tmp_path):
    from tfhe_tpu.utils import serialization as ser
    from tfhe_tpu.boot import gate
    rng = TfheRng(37)
    sk = gate.SecretKey.generate(GATE_TOY, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    path = str(tmp_path / "cloud.npz")
    ser.save_keydata(path, ck.data, GATE_TOY, meta={"backend": "onthefly"})
    tree, params, meta = ser.load_keydata(path)
    assert meta["backend"] == "onthefly"
    assert params == GATE_TOY
    for a, b in zip(__import__("jax").tree.leaves(ck.data),
                    __import__("jax").tree.leaves(tree)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # loaded key actually bootstraps
    ct = gate.encrypt_bool(sk, np.array([1, 0]), rng)
    out = gate.bootstrap(ct, tree, params, backend="onthefly")
    assert np.array_equal(gate.decrypt_bool(sk, out), [True, False])


def test_serialization_roundtrip_chunked(tmp_path):
    """Checkpoint/resume for the chunked (pre-shifted) key format: save,
    reload, and bootstrap with the reloaded key bit-identically."""
    from tfhe_tpu.boot import gate
    from tfhe_tpu.utils import serialization as ser
    rng = TfheRng(12)
    sk = gate.SecretKey.generate(GATE_TOY, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="chunked")
    path = str(tmp_path / "ck_chunked.npz")
    ser.save_keydata(path, ck.data, GATE_TOY, meta={"backend": "chunked"})
    tree, params, meta = ser.load_keydata(path)
    assert meta["backend"] == "chunked"
    bits = np.array([1, 0, 1])
    ct = gate.encrypt_bool(sk, bits, TfheRng(13))
    want = np.asarray(gate.bootstrap(ct, ck.data, GATE_TOY,
                                     backend="chunked"))
    got = np.asarray(gate.bootstrap(ct, tree, GATE_TOY, backend="chunked"))
    np.testing.assert_array_equal(got, want)


def test_circuit_key_raw_bk_roundtrip(tmp_path):
    """CB-scale checkpoint format (VERDICT r3 item 8): the on-disk form is
    the RAW TRGSW64 bk (+ preks/privks limbs) — ~m/2 x smaller than the
    prepared chunked wm — and load_circuit_key rebuilds the prepared form
    on the accelerator.  The rebuilt key must be bit-identical and the
    bootstrap output must match."""
    import jax
    from tfhe_tpu.boot import circuit
    from tfhe_tpu.params import CB_TOY
    from tfhe_tpu import lwe
    from tfhe_tpu.utils import serialization as ser
    rng = TfheRng(42)
    sk = circuit.CircuitSecretKey.generate(CB_TOY, rng)
    ck = circuit.CircuitCloudKey.generate(sk, rng, backend="chunked",
                                          keep_raw_bk=True)
    path = str(tmp_path / "circuit_key.npz")
    ser.save_circuit_key(path, ck)
    key_data, params = ser.load_circuit_key(path)
    assert params == CB_TOY
    for a, b in zip(jax.tree.leaves(ck.data["bk"]),
                    jax.tree.leaves(key_data["bk"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    msgs = np.array([np.int32(-(1 << 31)), 0], np.int32)
    ct = lwe.encrypt(sk.lwe_lvl1, msgs, TfheRng(7), 2.0**-20)
    want = np.asarray(circuit.circuit_bootstrap(ct, ck.data, CB_TOY,
                                                backend="chunked"))
    got = np.asarray(circuit.circuit_bootstrap(ct, key_data, CB_TOY,
                                               backend="chunked"))
    np.testing.assert_array_equal(got, want)
    # a different backend can be rebuilt from the same raw bk
    key_conv, _ = ser.load_circuit_key(path, backend="conv")
    out_conv = np.asarray(circuit.circuit_bootstrap(ct, key_conv, CB_TOY,
                                                    backend="conv"))
    np.testing.assert_array_equal(out_conv, want)   # exact engines agree
    # keys generated without the raw bk refuse to serialize
    ck2 = circuit.CircuitCloudKey.generate(sk, TfheRng(1), backend="conv")
    import pytest
    with pytest.raises(ValueError, match="keep_raw_bk"):
        ser.save_circuit_key(str(tmp_path / "x.npz"), ck2)
