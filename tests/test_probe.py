"""Decrypt-probe debug facility (PARANO parity, SURVEY §4.5)."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import GATE_TOY, CB_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import torus as T, tlwe, tgsw
from tfhe_tpu.boot import gate, probe
from tfhe_tpu.boot import blind_rotate as br


def test_blind_rotate_probed_matches_production_and_tracks_noise():
    p = GATE_TOY
    rng = TfheRng(5)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    bits = np.array([True, False, True, True])
    ct = gate.encrypt_bool(sk, bits, rng)

    N = p.N
    a, b = ct[..., :-1], ct[..., -1]
    barb = T.mod_switch_from_torus32(b, 2 * N)
    bara = T.mod_switch_from_torus32(a, 2 * N)
    from tfhe_tpu.ops import poly
    tv = jnp.full((barb.shape[0], N), np.int32(gate.MU_BOOL), jnp.int32)
    tv = poly.mul_by_xai((2 * N - barb) % (2 * N), tv)
    acc0 = tlwe.noiseless_trivial_poly(tv, p.tgsw.tlwe.k)

    want = br.blind_rotate(acc0, ck.bk_prepared, bara, p.tgsw,
                           backend="onthefly")
    got, probes = probe.blind_rotate_probed(
        acc0, ck.bk_prepared, bara, p.tgsw, sk.ring_key, gate.MU_BOOL,
        backend="onthefly", every=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    assert probes[0].step == 0 and probes[-1].step == p.lwe.n - 1
    # every slot of every probed step sits near a test-vector level
    for pr in probes:
        assert pr.rms_noise < 2.0**-10, pr.rms_noise
        assert pr.phase.shape == (4, N)


def test_probe_tgsw_rows_sees_gadget_messages():
    p = CB_TOY.tgsw_lvl1
    rng = TfheRng(7)
    key = tlwe.TLweKey.generate(p.tlwe, rng)
    msgs = np.array([0, 1, 1])
    gsw = tgsw.encrypt(key, msgs, p, rng, stdev=0.0)
    phases, max_dev = probe.probe_tgsw_rows(gsw, key, p, message=msgs)
    assert phases.shape == (3, p.tlwe.k + 1, p.l, p.tlwe.N)
    assert max_dev < 2.0**-20, max_dev


def test_probe_lwe_phase_roundtrip():
    from tfhe_tpu import lwe
    p = GATE_TOY
    rng = TfheRng(9)
    k = lwe.LweKey.generate(p.lwe, rng)
    msg = np.int32(1 << 29)
    ct = lwe.encrypt(k, np.full((8,), msg), rng, 0.0)
    ph = probe.probe_lwe_phase(ct, k, "test")
    np.testing.assert_array_equal(ph, np.full((8,), msg))
