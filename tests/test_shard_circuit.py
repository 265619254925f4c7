"""Sharded circuit bootstrapping over a dp x ep mesh (VERDICT r3 item 1:
the multi-chip CB path — batch over dp; preKS rows, lvl2 external-product
digit rows and privKS rows over ep with one psum per step/switch)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import CB_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe, tgsw
from tfhe_tpu.boot import circuit
from tfhe_tpu.parallel import shard


@pytest.fixture(scope="module", params=["chunked", "conv"])
def keys(request):
    rng = TfheRng(42)
    sk = circuit.CircuitSecretKey.generate(CB_TOY, rng)
    ck = circuit.CircuitCloudKey.generate(sk, rng, backend=request.param)
    return sk, ck, request.param


def _encrypt_bits(sk, bits, rng):
    msgs = np.where(np.asarray(bits).astype(bool), np.int32(-(1 << 31)), 0)
    return lwe.encrypt(sk.lwe_lvl1, msgs.astype(np.int32), rng, 2.0**-20)


def test_sharded_cb_matches_unsharded(keys):
    """dp=4 x ep=2: bit-identical to the single-device pipeline (wrap
    addition is associative, so the ep psum split is exact)."""
    sk, ck, backend = keys
    rng = TfheRng(5)
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    ct = _encrypt_bits(sk, bits, rng)

    want = np.asarray(circuit.circuit_bootstrap(ct, ck.data, CB_TOY,
                                                backend=backend))
    mesh = shard.make_mesh(8, dp=4, ep=2)
    fn, place = shard.make_sharded_circuit_bootstrap_fn(CB_TOY, mesh,
                                                        backend=backend)
    key_data, cts = place(ck.data, jnp.asarray(ct))
    got = np.asarray(fn(key_data, cts))
    np.testing.assert_array_equal(got, want)

    # decrypt-verify the TRGSW phase structure (row (z=1, w): bit * h_w)
    ph = np.asarray(tgsw.tgsw_phase(jnp.asarray(got), sk.ring_lvl1))
    h = [1 << (32 - (w + 1) * CB_TOY.tgsw_lvl1.bgbit)
         for w in range(CB_TOY.tgsw_lvl1.l)]
    for b in range(len(bits)):
        for w in range(CB_TOY.tgsw_lvl1.l):
            row = ph[b, 1, w]
            assert abs(int(row[0]) - bits[b] * h[w]) < 2**22, (b, w)
            assert np.abs(row[1:]).max() < 2**22


def test_sharded_cb_ep4_and_dp_only(keys):
    """Other mesh shapes: ep=4 (kpl2=8 divides) and a dp-only mesh."""
    sk, ck, backend = keys
    rng = TfheRng(7)
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0])
    ct = _encrypt_bits(sk, bits, rng)
    want = np.asarray(circuit.circuit_bootstrap(ct, ck.data, CB_TOY,
                                                backend=backend))
    for dp, ep in ((2, 4), (8, 1)):
        mesh = shard.make_mesh(8, dp=dp, ep=ep)
        fn, place = shard.make_sharded_circuit_bootstrap_fn(
            CB_TOY, mesh, backend=backend)
        key_data, cts = place(ck.data, jnp.asarray(ct))
        got = np.asarray(fn(key_data, cts))
        np.testing.assert_array_equal(got, want, err_msg=f"dp={dp} ep={ep}")


def test_sharded_cb_bad_ep_raises():
    """ep not dividing the lvl2 digit-row count is a clear ValueError."""
    mesh = shard.make_mesh(6, dp=2, ep=3)       # kpl2 = 8, 8 % 3 != 0
    with pytest.raises(ValueError, match="kpl"):
        shard.make_sharded_circuit_bootstrap_fn(CB_TOY, mesh,
                                                backend="chunked")


def test_sharded_cb_shared_rotation_modes(keys):
    """Both rotation modes run sharded and agree with their unsharded
    counterparts."""
    sk, ck, backend = keys
    if backend == "conv":
        pytest.skip("mode equivalence is backend-independent; covered once")
    rng = TfheRng(9)
    ct = _encrypt_bits(sk, np.array([1, 0]), rng)
    ct = jnp.concatenate([ct, ct], axis=0)       # batch 4 = dp
    mesh = shard.make_mesh(8, dp=4, ep=2)
    for sr in (True, False):
        want = np.asarray(circuit.circuit_bootstrap(
            ct, ck.data, CB_TOY, backend=backend, shared_rotation=sr))
        fn, place = shard.make_sharded_circuit_bootstrap_fn(
            CB_TOY, mesh, backend=backend, shared_rotation=sr)
        key_data, cts = place(ck.data, jnp.asarray(ct))
        np.testing.assert_array_equal(np.asarray(fn(key_data, cts)), want)
