"""Worker process for the 2-process multi-host test (launched by
tests/test_multihost.py, one instance per rank).

Runs the full dp x ep shard_map gate bootstrap over a mesh SPANNING BOTH
PROCESSES (real cross-process Gloo collectives for the per-step ep psum),
then decrypts this host's output rows and checks them against plaintext
NAND truth — plus bit-identity against a locally-computed single-device
bootstrap of the same batch (the determinism contract of shard.py).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    from tfhe_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=rank)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from tfhe_tpu.params import GATE_TOY
    from tfhe_tpu.rng import TfheRng
    from tfhe_tpu.boot import gate
    from tfhe_tpu.parallel import shard

    params = GATE_TOY
    rng = TfheRng(0)                      # identical keys on both hosts
    sk = gate.SecretKey.generate(params, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")

    B = 16                                # global batch; 8 rows per host
    r = np.random.default_rng(7)
    xa = r.integers(0, 2, B)
    xb = r.integers(0, 2, B)
    erng = TfheRng(1)
    ca = np.asarray(gate.encrypt_bool(sk, xa, erng))
    cb = np.asarray(gate.encrypt_bool(sk, xb, erng))
    # NAND linear part (gate_nand, boot/gate.py): 1/8 - x - y
    lin = np.asarray(gate._trivial(gate.MU_BOOL, params.lwe.n)
                     - jnp.asarray(ca) - jnp.asarray(cb))

    mesh = multihost.make_multihost_mesh(ep=2)
    assert mesh.shape == {"dp": 4, "ep": 2}
    # every ep pair must sit inside one process
    for row in np.asarray(mesh.devices):
        assert len({d.process_index for d in row}) == 1, row

    fn, _ = shard.make_sharded_bootstrap_fn(params, mesh, "onthefly")
    key_g = multihost.place_keys(ck.data, mesh, "onthefly")
    half = B // 2
    lin_local = lin[rank * half:(rank + 1) * half]
    x_g = multihost.place_batch(lin_local, mesh)
    out_g = fn(key_g, x_g)
    out_local = multihost.gather_batch(out_g, mesh)

    # correctness: decrypt this host's rows
    want = ~(xa.astype(bool) & xb.astype(bool))
    got = np.asarray(gate.decrypt_bool(sk, jnp.asarray(out_local)))
    np.testing.assert_array_equal(got.astype(bool),
                                  want[rank * half:(rank + 1) * half])

    # determinism: bit-identical to the single-process bootstrap
    ref = np.asarray(gate.bootstrap(jnp.asarray(lin), ck.data, params,
                                    backend="onthefly"))
    np.testing.assert_array_equal(out_local,
                                  ref[rank * half:(rank + 1) * half])

    # ---- circuit bootstrapping across both processes: lvl2 digit rows +
    # privKS/preKS rows over ep (cross-process psum), batch over dp ----
    from tfhe_tpu.params import CB_TOY
    from tfhe_tpu.boot import circuit
    from tfhe_tpu import lwe
    cp = CB_TOY
    crng = TfheRng(2)                     # identical keys on both hosts
    csk = circuit.CircuitSecretKey.generate(cp, crng)
    cck = circuit.CircuitCloudKey.generate(csk, crng, backend="chunked")
    cbits = np.random.default_rng(11).integers(0, 2, B)
    msgs = np.where(cbits.astype(bool), np.int32(-(1 << 31)), 0)
    cct = np.asarray(lwe.encrypt(csk.lwe_lvl1, msgs.astype(np.int32),
                                 TfheRng(3), 2.0**-20))
    cfn, _ = shard.make_sharded_circuit_bootstrap_fn(cp, mesh,
                                                     backend="chunked")
    ckey_g = multihost.place_circuit_keys(cck.data, mesh, "chunked")
    cx_g = multihost.place_batch(cct[rank * half:(rank + 1) * half], mesh)
    gsw_local = np.asarray(multihost.gather_batch(cfn(ckey_g, cx_g), mesh))
    cref = np.asarray(circuit.circuit_bootstrap(jnp.asarray(cct), cck.data,
                                                cp, backend="chunked"))
    np.testing.assert_array_equal(gsw_local,
                                  cref[rank * half:(rank + 1) * half])
    print(f"[rank {rank}] MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
