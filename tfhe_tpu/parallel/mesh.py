"""Device-mesh scale-out for batched bootstrapping (L6 analog of SURVEY.md
§2.3-2.4: the reference's whole "parallel runtime" is one OpenMP
parallel-for over independent ciphertexts,
parallel/src/test_parallel_multiplications.cpp:62).

TPU-native mapping:
  dp  — ciphertext batch sharded over the "dp" mesh axis (the OpenMP analog);
  tp  — key-switch matrices sharded along their contracted dimension, so each
        chip holds a slice of key material and XLA reduces the partial
        keyswitch sums over ICI (psum) — the "tensor parallel" analog;
  the blind-rotation key (O(N) limb vectors under the onthefly backend) is
  replicated: it is tiny (~60 MB for full gate parameters) and every step
  needs all of it.

All sharding goes through NamedSharding + jit so GSPMD inserts the
collectives; nothing here depends on the number of processes (works on a
single host with xla_force_host_platform_device_count and on real pods).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    grid = np.asarray(devs[:n]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def gate_key_shardings(mesh: Mesh, key_data):
    """Shardings for a gate CloudKey.data pytree: bk replicated, the
    key-switch limb matrices split along the contracted (one-hot) dim."""
    repl = NamedSharding(mesh, P())
    ks = NamedSharding(mesh, P(None, "tp", None))
    return {"bk": jax.tree.map(lambda _: repl, key_data["bk"]), "ksw": ks}


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp", None))


def make_sharded_bootstrap_fn(params, mesh: Mesh, backend: str = "onthefly",
                              mu: int | None = None, unroll: int = 1):
    """Jitted sharded (key_data, samples) -> samples.

    samples are dp-sharded; key-switch matrices tp-sharded (contracted dim),
    so the keyswitch matmul becomes a psum over "tp"; the scan's per-step
    matmuls run fully parallel over "dp".
    """
    from tfhe_tpu.boot import gate

    kw = {} if mu is None else {"mu": mu}

    def fn(key_data, samples):
        return gate.bootstrap(samples, key_data, params, backend=backend,
                              unroll=unroll, **kw)

    def shard(key_data, samples):
        kshard = gate_key_shardings(mesh, key_data)
        key_data = jax.device_put(key_data, kshard)
        samples = jax.device_put(samples, batch_sharding(mesh))
        return key_data, samples

    jitted = jax.jit(fn, out_shardings=batch_sharding(mesh))
    return jitted, shard
