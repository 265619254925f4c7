#!/usr/bin/env python3
"""On-chip gate bootstrap with the nussbaumer backend: correctness + speed."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_DEFAULT
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu import lwe

BACKEND = os.environ.get("BACKEND", "nussbaumer")
B = int(os.environ.get("BENCH_BATCH", 4096))
params = GATE_DEFAULT

t0 = time.time()
rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend=BACKEND)
print(f"keygen {time.time()-t0:.1f}s", flush=True)
for k, v in jax.tree_util.tree_flatten_with_path(ck.data)[0]:
    pass
tot = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(ck.data))
print(f"cloud key bytes: {tot/1e9:.2f} GB", flush=True)

boot = gate.make_bootstrap_fn(params, backend=BACKEND)

# correctness probe: bootstrap noisy encryptions of +-1/8, decrypt, margin
bits = np.random.default_rng(1).integers(0, 2, B)
ct = gate.encrypt_bool(sk, bits, rng)
out = boot(ck.data, ct)
jax.block_until_ready(out)
ph = np.asarray(lwe.phase(out, sk.lwe_key)).astype(np.int64)
want = np.where(bits, gate.MU_BOOL, -gate.MU_BOOL).astype(np.int64)
ok = (np.asarray(gate.decrypt_bool(sk, out)) == bits.astype(bool))
noise = (ph - want).astype(np.int32)
print(f"correct: {ok.sum()}/{B}", flush=True)
print(f"noise rms 2^{np.log2(noise.astype(np.float64).std()/2**32):.2f}  "
      f"max |noise| 2^{np.log2(np.abs(noise).max()/2**32):.2f} (budget 2^-4)", flush=True)

# throughput
for _ in range(2):
    t0 = time.perf_counter()
    out = boot(ck.data, ct)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
print(f"bootstrap batch {B}: {dt*1e3:.1f} ms -> {B/dt:.0f} ct/s", flush=True)
