#!/usr/bin/env python3
"""On-chip: fused Pallas kernel correctness + GATE_MXU bootstrap throughput."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU, GATE_DEFAULT
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu import lwe, tgsw
from tfhe_tpu.ops.engine import EngineConfig, make_engine

PARAMS = {"mxu": GATE_MXU, "default": GATE_DEFAULT}[os.environ.get("P", "mxu")]
B = int(os.environ.get("BENCH_BATCH", 4096))
BACKEND = os.environ.get("BACKEND", "onthefly")

# -- kernel correctness vs XLA path at real shapes --------------------------
cfg = tgsw.engine_config(PARAMS.tgsw)
rng = np.random.default_rng(0)
J, U, N = 6, 2, cfg.N
x = rng.integers(-64, 64, (256, J, N)).astype(np.int32)
key = rng.integers(-2**31, 2**31, (J, U, N)).astype(np.int32)
acc = rng.integers(-2**31, 2**31, (256, U, N)).astype(np.int32)
eng = make_engine(cfg, BACKEND)
prep = eng.prepare(jnp.asarray(key))
ref = np.asarray(jnp.asarray(acc) + eng.accumulate(jnp.asarray(x), prep))
got = np.asarray(jax.jit(eng.accumulate_into)(jnp.asarray(acc), jnp.asarray(x), prep))
assert np.array_equal(got, ref), f"fused kernel mismatch: {np.abs(got-ref).max()}"
print("fused kernel matches XLA path at real shapes", flush=True)

# -- full bootstrap ----------------------------------------------------------
t0 = time.time()
trng = TfheRng(0)
sk = gate.SecretKey.generate(PARAMS, trng)
ck = gate.CloudKey.generate(sk, trng, backend=BACKEND)
print(f"keygen {time.time()-t0:.1f}s", flush=True)

boot = gate.make_bootstrap_fn(PARAMS, backend=BACKEND)
bits = np.random.default_rng(1).integers(0, 2, B)
ct = gate.encrypt_bool(sk, bits, trng)
out = boot(ck.data, ct)
jax.block_until_ready(out)
ph = np.asarray(lwe.phase(out, sk.lwe_key)).astype(np.int64)
want = np.where(bits, gate.MU_BOOL, -gate.MU_BOOL).astype(np.int64)
ok = (np.asarray(gate.decrypt_bool(sk, out)) == bits.astype(bool))
noise = (ph - want).astype(np.int32)
print(f"correct: {ok.sum()}/{B}", flush=True)
print(f"noise rms 2^{np.log2(noise.astype(np.float64).std()/2**32):.2f}  "
      f"max 2^{np.log2(np.abs(noise).max()/2**32):.2f} (budget 2^-4)", flush=True)

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = boot(ck.data, ct)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"bootstrap batch {B}: {best*1e3:.1f} ms -> {B/best:.0f} ct/s", flush=True)
