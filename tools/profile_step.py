#!/usr/bin/env python3
"""Per-component timing of the gate-bootstrap hot path on the attached chip.

Times (all at GATE_DEFAULT shapes, batch BENCH_BATCH):
  matmul      the per-step int8 MXU contraction
  matw        Toeplitz materialization (pallas materialize_w)
  rot+dec     mul_by_xai_minus_one + gadget decomposition
  recombine   limb recombination of the matmul output
  step        one full CMux scan step
  full        full bootstrap (n steps) / throughput
  ks          LWE keyswitch N*k -> n
"""
import os, sys, time, functools
import numpy as np

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfhe_tpu.params import GATE_DEFAULT
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate, blind_rotate as br
from tfhe_tpu.ops.engine import make_engine
from tfhe_tpu.ops import decomp, poly
from tfhe_tpu import tgsw, tlwe, lwe as lwe_mod, torus as T

B = int(os.environ.get("BENCH_BATCH", 4096))
params = GATE_DEFAULT
p = params.tgsw
N, n, k, l = p.tlwe.N, params.lwe.n, p.tlwe.k, p.l
print(f"B={B} N={N} n={n} k={k} l={l} bg=2^{p.bgbit}", flush=True)

rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
key_data = ck.data

eng = make_engine(tgsw.engine_config(p), "onthefly")
cfg = eng.cfg
L = cfg.num_limbs
print(f"limbs L={L} planes={cfg.plane_split}", flush=True)

bk = key_data["bk"]  # pytree with leading axis n
prep0 = jax.tree.map(lambda a: a[0], bk)
v = prep0["v"]

rng2 = np.random.default_rng(0)
acc = jnp.asarray(rng2.integers(-2**31, 2**31, (B, k + 1, N), dtype=np.int64).astype(np.int32))
a_i = jnp.asarray(rng2.integers(0, 2 * N, (B,), dtype=np.int64).astype(np.int32))
digits = jnp.asarray(rng2.integers(-p.half_bg, p.half_bg, (B, (k+1)*l, N), dtype=np.int64).astype(np.int8))


def timeit(name, fn, *args, reps=20, flops=None, bytes_=None):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if flops:
        extra += f"  {flops/dt/1e12:.1f} TOP/s"
    if bytes_:
        extra += f"  {bytes_/dt/1e9:.0f} GB/s"
    print(f"{name:12s} {dt*1e6:10.1f} us{extra}", flush=True)
    return dt


from tfhe_tpu.ops.pallas_kernels import materialize_w

JN = (k+1)*l*N
ULN = (k+1)*L*N
W = materialize_w(v)
flat = digits.reshape(B, JN)

timeit("matmul", lambda x, w: lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.int32),
       flat, W, flops=2*B*JN*ULN)
timeit("matw", materialize_w, v, bytes_=2*JN*ULN)
timeit("rot", lambda a, x: tlwe.mul_by_xai_minus_one(a, x), a_i, acc,
       bytes_=2*B*(k+1)*N*4*11)
timeit("rot+dec", lambda a, x: decomp.decompose_tlwe(tlwe.mul_by_xai_minus_one(a, x), p).astype(jnp.int8),
       a_i, acc)

y32 = jnp.asarray(rng2.integers(-2**31, 2**31, (B, k+1, L, N), dtype=np.int64).astype(np.int32))
from tfhe_tpu.ops.engine import _recombine
timeit("recombine", lambda y: _recombine(cfg, y[None]), y32, bytes_=B*(k+1)*L*N*4)

def step(acc, xs):
    prep_i, ai = xs
    acc2 = tlwe.mul_by_xai_minus_one(ai, acc)
    d = decomp.decompose_tlwe(acc2, p)
    return acc + eng.accumulate(d, prep_i), None

t_step = timeit("step", lambda a: step(a, (prep0, a_i))[0], acc)

# keyswitch
ct_big = jnp.asarray(rng2.integers(-2**31, 2**31, (B, k*N+1), dtype=np.int64).astype(np.int32))
ksk = key_data["ks"]
timeit("keyswitch", lambda c: lwe_mod.keyswitch(c, ksk, params.ks, params.lwe.n), ct_big, reps=5)

# full bootstrap
boot = gate.make_bootstrap_fn(params, backend="onthefly")
bits = np.random.default_rng(1).integers(0, 2, B)
ct = gate.encrypt_bool(sk, bits, rng)
t_full = timeit("full", lambda kd, c: boot(kd, c), key_data, ct, reps=3)
print(f"throughput: {B/t_full:.0f} ct/s   scan-step equiv: {t_full/n*1e6:.1f} us", flush=True)
print(f"n * t_step = {n*t_step*1e3:.1f} ms vs full {t_full*1e3:.1f} ms", flush=True)
