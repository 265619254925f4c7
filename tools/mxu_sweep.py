#!/usr/bin/env python3
"""Steady-state matmul throughput via differential chain timing.

Per-call overhead on the axon tunnel is ~60-80 ms, so single dispatches are
meaningless; we time chains of ITERS_LO and ITERS_HI dependent matmuls and
report (t_hi - t_lo) / (ITERS_HI - ITERS_LO).
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

LO, HI = 20, 120

def chain_fn(mm, iters):
    def f(a, b):
        def body(i, carry):
            s, a = carry
            o = mm(a, b)
            s = s + jnp.sum(o, dtype=jnp.int32)
            a = a.at[0, 0].set((s & 63).astype(a.dtype))
            return (s, a)
        s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), a))
        return s
    return jax.jit(f)

def run(f, a, b, reps=3):
    s = f(a, b); jax.device_get(s)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(f(a, b))
        best = min(best, time.perf_counter() - t0)
    return best

def bench_mm(M, K, N, dtype=np.int8, acc=jnp.int32):
    r = np.random.default_rng(0)
    if dtype == np.int8:
        a = jnp.asarray(r.integers(-64, 64, (M, K), dtype=np.int8))
        b = jnp.asarray(r.integers(-64, 64, (K, N), dtype=np.int8))
    else:
        a = jnp.asarray(r.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(r.standard_normal((K, N)), jnp.bfloat16)
    mm = lambda x, y: lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc)
    if acc == jnp.float32:
        mm0 = mm
        mm = lambda x, y: mm0(x, y).astype(jnp.int32)
    tlo = run(chain_fn(mm, LO), a, b)
    thi = run(chain_fn(mm, HI), a, b)
    dt = (thi - tlo) / (HI - LO)
    nm = np.dtype(dtype).name
    print(f"{nm}[{M}x{K}x{N}] {dt*1e6:9.1f} us  {2*M*K*N/dt/1e12:6.1f} TOP/s", flush=True)

if __name__ == "__main__":
    bench_mm(4096, 6144, 8192)             # current step shape (l=3, L=4)
    bench_mm(4096, 4096, 6144)             # l=2, L=3 step shape
    bench_mm(8192, 4096, 6144)
    bench_mm(16384, 4096, 6144)
    bench_mm(8192, 8192, 8192)             # peak probe
    bench_mm(8192, 8192, 8192, np.float16, jnp.float32)  # bf16 peak probe
    bench_mm(4096, 4096, 6144, np.float16, jnp.float32)
